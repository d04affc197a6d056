"""Tensor-parallel parameter sharding over the mesh's ``model`` axis.

The reference has no TP (accelerate DDP only, SURVEY §2.3); at SDXL scale a
single v5e holds the weights, so TP is an *optional* axis for scaling to
smaller-memory chips or cutting latency. The approach is GSPMD-native: rules
annotate parameter shardings (attention/MLP kernels split on the feature
dim, paired projections split on the input dim so each layer ends in one
all-reduce) and XLA propagates the rest — no manual collectives.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# kernels whose OUTPUT features shard over 'model' (column-parallel)
_COL_PARALLEL = ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "proj", "fc1", "to_kv")
# kernels whose INPUT features shard over 'model' (row-parallel; the matmul
# then produces partial sums that XLA all-reduces)
_ROW_PARALLEL = ("to_out", "out", "fc2")


def _rule_for(path: Tuple[str, ...], shape: Tuple[int, ...], model_size: int) -> P:
    names = [str(p) for p in path]
    if names[-1] != "kernel" or len(shape) < 2:
        return P()
    owner = None
    for n in reversed(names[:-1]):
        if n not in ("base",):
            owner = n
            break
    if owner in _COL_PARALLEL and shape[-1] % model_size == 0:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    if owner in _ROW_PARALLEL and shape[-2] % model_size == 0:
        return P(*([None] * (len(shape) - 2) + ["model", None]))
    return P()


def tp_shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter tree with TP rules (everything else replicated)."""
    model_size = mesh.shape["model"]

    def place(path, x):
        spec = _rule_for(tuple(getattr(p, "key", p) for p in path), np.shape(x), model_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
