"""Device mesh + sharding utilities.

The reference's only distributed strategy is accelerate DDP over NCCL
(SURVEY.md §2.3). The TPU-native equivalent: one ``jax.sharding.Mesh`` with a
``data`` axis over ICI; batches are sharded along ``data``, parameters are
replicated, and XLA inserts the gradient ``psum`` when the jitted loss is
differentiated under these shardings — no explicit collectives in user code.
An optional ``model`` axis is reserved for tensor-parallel experiments
(conv-channel / attention-head sharding).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1, devices=None) -> Mesh:
    """(data, model) mesh over the available (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array in a pytree along its leading (batch) axis."""
    sharding = data_parallel_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), params)


def zero1_spec(x, mesh: Mesh) -> NamedSharding:
    """ZeRO-1 layout for one optimizer-state leaf: shard the largest
    ``data``-divisible axis; replicate scalars/indivisible leaves."""
    ndev = mesh.shape["data"]
    if hasattr(x, "shape") and ndev > 1:
        for axis in sorted(range(len(x.shape)), key=lambda a: -x.shape[a]):
            if x.shape[axis] and x.shape[axis] % ndev == 0:
                parts = [None] * len(x.shape)
                parts[axis] = "data"
                return NamedSharding(mesh, P(*parts))
    return NamedSharding(mesh, P())


def zero1_shard(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree in the ZeRO-1 layout (optimizer-state sharding over the
    ``data`` axis). With fp32 Adam moments this cuts the per-chip optimizer
    footprint by ~the mesh size — the difference between stage-2's 1B-param
    aggregator fitting a v5e-8 pod and not. The update math is elementwise,
    so GSPMD runs it sharded and all-gathers only the parameter deltas."""
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, zero1_spec(x, mesh)), tree)
