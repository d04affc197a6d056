"""Tensor-parallel parameter sharding over the mesh's ``model`` axis.

The reference has no TP (accelerate DDP only, SURVEY §2.3); at SDXL scale a
single v5e holds the weights, so TP is an *optional* axis for scaling to
smaller-memory chips or cutting latency. The approach is GSPMD-native: rules
annotate parameter shardings and XLA propagates the rest, inserting the
all-reduces — no manual collectives.

Layout (Megatron-style column→row pairing, one psum per pair):

* attention/MLP: ``to_q/k/v``, ``fc1``, GEGLU ``proj`` split on the OUTPUT
  feature dim (column-parallel); ``to_out``/``out``/``fc2`` split on the
  INPUT dim (row-parallel — partial sums, one all-reduce per layer).
* resnet convs (kernel ``[kh, kw, I, O]``): ``conv1`` splits O
  (column-parallel — its GroupNorm+SiLU input is replicated, its output
  stays channel-sharded); ``time_emb_proj`` splits O to add into conv1's
  sharded channels; the following ``norm2`` computes group statistics
  locally (32 contiguous groups, channel shards on group boundaries at
  SDXL widths); ``conv2`` splits I closing the pair with one psum.
  ``conv_shortcut`` and the down/up-sample ``conv`` take replicated inputs,
  so splitting I is a free local slice + one psum — memory sharding at the
  cost of one small all-reduce each.
* previewer-LoRA branches follow their parent conv/dense: ``lora_b`` of a
  column-parallel module splits O (adds into the sharded base output);
  ``lora_a`` of a row-parallel module splits I (consumes the sharded
  activation; its rank-r partial joins the base psum).
* GroupNorm/LayerNorm scales, biases, ``conv_in``/``conv_out`` (4-channel)
  and anything indivisible stay replicated — slicing a replicated vector is
  local, so no collective is induced.

At SDXL scale this shards the majority of UNet parameter BYTES (asserted in
``tests/test_tensor_parallel.py``): attention+MLP alone covered ~47%;
resnet/sampler convs bring the column/row-split share past 90%.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# modules whose kernel OUTPUT features shard over 'model' (column-parallel)
_COL_PARALLEL = (
    "to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "proj", "fc1", "to_kv",
    "conv1", "time_emb_proj",
)
# modules whose kernel INPUT features shard over 'model' (row-parallel; the
# matmul/conv then produces partial sums that XLA all-reduces)
_ROW_PARALLEL = ("to_out", "out", "fc2", "conv2", "conv_shortcut", "conv")


def _col_spec(shape: Tuple[int, ...]) -> P:
    return P(*([None] * (len(shape) - 1) + ["model"]))


def _row_spec(shape: Tuple[int, ...]) -> P:
    return P(*([None] * (len(shape) - 2) + ["model", None]))


def tp_spec(path: Tuple[str, ...], shape: Tuple[int, ...], model_size: int) -> P:
    """PartitionSpec for one parameter leaf under the TP rules (P() = replicated)."""
    names = [str(p) for p in path]
    if names[-1] != "kernel" or len(shape) < 2:
        return P()
    # owner = nearest ancestor that is not the LoRA-wrapper plumbing
    owners = [n for n in reversed(names[:-1]) if n != "base"]
    owner = owners[0] if owners else None
    if owner in ("lora_a", "lora_b"):
        # the adapter branch follows its parent module's layout
        parent = owners[1] if len(owners) > 1 else None
        if owner == "lora_b" and parent in _COL_PARALLEL and shape[-1] % model_size == 0:
            return _col_spec(shape)
        if owner == "lora_a" and parent in _ROW_PARALLEL and shape[-2] % model_size == 0:
            return _row_spec(shape)
        return P()
    if owner in _COL_PARALLEL and shape[-1] % model_size == 0:
        return _col_spec(shape)
    if owner in _ROW_PARALLEL and shape[-2] % model_size == 0:
        return _row_spec(shape)
    return P()


def tp_shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter tree with TP rules (everything else replicated)."""
    model_size = mesh.shape["model"]

    def place(path, x):
        spec = tp_spec(tuple(getattr(p, "key", p) for p in path), np.shape(x), model_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def tp_sharded_bytes(params: Any, model_size: int = 2) -> Tuple[int, int]:
    """(bytes sharded over 'model', total bytes) under the TP rules — a pure
    metadata walk (works on ``jax.eval_shape`` trees), used to assert layout
    coverage at SDXL scale without materializing 9.5 GB of weights."""
    sharded = total = 0

    def visit(path, x):
        nonlocal sharded, total
        n = int(np.prod(np.shape(x))) * np.dtype(x.dtype).itemsize
        total += n
        spec = tp_spec(tuple(getattr(p, "key", p) for p in path), np.shape(x), model_size)
        if any(s == "model" for s in spec):
            sharded += n

    jax.tree_util.tree_map_with_path(visit, params)
    return sharded, total
