"""W8A8 int8 quantization for the inference compute path (opt-in).

The v5e MXU runs int8×int8→int32 at ~2× its bf16 rate, and XLA lowers both
``dot_general`` and ``conv_general_dilated`` to that mode when given int8
operands with ``preferred_element_type=int32`` (measured on this chip:
327 vs 172 T(FL)OP/s at 8192³; the full dynamic-quant recipe holds 342 —
``tools/bench_int8_probe.py``). This module provides:

  * symmetric per-output-channel weight quantization (``quantize_weight``);
  * dynamic symmetric activation quantization — per-token for matmuls,
    per-sample for convs (per-pixel scales cannot be factored out of a
    conv's spatial mixing);
  * the int8 compute ops (``w8a8_dense`` / ``w8a8_conv``);
  * ``quantize_tree`` — transform a flax variables dict so every
    LoRADense/LoRAConv *base* kernel ≥ ``min_size`` moves from the
    ``params`` collection into a parallel ``quant`` collection as
    ``{kernel_q: int8, kernel_scale: f32[out]}``. The bf16 kernel leaf is
    REMOVED (halving weight HBM); the layers in ``models/layers.py`` route
    through the int8 ops when their ``quant`` entries are present.

The reference has no quantized inference (torch fp16 throughout); this is a
TPU-native extension, gated exactly like DeepCache: opt-in flag + measured
PSNR-vs-exact + measured s/img (docs/perf.md).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# Below this many elements a kernel stays bf16: tiny layers don't pay for
# the quant/dequant elementwise passes, and conv_in/conv_out (4-channel I/O,
# the quality-critical ends of the UNet) fall under it naturally.
DEFAULT_MIN_SIZE = 65536


def quantize_weight(k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: k [..., out] → (int8 k, f32 [out])."""
    kf = jnp.asarray(k, jnp.float32)
    absmax = jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    kq = jnp.clip(jnp.round(kf / scale), -127.0, 127.0).astype(jnp.int8)
    return kq, scale


def _quant_act(x: jnp.ndarray, axes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    xf = jnp.asarray(x, jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return xq, scale


def w8a8_dense(x: jnp.ndarray, kq: jnp.ndarray, kscale: jnp.ndarray) -> jnp.ndarray:
    """x [..., in] @ int8 kernel [in, out] with per-token activation quant.

    Per-token scales factor exactly out of the contraction:
    ``y = (xq·kq) ⊙ xscale ⊙ kscale``. Output in x.dtype."""
    xq, xs = _quant_act(x, axes=-1)
    y = jax.lax.dot_general(
        xq, kq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * xs * kscale).astype(x.dtype)


def w8a8_conv(
    x: jnp.ndarray,
    kq: jnp.ndarray,
    kscale: jnp.ndarray,
    strides: Tuple[int, int],
    padding: Any,
) -> jnp.ndarray:
    """NHWC conv with int8 HWIO kernel and per-SAMPLE activation quant.

    A conv mixes input pixels, so only scales constant over the receptive
    field factor out — per-sample (per-tensor) activation scales, the
    standard int8-conv recipe. Zero padding quantizes to exactly 0."""
    xq, xs = _quant_act(x, axes=(1, 2, 3))
    y = jax.lax.conv_general_dilated(
        xq, kq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * xs * kscale).astype(x.dtype)


def quantize_tree(
    variables: Dict[str, Any], min_size: int = DEFAULT_MIN_SIZE
) -> Dict[str, Any]:
    """{"params": tree} → {"params": pruned tree, "quant": int8 side tree}.

    Targets exactly the ``base/kernel`` leaves of LoRADense/LoRAConv (every
    hot matmul/conv in the UNet and Aggregator routes through them); LoRA
    branches, norms, time embeddings, and sub-``min_size`` kernels stay in
    fp. Idempotent on already-quantized trees (merges into existing quant
    entries is NOT supported — quantize once, from the fp tree)."""
    quant: Dict[str, Any] = {}

    def walk(node, qnode):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, child in node.items():
            if (
                key == "base"
                and isinstance(child, dict)
                and "kernel" in child
                and hasattr(child["kernel"], "ndim")
                and child["kernel"].ndim in (2, 4)
                and child["kernel"].size >= min_size
            ):
                kq, ks = quantize_weight(child["kernel"])
                qnode[key] = {"kernel_q": kq, "kernel_scale": ks}
                rest = {k: v for k, v in child.items() if k != "kernel"}
                if rest:
                    out[key] = rest
            elif isinstance(child, dict):
                sub_q: Dict[str, Any] = {}
                out[key] = walk(child, sub_q)
                if sub_q:
                    qnode[key] = sub_q
            else:
                out[key] = child
        return out

    pruned = walk(variables["params"], quant)
    result = {k: v for k, v in variables.items() if k != "params"}
    result["params"] = pruned
    if quant:
        result["quant"] = quant
    return result


def quantized_bytes(variables: Dict[str, Any]) -> Tuple[int, int]:
    """(quantized weight bytes, total weight bytes) for reporting."""
    import numpy as np

    q = sum(x.size for x in jax.tree_util.tree_leaves(variables.get("quant", {})) if x.dtype == jnp.int8)
    tot = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(variables)
    )
    return q, tot
