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
  * ``weight_only=True`` (W8, stored as ``kernel_qw``) — the QLoRA recipe
    (arXiv 2305.14314: frozen base quantized, adapters in fp) for the
    TRAINING side: the kernel is stored int8 but dequantized to the compute
    dtype at use, so the op stays an ordinary bf16 matmul/conv that is
    exactly differentiable w.r.t. its activations (gradients flow THROUGH a
    frozen quantized net to upstream trainable modules — the stage-2
    aggregator — where W8A8's activation rounding would kill them). No MXU
    rate win, purely a 2× weight-HBM cut: it is what makes single-chip
    SDXL-scale stage-2 fit a 16 GB v5e at all (docs/perf.md round 4).

The reference has no quantized inference (torch fp16 throughout) and needs
80 GB GPUs for stage-2; both modes are TPU-native extensions, gated exactly
like DeepCache: opt-in flag + measured quality delta (docs/perf.md).
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


def dequantize_weight(kq: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """int8 kernel [..., out] × f32 [out] → dense kernel in ``dtype`` (the
    weight-only W8 compute path; XLA fuses this into the consumer where it
    can, otherwise it is one transient kernel-sized temp per use)."""
    return (kq.astype(jnp.float32) * scale).astype(dtype)


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
    variables: Dict[str, Any],
    min_size: int | None = None,
    weight_only: bool = False,
    exclude=None,
) -> Dict[str, Any]:
    """{"params": tree} → {"params": pruned tree, "quant": int8 side tree}.

    Targets exactly the ``base/kernel`` leaves of LoRADense/LoRAConv (every
    hot matmul/conv in the UNet and Aggregator routes through them); LoRA
    branches, norms, time embeddings, and sub-``min_size`` kernels stay in
    fp. Idempotent on already-quantized trees (merges into existing quant
    entries is NOT supported — quantize once, from the fp tree).

    ``weight_only=True`` stores the kernel as ``kernel_qw`` instead: the
    layers then dequantize to the compute dtype and run the ordinary fp op
    (differentiable QLoRA storage mode, module docstring). ``exclude`` is an
    optional path predicate (tuple of keys, ``base`` excluded) — trainers
    pass it to keep kernels that are TRAINED (e.g. the ip projections when
    ``optimize_adapter`` is on) out of the int8 tree. ``min_size=None``
    resolves to ``DEFAULT_MIN_SIZE`` at call time (tests lower the module
    constant to exercise the paths at tiny scale)."""
    if min_size is None:
        min_size = DEFAULT_MIN_SIZE
    quant: Dict[str, Any] = {}
    q_key = "kernel_qw" if weight_only else "kernel_q"

    def walk(node, qnode, path):
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
                and not (exclude is not None and exclude(path))
            ):
                kq, ks = quantize_weight(child["kernel"])
                qnode[key] = {q_key: kq, "kernel_scale": ks}
                rest = {k: v for k, v in child.items() if k != "kernel"}
                if rest:
                    out[key] = rest
            elif isinstance(child, dict):
                sub_q: Dict[str, Any] = {}
                out[key] = walk(child, sub_q, path + (key,))
                if sub_q:
                    qnode[key] = sub_q
            else:
                out[key] = child
        return out

    pruned = walk(variables["params"], quant, ())
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
