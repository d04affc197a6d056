"""Fused GroupNorm(+SiLU) for NHWC tensors.

The UNet/VAE resnet stacks run GroupNorm→SiLU→conv ~60 times per forward; the
XLA path materializes fp32 intermediates between the reduction and the
normalize/activation. This Pallas kernel keeps one batch row's activations in
VMEM, computes fp32 group statistics in one pass, and writes the normalized
(+SiLU) result back in the compute dtype — one HBM read, one HBM write.

Grouping matches flax/torch GroupNorm: channel c belongs to group c // (C/G)
(contiguous channel slices). Falls back to a jnp reference off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_silu_reference(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, num_groups: int, eps: float, apply_silu: bool
) -> jnp.ndarray:
    b, h, w, c = x.shape
    cpg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, cpg)
    # E[x²]−μ² instead of E[(x−μ)²]: both squares fuse INTO the reductions,
    # so XLA never materializes a centered fp32 copy of the activation (the
    # two-pass form held three 85 MB fp32 temps per /1-res aggregator norm
    # at 1024² and tipped the merged-previewer sampler over HBM). fp32
    # accumulation over bf16 inputs keeps the cancellation error below
    # activation noise.
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    mean_sq = jnp.mean(xf * xf, axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # one elementwise pass: y = (x − μ)·inv·s + b
    a = inv.reshape(b, 1, 1, num_groups, 1)
    mu = mean.reshape(b, 1, 1, num_groups, 1)
    xs = x.astype(jnp.float32).reshape(b, h, w, num_groups, cpg)
    sc = scale.astype(jnp.float32).reshape(num_groups, cpg)
    bs = bias.astype(jnp.float32).reshape(num_groups, cpg)
    y = (xs - mu) * a * sc + bs
    y = y.reshape(b, h, w, c)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


_GN_CHUNK = 512  # rows per block: [512, 1280] bf16 = 1.25 MB, pipelines freely


def _gn_stats_kernel(x_ref, s_ref, sq_ref):
    """Partial per-chunk channel sums: [1, chunk, C] → two [1, 1, 1, C]."""
    xc = x_ref[0].astype(jnp.float32)
    s_ref[0, 0] = jnp.sum(xc, axis=0, keepdims=True)
    sq_ref[0, 0] = jnp.sum(xc * xc, axis=0, keepdims=True)


def _gn_norm_kernel(x_ref, w_ref, b_ref, o_ref, *, apply_silu: bool):
    """Elementwise y = x·w + b (+SiLU) with per-batch-row affine [1, C]."""
    xc = x_ref[0].astype(jnp.float32)
    y = xc * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "apply_silu", "interpret"))
def group_norm_silu_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Two small-block kernels — chunked partial stats, then a fused
    normalize(+SiLU) sweep — with the tiny [B, C] group math in XLA between
    them. Blocks stay ~1-2 MB so Mosaic double-buffers them freely (a whole
    batch row in VMEM overflows the 16 MB scoped budget at SDXL /16 sizes)."""
    b, h, w, c = x.shape
    hw = h * w
    chunk = min(_GN_CHUNK, hw)
    nchunks = hw // chunk
    cpg = c // num_groups
    xf = x.reshape(b, hw, c)

    s, sq = pl.pallas_call(
        _gn_stats_kernel,
        grid=(b, nchunks),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nchunks, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, nchunks, 1, c), jnp.float32),
        ),
        interpret=interpret,
    )(xf)

    # cross-chunk + cross-group reduction on [B, C] — trivial for XLA
    s = jnp.sum(s, axis=(1, 2))  # [B, C]
    sq = jnp.sum(sq, axis=(1, 2))
    n = float(hw * cpg)
    sg = jnp.sum(s.reshape(b, num_groups, cpg), axis=-1)  # [B, G]
    sqg = jnp.sum(sq.reshape(b, num_groups, cpg), axis=-1)
    mean_g = sg / n
    var_g = sqg / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cpg, axis=-1)  # [B, C]
    rstd_c = jnp.repeat(rstd_g, cpg, axis=-1)
    wv = (rstd_c * scale.astype(jnp.float32)[None, :]).reshape(b, 1, c)
    bv = (bias.astype(jnp.float32)[None, :] - mean_c * rstd_c * scale.astype(jnp.float32)[None, :]).reshape(b, 1, c)

    out = pl.pallas_call(
        functools.partial(_gn_norm_kernel, apply_silu=apply_silu),
        grid=(b, nchunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(xf, wv, bv)
    return out.reshape(b, h, w, c)


# per-block VMEM budget is no longer the constraint; keep a sanity bound on
# total size so degenerate giants (fp32 VAE at 1024²) use the XLA path where
# fusion with the surrounding convs matters more
_VMEM_BUDGET_BYTES = 512 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_silu_diff(x, scale, bias, num_groups, eps, apply_silu):
    return group_norm_silu_pallas(x, scale, bias, num_groups, eps, apply_silu)


def _gn_silu_fwd(x, scale, bias, num_groups, eps, apply_silu):
    return _gn_silu_diff(x, scale, bias, num_groups, eps, apply_silu), (x, scale, bias)


def _gn_silu_bwd(num_groups, eps, apply_silu, res, g):
    # backward through the (mathematically identical) reference implementation
    x, scale, bias = res
    _, vjp = jax.vjp(lambda *a: group_norm_silu_reference(*a, num_groups, eps, apply_silu), x, scale, bias)
    return vjp(g)


_gn_silu_diff.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = False,
) -> jnp.ndarray:
    """Dispatching fused GroupNorm(+SiLU).

    MEASURED NEGATIVE RESULT (docs/perf.md): the Pallas version is correct on
    TPU but ~25% slower end-to-end than XLA's GroupNorm — XLA fuses the
    normalize/SiLU into the surrounding convolution fusions, which beats the
    kernel's standalone read-twice/write-once schedule. The XLA path is
    therefore the default; set INSTANTIR_PALLAS_GN=1 to experiment with the
    kernel (differentiable via a custom VJP)."""
    import os

    b, h, w, c = x.shape
    row_bytes = h * w * c * x.dtype.itemsize
    if (
        os.environ.get("INSTANTIR_PALLAS_GN") == "1"
        and jax.default_backend() == "tpu"
        and row_bytes <= _VMEM_BUDGET_BYTES
        and c % num_groups == 0
        and (h * w) % min(_GN_CHUNK, h * w) == 0
    ):
        return _gn_silu_diff(x, scale, bias, num_groups, eps, apply_silu)
    return group_norm_silu_reference(x, scale, bias, num_groups, eps, apply_silu)
