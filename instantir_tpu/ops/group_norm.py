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
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float, apply_silu: bool):
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    hw, c = x.shape
    cpg = c // num_groups
    xg = x.reshape(hw, num_groups, cpg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(hw, c) * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
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
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c)
    kernel = functools.partial(_gn_kernel, num_groups=num_groups, eps=eps, apply_silu=apply_silu)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
        interpret=interpret,
    )(xf, scale, bias)
    return out.reshape(b, h, w, c)


# one batch-row block must fit VMEM (with fp32 scratch headroom)
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


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
    """Dispatching fused GroupNorm(+SiLU): Pallas on TPU when a batch row fits
    VMEM (differentiable via a custom VJP that recomputes through the
    reference math), jnp reference otherwise."""
    b, h, w, c = x.shape
    row_bytes = h * w * c * x.dtype.itemsize
    if jax.default_backend() == "tpu" and row_bytes <= _VMEM_BUDGET_BYTES and c % num_groups == 0:
        return _gn_silu_diff(x, scale, bias, num_groups, eps, apply_silu)
    return group_norm_silu_reference(x, scale, bias, num_groups, eps, apply_silu)
