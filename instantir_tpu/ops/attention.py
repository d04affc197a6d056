"""Attention ops: Pallas TPU flash attention + XLA reference path.

The reference runs every attention through ``F.scaled_dot_product_attention``
(e.g. ``module/ip_adapter/attention_processor.py:1165-1167``). Here the hot
self-attention (up to 4096 tokens at 1024², 8192 for the Aggregator's
H-concat) runs a blocked online-softmax Pallas kernel sized for VMEM; short
cross-attention (77 text + 64 image tokens) stays on the fused XLA path where
a flash schedule has nothing to hide.

Layout convention: ``[batch, seq, heads, head_dim]`` (BSHD) at module level;
kernels fold batch×heads.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference attention, fp32 softmax. q/k/v: [B, S, H, D] → [B, Sq, H, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out_dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, kv_len: int):
    q = q_ref[0].astype(jnp.float32)  # [block_q, d]
    block_q, d = q.shape
    num_kv = kv_len // block_k

    m = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, d), dtype=jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_block(n: int, preferred: int) -> int:
    b = min(preferred, n)
    while n % b:
        b //= 2
    return max(b, 1)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blocked online-softmax attention. q/k/v: [B, S, H, D] → [B, Sq, H, D].

    K/V for one (batch, head) stay resident in VMEM (≤ 8192×128×2B = 2 MB);
    the grid walks query blocks so each program is one [block_q, d] tile of
    output with fp32 running max/sum accumulators.
    """
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    if scale is None:
        scale = d**-0.5
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(kv_len, block_k)

    # Fold batch and heads; kernels see [1, s, d] blocks.
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)

    kernel = functools.partial(_flash_kernel, scale=scale, block_k=block_k, kv_len=kv_len)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    return flash_attention(q, k, v, scale=scale)


def _flash_fwd(q, k, v, scale):
    return flash_attention(q, k, v, scale=scale), (q, k, v)


def _flash_bwd(scale, res, g):
    # backward through the mathematically identical XLA attention — a bare
    # pallas_call has no autodiff rule, and trainers differentiate through
    # every attention site (a Pallas backward kernel is on the roadmap).
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: attention_xla(q, k, v, scale=scale), q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_fwd, _flash_bwd)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Dispatching attention: Pallas flash on TPU for long sequences, XLA else.

    The flash path has no bias support (none is needed in the InstantIR
    compute graph). It is differentiable: the custom VJP recomputes the
    backward through the XLA reference (O(S²) memory — fine at training
    resolutions; long-sequence training wants the Pallas backward kernel,
    see docs/roadmap.md).
    """
    kv_len = k.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    if use_flash and bias is None and on_tpu and kv_len >= 512 and q.shape[1] >= 128:
        return _flash_diff(q, k, v, scale)
    return attention_xla(q, k, v, scale=scale, bias=bias)
