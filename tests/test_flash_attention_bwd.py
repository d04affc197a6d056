"""Pallas flash-attention backward parity vs the XLA reference.

The custom VJP (``ops/attention.py::_flash_diff``) must produce the same
dq/dk/dv as differentiating ``attention_xla`` — the two compute the same
function, so their gradients must match to fp accumulation error. Runs the
kernels in interpreter mode on the CPU mesh; the same code path compiles on
TPU (where it replaces the 566 ms XLA 8192-token cliff, docs/perf.md).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.ops.attention import _flash_diff, _flash_forward_lse, attention_xla


def _grads(fn, q, k, v, g):
    out, vjp = jax.vjp(fn, q, k, v)
    return out, vjp(g)


@pytest.mark.parametrize("seq,heads,dim", [(512, 2, 64), (1024, 1, 64)])
def test_flash_bwd_matches_xla(seq, heads, dim):
    rng = np.random.default_rng(0)
    b = 2
    q = jnp.asarray(rng.normal(size=(b, seq, heads, dim)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, seq, heads, dim)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, seq, heads, dim)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, seq, heads, dim)), jnp.float32)
    scale = dim**-0.5

    out_ref, (dq_ref, dk_ref, dv_ref) = _grads(
        functools.partial(attention_xla, scale=scale), q, k, v, g
    )
    out, (dq, dk, dv) = _grads(lambda q, k, v: _flash_diff(q, k, v, scale, True), q, k, v, g)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=5e-5, rtol=1e-3)


def test_flash_bwd_bf16_inputs():
    """bf16 training path: fp32 in-kernel math, bf16 in/out."""
    rng = np.random.default_rng(1)
    b, seq, heads, dim = 1, 256, 2, 64
    mk = lambda: jnp.asarray(rng.normal(size=(b, seq, heads, dim)), jnp.bfloat16)
    q, k, v, g = mk(), mk(), mk(), mk()
    scale = dim**-0.5

    f32 = lambda x: x.astype(jnp.float32)
    _, (dq_ref, dk_ref, dv_ref) = _grads(
        functools.partial(attention_xla, scale=scale), f32(q), f32(k), f32(v), f32(g)
    )
    _, (dq, dk, dv) = _grads(lambda q, k, v: _flash_diff(q, k, v, scale, True), q, k, v, g)
    assert dq.dtype == jnp.bfloat16
    # bf16 rounding of inputs/outputs dominates the error budget
    for got, ref in [(dq, dq_ref), (dk, dk_ref), (dv, dv_ref)]:
        err = np.abs(np.asarray(f32(got)) - np.asarray(ref)).max()
        assert err < 0.15 * float(np.abs(np.asarray(ref)).max()), err


def test_flash_fwd_lse_consistent():
    """The LSE-saving forward must equal the plain flash forward and the
    saved logsumexp must reproduce softmax normalization."""
    rng = np.random.default_rng(2)
    b, seq, heads, dim = 1, 256, 2, 32
    q = jnp.asarray(rng.normal(size=(b, seq, heads, dim)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, seq, heads, dim)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, seq, heads, dim)), jnp.float32)
    scale = dim**-0.5
    out, lse = _flash_forward_lse(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(attention_xla(q, k, v, scale=scale)), atol=2e-5, rtol=1e-4
    )
    # reference logsumexp — the kernel stores it in the LOG2 domain (the
    # softmax runs on exp2 with scale·log2e folded into q; the backward
    # kernels reconstruct p = exp2(s2 − lse2))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    ref_lse = jax.scipy.special.logsumexp(logits, axis=-1) * np.log2(np.e)  # [b, h, sq]
    ref_lse = ref_lse.reshape(b * heads, seq, 1)  # kernel layout: trailing singleton lane dim
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=3e-5, rtol=1e-5)
