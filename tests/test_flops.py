"""Analytic FLOP counter (utils/flops.py) — exact on known-shape programs.

The counter feeds the bench artifact's MFU field (VERDICT r4 #4), so these
tests pin it against closed-form counts: plain matmuls, batched dot_general,
convs (with groups), scan multipliers, cond upper-bounding, and the Pallas
flash-attention kernels (grid × loop-free kernel body must equal the
textbook 4·B·H·S²·D).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantir_tpu.ops.attention import flash_attention
from instantir_tpu.utils.flops import jaxpr_flops


def test_matmul():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    assert jaxpr_flops(lambda a, b: a @ b, a, b) == 2 * 8 * 16 * 32


def test_batched_einsum():
    a = jnp.zeros((4, 8, 32))
    b = jnp.zeros((4, 32, 16))
    f = lambda a, b: jnp.einsum("bik,bkj->bij", a, b)
    assert jaxpr_flops(f, a, b) == 2 * 4 * 8 * 16 * 32


def test_conv():
    x = jnp.zeros((2, 16, 16, 8))
    k = jnp.zeros((3, 3, 8, 24))
    f = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert jaxpr_flops(f, x, k) == 2 * (2 * 16 * 16 * 24) * 3 * 3 * 8


def test_scan_multiplies():
    a = jnp.zeros((8, 8))

    def f(a):
        def body(c, _):
            return c @ a, ()

        c, _ = jax.lax.scan(body, a, None, length=5)
        return c

    assert jaxpr_flops(f, a) == 5 * 2 * 8 * 8 * 8


def test_cond_takes_max():
    a = jnp.zeros((8, 8))

    def f(a):
        return jax.lax.cond(a[0, 0] > 0, lambda a: a @ a, lambda a: a + 1.0, a)

    assert jaxpr_flops(f, a) == 2 * 8 * 8 * 8


def test_jit_recursion():
    a = jnp.zeros((8, 8))
    g = jax.jit(lambda a: a @ a)
    assert jaxpr_flops(lambda a: g(a) + g(a), a) == 2 * 2 * 8 * 8 * 8


def test_flash_attention_pallas_count():
    b, s, h, d = 2, 512, 4, 64
    q = jnp.zeros((b, s, h, d), jnp.float32)
    f = lambda q: flash_attention(q, q, q, interpret=True)
    got = jaxpr_flops(f, q)
    want = 4 * b * h * s * s * d  # QKᵀ + PV
    assert got == want, (got, want)


def test_tiny_unet_flops_nonzero_and_scales_with_batch():
    from instantir_tpu.models.unet import UNet2DConditionModel, tiny_unet_config

    cfg = tiny_unet_config(with_ip=True, lora_rank=4)
    unet = UNet2DConditionModel(cfg)
    args1 = (jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
             jnp.zeros((1, 7, cfg.cross_attention_dim)),
             jnp.zeros((1, cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim)),
             jnp.zeros((1, 6)))
    params = unet.init(jax.random.PRNGKey(0), *args1,
                       ip_hidden_states=jnp.zeros((1, 8, cfg.cross_attention_dim)))

    def fwd(b):
        args = tuple(jnp.zeros((b,) + a.shape[1:], a.dtype) for a in args1)
        ip = jnp.zeros((b, 8, cfg.cross_attention_dim))
        return jaxpr_flops(lambda p: unet.apply(p, *args, ip_hidden_states=ip), params)

    f1, f2 = fwd(1), fwd(2)
    assert f1 > 1e6
    # conv/matmul work scales linearly with batch (time-embed MLP is per-batch too)
    assert abs(f2 / f1 - 2.0) < 0.05
