"""Fused GroupNorm(+SiLU): pallas-interpret vs reference vs torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.ops.group_norm import group_norm_silu_pallas, group_norm_silu_reference


@pytest.mark.parametrize("silu", [False, True])
def test_pallas_matches_reference(rng, silu):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    ref = group_norm_silu_reference(x, scale, bias, num_groups=8, eps=1e-5, apply_silu=silu)
    got = group_norm_silu_pallas(x, scale, bias, num_groups=8, eps=1e-5, apply_silu=silu, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_reference_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 16, 6, 6)).astype(np.float32)  # NCHW for torch
    gn = torch.nn.GroupNorm(4, 16)
    with torch.no_grad():
        gn.weight.normal_()
        gn.bias.normal_()
    with torch.no_grad():
        expected = torch.nn.functional.silu(gn(torch.from_numpy(x))).numpy().transpose(0, 2, 3, 1)
    got = group_norm_silu_reference(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(gn.weight.detach().numpy()),
        jnp.asarray(gn.bias.detach().numpy()),
        num_groups=4,
        eps=1e-5,
        apply_silu=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_bf16_pallas(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.bfloat16)
    scale = jnp.ones((16,), jnp.float32)
    bias = jnp.zeros((16,), jnp.float32)
    ref = group_norm_silu_reference(x, scale, bias, 4, 1e-5, True)
    got = group_norm_silu_pallas(x, scale, bias, 4, 1e-5, True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
