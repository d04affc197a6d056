"""Fused GN custom VJP: gradients match the reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.ops.group_norm import (
    _gn_silu_diff,
    group_norm_silu_reference,
)


def test_custom_vjp_matches_reference_grads(rng, monkeypatch):
    # exercise the custom-vjp wrapper with the pallas fwd in interpret mode
    import instantir_tpu.ops.group_norm as gnmod

    orig = gnmod.group_norm_silu_pallas
    monkeypatch.setattr(
        gnmod, "group_norm_silu_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}) if "interpret" not in k else orig(*a, **k),
    )

    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    def loss_custom(x, s, b):
        return jnp.sum(jnp.sin(gnmod._gn_silu_diff(x, s, b, 4, 1e-5, True)))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.sin(group_norm_silu_reference(x, s, b, 4, 1e-5, True)))

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
