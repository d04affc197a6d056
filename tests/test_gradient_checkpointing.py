"""Gradient checkpointing (block rematerialization) parity.

The reference exposes ``--gradient_checkpointing`` in every trainer and calls
``enable_gradient_checkpointing()`` on the UNet/Aggregator/VAE
(``train_stage1_adapter.py:808-810``, ``train_stage2_aggregator.py:1066-1068``).
Here the flag is ``UNetConfig.gradient_checkpointing`` — ``nn.remat`` around
each down/mid/up block — and must leave the parameter tree, forward output,
and gradients unchanged (up to float reassociation noise from the different
fusion schedule).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.models.aggregator import Aggregator
from instantir_tpu.models.unet import UNet2DConditionModel, tiny_unet_config


def _grad_close(g, gr, tol=1e-5):
    """Compare grads with tolerance relative to the GLOBAL gradient scale —
    per-leaf relative error is meaningless on near-zero leaves."""
    scale = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g))
    err = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gr))
    )
    assert err <= tol * max(scale, 1.0), (err, scale)


def test_unet_remat_param_tree_forward_and_grads(rng):
    cfg = tiny_unet_config(with_ip=True, lora_rank=4)
    cfg_r = dataclasses.replace(cfg, gradient_checkpointing=True)
    m = UNet2DConditionModel(cfg, use_flash=False)
    m_r = UNet2DConditionModel(cfg_r, use_flash=False)

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)
    args = (x, jnp.asarray([500], jnp.int32),
            jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, 16)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, 6)), jnp.float32))
    kw = dict(ip_hidden_states=jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32))

    p = m.init(jax.random.PRNGKey(0), *args, **kw)
    p_r = m_r.init(jax.random.PRNGKey(0), *args, **kw)
    # identical parameter trees → checkpoints are interchangeable
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_r)

    np.testing.assert_allclose(
        np.asarray(m.apply(p, *args, **kw)), np.asarray(m_r.apply(p, *args, **kw)), atol=2e-5
    )
    g = jax.grad(lambda p: m.apply(p, *args, **kw).sum())(p)
    g_r = jax.grad(lambda p: m_r.apply(p, *args, **kw).sum())(p)
    _grad_close(g, g_r)


def test_aggregator_remat_grads(rng):
    cfg = tiny_unet_config()
    cfg_r = dataclasses.replace(cfg, gradient_checkpointing=True)
    agg = Aggregator(cfg, use_flash=False)
    agg_r = Aggregator(cfg_r, use_flash=False)

    args = (jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32),
            jnp.asarray([500], jnp.int32),
            jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32))
    kw = dict(added_text_embeds=jnp.asarray(rng.normal(size=(1, 16)), jnp.float32),
              added_time_ids=jnp.asarray(rng.normal(size=(1, 6)), jnp.float32))

    p = agg.init(jax.random.PRNGKey(0), *args, **kw)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        agg_r.init(jax.random.PRNGKey(0), *args, **kw)
    )

    def loss(p, mod):
        down, mid = mod.apply(p, *args, **kw)
        return sum(x.sum() for x in down) + mid.sum()

    _grad_close(jax.grad(loss)(p, agg), jax.grad(loss)(p, agg_r))
