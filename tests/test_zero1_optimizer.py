"""ZeRO-1 optimizer-state sharding: moments sharded over the ``data`` axis
must train identically to replicated moments, with the state actually
distributed (per-chip Adam footprint ÷ mesh size)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.data.dataset import SyntheticImageDataset
from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.parallel import make_mesh
from instantir_tpu.parallel.mesh import zero1_spec
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.train.stage2_aggregator import Stage2Config, Stage2Trainer

RES = 32
BATCH = 4


@pytest.fixture(scope="module")
def bundle():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    return build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES
    )


def _cond(pipe, b):
    rng = np.random.default_rng(5)
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = (
        pipe.unet.config.projection_class_embeddings_input_dim
        - pipe.unet.config.addition_time_embed_dim * 6
    )
    return {
        "prompt_embeds": jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32),
        "uncond_prompt_embeds": jnp.zeros((b, 7, cross), jnp.float32),
        "pooled_embeds": jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32),
        "uncond_pooled_embeds": jnp.zeros((b, pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32), (b, 1)),
    }


def _train(bundle, zero1: bool, steps: int = 2):
    mesh = make_mesh(num_devices=BATCH)
    cfg = Stage2Config(
        output_dir="", max_train_steps=steps, train_batch_size=BATCH, resolution=RES,
        use_ema_adapter=False, checkpointing_steps=10**9, resume_from_checkpoint=None,
        shard_optimizer_state=zero1,
    )
    tr = Stage2Trainer(
        bundle.unet, bundle.aggregator, bundle.resampler, bundle.vae, bundle.image_encoder,
        bundle.params, cfg, mesh=mesh,
    )
    cond = _cond(bundle, BATCH)
    data = SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES * 4)
    losses = []
    for i in range(steps):
        batch = tr.prepare_batch(next(data), cond, jax.random.PRNGKey(10 + i))
        m = tr.train_step(batch, jax.random.PRNGKey(20 + i))
        losses.append(float(m["loss"]))
    return tr, losses


def test_zero1_matches_replicated(bundle):
    tr_z, loss_z = _train(bundle, zero1=True)
    tr_r, loss_r = _train(bundle, zero1=False)
    np.testing.assert_allclose(loss_z, loss_r, rtol=1e-5, atol=1e-6)
    a = jax.tree_util.tree_leaves(tr_z.trainable)
    b = jax.tree_util.tree_leaves(tr_r.trainable)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-5)


def test_zero1_state_is_sharded(bundle):
    tr, _ = _train(bundle, zero1=True, steps=1)
    leaves = jax.tree_util.tree_leaves(tr.opt_state)
    sharded = [
        l for l in leaves
        if hasattr(l, "sharding") and any(p is not None for p in getattr(l.sharding, "spec", ()))
    ]
    # the big param-shaped moment leaves must carry a 'data' dimension
    assert sharded, "no optimizer-state leaf is sharded"
    big = max(leaves, key=lambda l: l.size)
    assert any(p is not None for p in big.sharding.spec)
    # updated params come back replicated (classic ZeRO-1)
    p = jax.tree_util.tree_leaves(tr.trainable)[0]
    assert all(s is None for s in getattr(p.sharding, "spec", (None,))) or p.sharding.is_fully_replicated


def test_zero1_spec_axis_choice(bundle):
    mesh = make_mesh(num_devices=BATCH)
    s = zero1_spec(jnp.zeros((3, 3, 8, 32)), mesh)
    assert s.spec == jax.sharding.PartitionSpec(None, None, None, "data")  # largest divisible axis
    s = zero1_spec(jnp.zeros(()), mesh)
    assert s.spec == jax.sharding.PartitionSpec()
    s = zero1_spec(jnp.zeros((5, 7)), mesh)
    assert s.spec == jax.sharding.PartitionSpec()


def test_zero1_composes_with_8bit_adam(bundle):
    """ZeRO-1 sharding over the int8 moment blocks trains identically to the
    unsharded 8-bit optimizer and still distributes the big leaves."""
    import dataclasses

    def train8(zero1):
        mesh = make_mesh(num_devices=BATCH)
        cfg = Stage2Config(
            output_dir="", max_train_steps=1, train_batch_size=BATCH, resolution=RES,
            use_ema_adapter=False, checkpointing_steps=10**9, resume_from_checkpoint=None,
            shard_optimizer_state=zero1, use_8bit_adam=True,
        )
        tr = Stage2Trainer(
            bundle.unet, bundle.aggregator, bundle.resampler, bundle.vae, bundle.image_encoder,
            bundle.params, cfg, mesh=mesh,
        )
        cond = _cond(bundle, BATCH)
        data = SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES * 4)
        batch = tr.prepare_batch(next(data), cond, jax.random.PRNGKey(10))
        m = tr.train_step(batch, jax.random.PRNGKey(20))
        return tr, float(m["loss"])

    tr_z, loss_z = train8(True)
    tr_r, loss_r = train8(False)
    np.testing.assert_allclose(loss_z, loss_r, rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(tr_z.trainable), jax.tree_util.tree_leaves(tr_r.trainable)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-5)
    # int8 moment blocks actually sharded
    leaves = jax.tree_util.tree_leaves(tr_z.opt_state)
    int8_sharded = [
        l for l in leaves
        if getattr(l, "dtype", None) == jnp.int8
        and any(p is not None for p in getattr(getattr(l, "sharding", None), "spec", ()))
    ]
    assert int8_sharded, "no int8 moment leaf is sharded"
