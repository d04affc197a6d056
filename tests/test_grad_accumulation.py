"""Gradient accumulation: params move only every k-th micro-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.data.dataset import SyntheticImageDataset
from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer

RES = 32


def test_accumulation_updates_every_k(tmp_path, rng):
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    pipe = build_pipeline(ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES)
    cfg = Stage1Config(
        output_dir=str(tmp_path / "ga"), max_train_steps=4, train_batch_size=2, resolution=RES,
        gradient_accumulation_steps=2, lr_warmup_steps=0, learning_rate=1e-3,
    )
    tr = Stage1Trainer(pipe.unet, pipe.resampler, pipe.vae, pipe.image_encoder, pipe.params, cfg)
    ds = SyntheticImageDataset(seed=0)
    data = ds.batches(batch_size=2, gt_size=RES * 4)
    cross = ucfg.cross_attention_dim
    pooled_dim = ucfg.projection_class_embeddings_input_dim - ucfg.addition_time_embed_dim * 6
    cond = {
        "prompt_embeds": jnp.zeros((2, 7, cross), jnp.float32),
        "pooled_embeds": jnp.zeros((2, pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32), (2, 1)),
    }

    def snap():
        return jax.tree_util.tree_map(np.asarray, tr.trainable)

    p0 = snap()
    batch = tr.prepare_batch(next(data), cond, jax.random.PRNGKey(0))
    tr.train_step(batch, jax.random.PRNGKey(1))
    p1 = snap()
    # micro-step 1 of 2: no parameter movement yet
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)
    tr.train_step(batch, jax.random.PRNGKey(2))
    p2 = snap()
    moved = max(
        float(np.abs(a - b).max()) for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2))
    )
    assert moved > 0
