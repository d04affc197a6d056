"""Data-parallel trainer parity: for all three stages the PRODUCT path
(``Trainer(mesh=...)`` → ``prepare_batch`` shards → jitted step on replicated
params with an XLA gradient all-reduce) must produce the same loss and the
same updated parameters as the single-device path on an identical batch.

Multi-device runs on the suite's virtual 8-CPU mesh (SURVEY.md §4); the
reference equivalent of this wiring is ``accelerator.prepare(...)`` +
``accelerator.backward`` (``train_stage2_aggregator.py:1285-1287,1609``).
"""

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
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.train.previewer_lora import PreviewerConfig, PreviewerTrainer
from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer
from instantir_tpu.train.stage2_aggregator import Stage2Config, Stage2Trainer

RES = 32
BATCH = 4  # shards 1-per-device over a 4-device mesh


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


def _host_batch():
    return next(SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES * 4))


def _run_one_step(trainer, pipe):
    cond = _cond(pipe, BATCH)
    batch = trainer.prepare_batch(_host_batch(), cond, jax.random.PRNGKey(2))
    metrics = trainer.train_step(batch, jax.random.PRNGKey(3))
    return float(metrics["loss"]), jax.tree_util.tree_map(np.asarray, trainer.trainable)


def _assert_tree_close(a, b, atol=2e-4):
    # One Adam step normalizes each gradient element to ±lr (1e-3) ·
    # m̂/(√v̂+ε); elements whose true gradient is numerical noise get a
    # reduction-order-dependent tiny update (observed ≤3e-5 between psum and
    # single-device summation), while real updates match to fp precision —
    # so compare with atol well below lr but above the noise-update band.
    # Gradient-scale parity under sharding is covered separately by
    # tests/test_stage1_pipeline_and_mesh.py's explicit psum-grad check.
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(x, y, atol=atol, rtol=1e-3)


def _parity(make_trainer, pipe):
    loss_1, params_1 = _run_one_step(make_trainer(None), pipe)
    mesh = make_mesh(num_devices=4)
    trainer_dp = make_trainer(mesh)
    assert trainer_dp.mesh is mesh
    loss_dp, params_dp = _run_one_step(trainer_dp, pipe)
    assert abs(loss_1 - loss_dp) < 2e-4 * max(1.0, abs(loss_1))
    _assert_tree_close(params_1, params_dp)


def test_stage1_dp_matches_single_device(bundle, tmp_path):
    def make(mesh):
        cfg = Stage1Config(
            output_dir="", max_train_steps=1, train_batch_size=BATCH, resolution=RES,
            lr_warmup_steps=0, learning_rate=1e-3, resume_from_checkpoint=None,
        )
        return Stage1Trainer(
            bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg,
            mesh=mesh,
        )

    _parity(make, bundle)


def test_previewer_dp_matches_single_device(bundle):
    def make(mesh):
        cfg = PreviewerConfig(
            output_dir="", max_train_steps=1, train_batch_size=BATCH, resolution=RES,
            num_ddim_timesteps=10, lr_warmup_steps=0, learning_rate=1e-3,
            resume_from_checkpoint=None,
        )
        return PreviewerTrainer(
            bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg,
            mesh=mesh,
        )

    _parity(make, bundle)


def test_stage2_dp_matches_single_device(bundle):
    def make(mesh):
        cfg = Stage2Config(
            output_dir="", max_train_steps=1, train_batch_size=BATCH, resolution=RES,
            cfg_scale=3.0, use_ema_adapter=True, lr_warmup_steps=0, learning_rate=1e-3,
            resume_from_checkpoint=None,
        )
        return Stage2Trainer(
            bundle.unet, bundle.aggregator, bundle.resampler, bundle.vae, bundle.image_encoder,
            bundle.params, cfg, mesh=mesh,
        )

    _parity(make, bundle)


def test_auto_mesh_resolution():
    from instantir_tpu.train.common import resolve_mesh

    # 8 CPU devices: batch 4 → 4-device mesh; batch 3 → 3; batch 1 → None
    assert resolve_mesh("auto", 4).shape["data"] == 4
    assert resolve_mesh("auto", 8).shape["data"] == 8
    assert resolve_mesh("auto", 6).shape["data"] == 6
    assert resolve_mesh("auto", 1) is None
    assert resolve_mesh(None, 4) is None
    with pytest.raises(ValueError):
        resolve_mesh(make_mesh(num_devices=8), 3)
