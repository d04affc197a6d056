"""Trainer smoke + invariants on tiny models: one step runs, only the right
params move, checkpoints resume, exports write reference-format payloads."""

import os

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
from instantir_tpu.train import common
from instantir_tpu.train.previewer_lora import PreviewerConfig, PreviewerTrainer
from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer, stage1_trainable_pred
from instantir_tpu.train.stage2_aggregator import Stage2Config, Stage2Trainer

RES = 32  # must be divisible by 4 (sf) and ≥ dinov2 patch


@pytest.fixture(scope="module")
def bundle():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    pipe = build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES
    )
    return pipe


def _cond(pipe, b):
    rng = np.random.default_rng(5)
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = pipe.unet.config.projection_class_embeddings_input_dim - pipe.unet.config.addition_time_embed_dim * 6
    return {
        "prompt_embeds": jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32),
        "uncond_prompt_embeds": jnp.zeros((b, 7, cross), jnp.float32),
        "pooled_embeds": jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32),
        "uncond_pooled_embeds": jnp.zeros((b, pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32), (b, 1)),
    }


def _data():
    ds = SyntheticImageDataset(seed=0)
    return ds.batches(batch_size=2, gt_size=RES * 4)  # degradation crops gt_size then /sf... gt at RES


def _frozen_leaves(trainer):
    return jax.tree_util.tree_map(np.asarray, trainer.frozen)


def test_stage1_step_and_masking(bundle, tmp_path):
    cfg = Stage1Config(
        output_dir=str(tmp_path / "s1"), max_train_steps=2, train_batch_size=2, resolution=RES,
        checkpointing_steps=1000, logging_steps=1, lr_warmup_steps=0, learning_rate=1e-3,
    )
    tr = Stage1Trainer(bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg)
    before_train = jax.tree_util.tree_map(np.asarray, tr.trainable)
    before_frozen = _frozen_leaves(tr)
    data = _data()
    cond = _cond(bundle, 2)
    key = jax.random.PRNGKey(0)
    batch = tr.prepare_batch(next(data), cond, key)
    assert batch["gt"].shape == (2, RES, RES, 3)
    metrics = tr.train_step(batch, key)
    assert np.isfinite(float(metrics["loss"]))
    # trainable moved, frozen untouched
    moved = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - np.asarray(b)).max()), before_train, tr.trainable)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    for a, b in zip(jax.tree_util.tree_leaves(before_frozen), jax.tree_util.tree_leaves(tr.frozen)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_stage1_checkpoint_resume_and_export(bundle, tmp_path):
    cfg = Stage1Config(output_dir=str(tmp_path / "s1b"), max_train_steps=1, train_batch_size=2, resolution=RES)
    tr = Stage1Trainer(bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg)
    batch = tr.prepare_batch(next(_data()), _cond(bundle, 2), jax.random.PRNGKey(1))
    tr.train_step(batch, jax.random.PRNGKey(2))
    tr.save_checkpoint()
    tr2 = Stage1Trainer(bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg)
    tr2.resume()
    assert tr2.global_step == 1
    for a, b in zip(jax.tree_util.tree_leaves(tr.trainable), jax.tree_util.tree_leaves(tr2.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # reference-format export
    out = str(tmp_path / "adapter_ckpt.pt")
    tr.export_adapter(out)
    import torch

    payload = torch.load(out, weights_only=True)
    assert set(payload.keys()) == {"image_proj", "ip_adapter"}
    assert any("to_k_ip" in k for k in payload["ip_adapter"])


def test_previewer_step_trains_only_lora(bundle, tmp_path):
    cfg = PreviewerConfig(
        output_dir=str(tmp_path / "pv"), max_train_steps=1, train_batch_size=2, resolution=RES, num_ddim_timesteps=10
    )
    tr = PreviewerTrainer(bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg)
    for k in tr.trainable:
        assert "lora_a" in k or "lora_b" in k
    batch = tr.prepare_batch(next(_data()), _cond(bundle, 2), jax.random.PRNGKey(0))
    metrics = tr.train_step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    out = str(tmp_path / "previewer_lora_weights.bin")
    tr.export_lora(out)
    import torch

    sd = torch.load(out, weights_only=True)
    assert all(k.startswith("unet.") and ("lora_A" in k or "lora_B" in k) for k in sd)
    assert len(sd) > 10


def test_stage2_step_trains_aggregator(bundle, tmp_path):
    cfg = Stage2Config(
        output_dir=str(tmp_path / "s2"), max_train_steps=1, train_batch_size=2, resolution=RES,
        cfg_scale=3.0, use_ema_adapter=True,
    )
    tr = Stage2Trainer(
        bundle.unet, bundle.aggregator, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg
    )
    for k in tr.trainable:
        assert k[0] == "aggregator"
    before_frozen = _frozen_leaves(tr)
    batch = tr.prepare_batch(next(_data()), _cond(bundle, 2), jax.random.PRNGKey(0))
    metrics = tr.train_step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "preview_error_latent" in metrics
    for a, b in zip(jax.tree_util.tree_leaves(before_frozen), jax.tree_util.tree_leaves(tr.frozen)):
        np.testing.assert_array_equal(a, np.asarray(b))
    out = str(tmp_path / "aggregator.pt")
    tr.export_aggregator(out)
    import torch

    sd = torch.load(out, weights_only=True)
    assert "conv_in.weight" in sd and "controlnet_mid_block.1.weight" in sd


def test_sanity_check_mode(bundle, tmp_path, capsys):
    cfg = Stage1Config(
        output_dir=str(tmp_path / "sc"), max_train_steps=100, train_batch_size=2, resolution=RES, sanity_check=True
    )
    tr = Stage1Trainer(bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg)
    tr.run(_data(), _cond(bundle, 2))
    assert tr.global_step == 1  # stopped after one batch
    assert "PASS" in capsys.readouterr().out


def test_previewer_image_space_dino_loss(bundle):
    """Optional image-space branch (reference train_previewer_lora.py:1595-1623):
    pred/target decoded through the VAE, DINOLoss over DINOv2 tokens, the
    teacher-center momentum state carried across steps."""
    from instantir_tpu.losses.loss_config import LossesConfig, SingleLossConfig

    losses_cfg = LossesConfig(
        lcm_losses=[
            SingleLossConfig(name="HuberLoss", weight=1.0, init_params={"huber_c": 0.001}),
            SingleLossConfig(name="DINOLoss", weight=0.5),
        ]
    )
    cfg = PreviewerConfig(
        output_dir="", max_train_steps=2, train_batch_size=2, resolution=RES,
        num_ddim_timesteps=10, lr_warmup_steps=0, resume_from_checkpoint=None,
    )
    tr = PreviewerTrainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg, losses_cfg
    )
    assert tr._dino is not None
    cond = _cond(bundle, 2)
    data = _data()
    batch = tr.prepare_batch(next(data), cond, jax.random.PRNGKey(0))
    m = tr.train_step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["DINOLoss"]))
    # the running center moved off zero after one step
    c1 = np.asarray(tr.dino_center)
    assert np.abs(c1).max() > 0
    batch = tr.prepare_batch(next(data), cond, jax.random.PRNGKey(2))
    tr.train_step(batch, jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(tr.dino_center), c1)


def test_previewer_image_space_lpips_loss(bundle):
    """The image-space branch generalizes beyond DINOLoss: any needs_images
    loss (here LPIPS with tiny injected weights) gets VAE-decoded pred/target."""
    import numpy as _np

    from instantir_tpu.losses.loss_config import LossesConfig, SingleLossConfig
    from instantir_tpu.losses.lpips import convert_lpips, tiny_lpips_config

    lcfg = tiny_lpips_config()
    rng = _np.random.default_rng(0)
    sd = {}
    in_ch = 3
    for si, (conv_ids, ch) in enumerate(zip(lcfg.slices, lcfg.channels)):
        for ci in conv_ids:
            sd[f"net.slice{si + 1}.{ci}.weight"] = rng.normal(size=(ch, in_ch, 3, 3)).astype(_np.float32) * 0.2
            sd[f"net.slice{si + 1}.{ci}.bias"] = _np.zeros((ch,), _np.float32)
            in_ch = ch
        sd[f"lin{si}.model.1.weight"] = _np.abs(rng.normal(size=(1, ch, 1, 1))).astype(_np.float32)
    lpips_params = convert_lpips(sd, lcfg)

    losses_cfg = LossesConfig(
        lcm_losses=[
            SingleLossConfig(name="HuberLoss", weight=1.0, init_params={"huber_c": 0.001}),
            SingleLossConfig(name="LPIPSLoss", weight=0.1,
                             init_params={"params": lpips_params, "config": lcfg}),
        ]
    )
    cfg = PreviewerConfig(
        output_dir="", max_train_steps=1, train_batch_size=2, resolution=RES,
        num_ddim_timesteps=10, lr_warmup_steps=0, resume_from_checkpoint=None,
    )
    tr = PreviewerTrainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg, losses_cfg
    )
    batch = tr.prepare_batch(next(_data()), _cond(bundle, 2), jax.random.PRNGKey(0))
    m = tr.train_step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["LPIPSLoss"]))
    assert float(m["LPIPSLoss"]) > 0


def test_previewer_lcm_visualization(bundle):
    """LCMVisualization (reference losses/losses.py:99-123): zero-weight dummy
    loss that makes the trainer log an [lq | gt | prediction] strip every
    visualize_every_k steps."""
    from instantir_tpu.losses.loss_config import LossesConfig, SingleLossConfig

    losses_cfg = LossesConfig(
        lcm_losses=[
            SingleLossConfig(name="HuberLoss", weight=1.0, init_params={"huber_c": 0.001}),
            SingleLossConfig(name="LCMVisualization", weight=0.0, visualize_every_k=2),
        ]
    )
    cfg = PreviewerConfig(
        output_dir="", max_train_steps=2, train_batch_size=2, resolution=RES,
        num_ddim_timesteps=10, lr_warmup_steps=0, resume_from_checkpoint=None,
    )
    tr = PreviewerTrainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg, losses_cfg
    )
    logged = []
    tr.tracker.images = lambda step, tag, images: logged.append((step, tag, images.shape))
    cond = _cond(bundle, 2)
    data = _data()
    m = tr.train_step(tr.prepare_batch(next(data), cond, jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    assert "_vis_strip" not in m and float(m["LCMVisualization"]) == 0.0
    assert logged and logged[0][0] == 0 and logged[0][2] == (2, RES, 3 * RES, 3)
    tr.train_step(tr.prepare_batch(next(data), cond, jax.random.PRNGKey(2)), jax.random.PRNGKey(3))
    assert len(logged) == 1  # step 1 is off-cadence
