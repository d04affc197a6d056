"""End-to-end InstantIR pipeline on tiny models (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline import InstantIRPipeline, RestoreConfig, build_step_phases
from instantir_tpu.pipeline.factory import build_pipeline


def test_build_step_phases_default():
    cfg = RestoreConfig(num_inference_steps=10, preview_start=0.1, control_guidance_end=0.7)
    phases = build_step_phases(cfg)
    modes = [p["mode"] for p in phases]
    counts = [len(p["t"]) for p in phases]
    assert modes == ["A", "B", "C"]
    assert sum(counts) == 10
    # i=0: previewing needs 0/10 >= 0.1 → False → A. i=1..6 keep(≤0.7) → B. i=7.. → C
    assert counts == [1, 6, 3]


def test_build_step_phases_always_on():
    cfg = RestoreConfig(num_inference_steps=5)
    phases = build_step_phases(cfg)
    assert [p["mode"] for p in phases] == ["B"] and len(phases[0]["t"]) == 5


@pytest.fixture(scope="module")
def tiny_pipeline():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    return build_pipeline(
        ucfg,
        tiny_vae_config(),
        rcfg,
        tiny_dinov2_config(),
        jax.random.PRNGKey(0),
        image_size=32,
    )


def _prompt_inputs(pipe, rng, b=1):
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = pipe.unet.config.projection_class_embeddings_input_dim - pipe.unet.config.addition_time_embed_dim * 6
    return (
        jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32),
    )


def test_restore_end_to_end(tiny_pipeline, rng):
    pipe = tiny_pipeline
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, 32, 32, 3)), jnp.float32)
    pe, pp = _prompt_inputs(pipe, rng)
    cfg = RestoreConfig(
        num_inference_steps=4, guidance_scale=7.0, preview_start=0.25, control_guidance_end=0.75
    )
    image, previews = pipe.restore(lq, pe, pp, cfg=cfg)
    assert image.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(image)).all()


def test_restore_latent_output_and_preview_row(tiny_pipeline, rng):
    pipe = tiny_pipeline
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, 32, 32, 3)), jnp.float32)
    pe, pp = _prompt_inputs(pipe, rng)
    cfg = RestoreConfig(num_inference_steps=4, guidance_scale=1.0, save_preview_row=True)
    latents, preview_row = pipe.restore(lq, pe, pp, cfg=cfg, output_type="latent")
    assert latents.shape == (1, 16, 16, 4)
    assert preview_row.shape == (4, 1, 16, 16, 4)
    assert np.isfinite(np.asarray(preview_row)).all()


def test_restore_deterministic_given_key(tiny_pipeline, rng):
    pipe = tiny_pipeline
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, 32, 32, 3)), jnp.float32)
    pe, pp = _prompt_inputs(pipe, rng)
    cfg = RestoreConfig(num_inference_steps=2, guidance_scale=7.0)
    out1, _ = pipe.restore(lq, pe, pp, cfg=cfg, key=jax.random.PRNGKey(7), output_type="latent")
    out2, _ = pipe.restore(lq, pe, pp, cfg=cfg, key=jax.random.PRNGKey(7), output_type="latent")
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3, _ = pipe.restore(lq, pe, pp, cfg=cfg, key=jax.random.PRNGKey(8), output_type="latent")
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6


def test_aggregator_from_unet_copied(tiny_pipeline):
    p = tiny_pipeline.params
    u = p["unet"]["params"]
    a = p["aggregator"]["params"]
    np.testing.assert_array_equal(
        np.asarray(u["conv_in"]["base"]["kernel"]), np.asarray(a["conv_in"]["base"]["kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(u["conv_in"]["base"]["kernel"]), np.asarray(a["ref_conv_in"]["base"]["kernel"])
    )
    # down-block resnet conv copied too
    np.testing.assert_array_equal(
        np.asarray(u["down_blocks_0"]["resnets_0"]["conv1"]["base"]["kernel"]),
        np.asarray(a["down_blocks_0"]["resnets_0"]["conv1"]["base"]["kernel"]),
    )
