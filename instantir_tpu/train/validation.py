"""Validation-as-test for the three trainers (reference ``log_validation``:
``train_stage1_adapter.py:90-159``, ``train_previewer_lora.py:118-191``,
``train_stage2_aggregator.py:99-189``): render fixed validation images
through a freshly assembled pipeline and log LQ/GT/restored strips.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.models.dinov2 import preprocess_dinov2
from instantir_tpu.models.vae import scale_latents
from instantir_tpu.schedulers.diffusion import add_noise
from instantir_tpu.train.common import Tracker, merge_params
from instantir_tpu.utils.vis import triplet_strip


def _to_u8(x: jnp.ndarray) -> np.ndarray:
    return ((np.clip(np.asarray(x, np.float32), -1, 1) + 1) * 127.5).astype(np.uint8)


def _ip_tokens(params, image_encoder, resampler, lq, lora_scale=0.0):
    tokens = image_encoder.apply(params["image_encoder"], preprocess_dinov2((lq + 1.0) / 2.0))
    return resampler.apply(params["resampler"], tokens, lora_scale=lora_scale)


def validate_stage1(
    trainer, lq: jnp.ndarray, gt: jnp.ndarray, cond: Dict, tracker: Tracker, step: int, num_steps: int = 30
):
    """Stage-1 validation: txt2img generation conditioned on the LQ image's
    DINO tokens (the adapter is the only trained piece)."""
    from instantir_tpu.pipeline.stage1_sdxl import Stage1Config, Stage1SDXLPipeline

    params = merge_params(trainer.trainable, trainer.frozen)
    pipe = Stage1SDXLPipeline(
        trainer.unet, trainer.vae, trainer.resampler, trainer.image_encoder, trainer.schedule, params
    )
    ip = _ip_tokens(params, trainer.image_encoder, trainer.resampler, lq)
    h = lq.shape[1]
    img = pipe(
        cond["prompt_embeds"], cond["pooled_embeds"], ip, height=h, width=h,
        cfg=Stage1Config(num_inference_steps=num_steps, guidance_scale=5.0),
        key=jax.random.PRNGKey(0), output_type="np",
    )
    strips = np.stack([triplet_strip(_to_u8(l), _to_u8(g), _to_u8(t)) for l, g, t in zip(lq, img, gt)])
    tracker.images(step, "validation/stage1", strips.astype(np.float32) / 255.0)


def validate_previewer(trainer, lq: jnp.ndarray, gt: jnp.ndarray, cond: Dict, tracker: Tracker, step: int):
    """Previewer validation: one-step restoration at t=999 from the noised LQ
    latent (reference ``prepare_latents``/``log_validation``)."""
    from instantir_tpu.models.vae import unscale_latents
    from instantir_tpu.pipeline.stage1_sdxl import Stage1SDXLPipeline

    params = merge_params(trainer.trainable, trainer.frozen)
    pipe = Stage1SDXLPipeline(
        trainer.unet, trainer.vae, trainer.resampler, trainer.image_encoder, trainer.schedule, params
    )
    key = jax.random.PRNGKey(0)
    z = trainer.vae.apply(params["vae"], lq.astype(jnp.float32), rng=key, sample=True, method=trainer.vae.encode)
    lq_latent = scale_latents(trainer.vae.config, z)
    t = jnp.full((lq.shape[0],), 999, jnp.int32)
    noisy = add_noise(trainer.schedule, lq_latent, jax.random.normal(key, lq_latent.shape), t)
    ip = _ip_tokens(params, trainer.image_encoder, trainer.resampler, lq, lora_scale=trainer.cfg.lora_alpha)
    base_cond = {k: cond[k] for k in ("prompt_embeds", "pooled_embeds", "time_ids")}
    preview = pipe.one_step_preview(noisy, 999, base_cond, ip, lora_scale=trainer.cfg.lora_alpha)
    img = trainer.vae.apply(
        params["vae"], unscale_latents(trainer.vae.config, preview.astype(jnp.float32)), method=trainer.vae.decode
    )
    strips = np.stack([triplet_strip(_to_u8(l), _to_u8(g), _to_u8(t_)) for l, g, t_ in zip(lq, img, gt)])
    tracker.images(step, "validation/previewer_one_step", strips.astype(np.float32) / 255.0)


def validate_stage2(trainer, lq: jnp.ndarray, gt: jnp.ndarray, cond: Dict, tracker: Tracker, step: int,
                    num_steps: int = 30):
    """Stage-2 validation: the full InstantIR restoration on the live params."""
    from instantir_tpu.pipeline.instantir import InstantIRPipeline, RestoreConfig

    params = merge_params(trainer.trainable, trainer.frozen)
    pipe = InstantIRPipeline(
        trainer.unet, trainer.aggregator, trainer.vae, trainer.resampler, trainer.image_encoder,
        trainer.schedule, params,
    )
    img, _ = pipe.restore(
        lq, cond["prompt_embeds"], cond["pooled_embeds"],
        cfg=RestoreConfig(num_inference_steps=num_steps, guidance_scale=7.0, preview_start=0.1,
                          control_guidance_end=0.7, lora_alpha=trainer.cfg.lora_alpha),
        key=jax.random.PRNGKey(0),
    )
    strips = np.stack([triplet_strip(_to_u8(l), _to_u8(g), _to_u8(t_)) for l, g, t_ in zip(lq, img, gt)])
    tracker.images(step, "validation/instantir", strips.astype(np.float32) / 255.0)
