"""Validation-as-test for the three trainers (reference ``log_validation``:
``train_stage1_adapter.py:90-159``, ``train_previewer_lora.py:118-191``,
``train_stage2_aggregator.py:99-189``): render fixed validation images
through the pipeline and log LQ/GT/restored strips.

Unlike the reference (which assembles a fresh pipeline per validation call),
the pipeline object and every jitted stage are cached on the trainer — the
second and later validation calls compile nothing and dispatch only compiled
programs (eager SDXL-scale passes cost seconds of per-op dispatch through
this environment's TPU relay, docs/perf.md).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.models.dinov2 import preprocess_dinov2
from instantir_tpu.models.vae import scale_latents, unscale_latents
from instantir_tpu.schedulers.diffusion import add_noise
from instantir_tpu.train.common import Tracker, merge_params
from instantir_tpu.utils.vis import triplet_strip


def _to_u8(x: jnp.ndarray) -> np.ndarray:
    return ((np.clip(np.asarray(x, np.float32), -1, 1) + 1) * 127.5).astype(np.uint8)


def _cached(trainer, name, builder):
    cache = getattr(trainer, "_val_cache", None)
    if cache is None:
        cache = trainer._val_cache = {}
    if name not in cache:
        cache[name] = builder()
    return cache[name]


def _ip_tokens_fn(trainer, lora_scale: float):
    """Jitted DINOv2 → Resampler chain, cached per lora_scale."""

    def build():
        def fn(params, lq):
            tokens = trainer.image_encoder.apply(params["image_encoder"], preprocess_dinov2((lq + 1.0) / 2.0))
            return trainer.resampler.apply(params["resampler"], tokens, lora_scale=lora_scale)

        return jax.jit(fn)

    return _cached(trainer, f"ip_tokens_{lora_scale}", build)


def _vae_decode_fn(trainer):
    def build():
        def fn(params, z):
            return trainer.vae.apply(
                params["vae"], unscale_latents(trainer.vae.config, z.astype(jnp.float32)),
                method=trainer.vae.decode,
            )

        return jax.jit(fn)

    return _cached(trainer, "vae_decode", build)


def validate_stage1(
    trainer, lq: jnp.ndarray, gt: jnp.ndarray, cond: Dict, tracker: Tracker, step: int, num_steps: int = 30
):
    """Stage-1 validation: txt2img generation conditioned on the LQ image's
    DINO tokens (the adapter is the only trained piece)."""
    from instantir_tpu.pipeline.stage1_sdxl import Stage1Config, Stage1SDXLPipeline

    params = merge_params(trainer.trainable, trainer.frozen)
    pipe = _cached(
        trainer,
        "stage1_pipe",
        lambda: Stage1SDXLPipeline(
            trainer.unet, trainer.vae, trainer.resampler, trainer.image_encoder, trainer.schedule, params
        ),
    )
    pipe.params = params  # jitted fns take params as runtime args — no recompile
    ip = _ip_tokens_fn(trainer, 0.0)(params, lq)
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
    from instantir_tpu.pipeline.stage1_sdxl import Stage1SDXLPipeline

    params = merge_params(trainer.trainable, trainer.frozen)
    pipe = _cached(
        trainer,
        "stage1_pipe",
        lambda: Stage1SDXLPipeline(
            trainer.unet, trainer.vae, trainer.resampler, trainer.image_encoder, trainer.schedule, params
        ),
    )
    pipe.params = params

    def build_encode():
        def fn(params, lq, key):
            z = trainer.vae.apply(params["vae"], lq.astype(jnp.float32), rng=key, sample=True, method=trainer.vae.encode)
            lq_latent = scale_latents(trainer.vae.config, z)
            t = jnp.full((lq.shape[0],), 999, jnp.int32)
            return add_noise(trainer.schedule, lq_latent, jax.random.normal(key, lq_latent.shape), t)

        return jax.jit(fn)

    noisy = _cached(trainer, "previewer_encode", build_encode)(params, lq, jax.random.PRNGKey(0))
    ip = _ip_tokens_fn(trainer, float(trainer.cfg.lora_alpha))(params, lq)
    base_cond = {k: cond[k] for k in ("prompt_embeds", "pooled_embeds", "time_ids")}
    preview = pipe.one_step_preview(noisy, 999, base_cond, ip, lora_scale=trainer.cfg.lora_alpha)
    img = _vae_decode_fn(trainer)(params, preview)
    strips = np.stack([triplet_strip(_to_u8(l), _to_u8(g), _to_u8(t_)) for l, g, t_ in zip(lq, img, gt)])
    tracker.images(step, "validation/previewer_one_step", strips.astype(np.float32) / 255.0)


def validate_stage2(trainer, lq: jnp.ndarray, gt: jnp.ndarray, cond: Dict, tracker: Tracker, step: int,
                    num_steps: int = 30):
    """Stage-2 validation: the full InstantIR restoration on the live params."""
    from instantir_tpu.pipeline.instantir import InstantIRPipeline, RestoreConfig

    params = merge_params(trainer.trainable, trainer.frozen)
    pipe = _cached(
        trainer,
        "instantir_pipe",
        lambda: InstantIRPipeline(
            trainer.unet, trainer.aggregator, trainer.vae, trainer.resampler, trainer.image_encoder,
            trainer.schedule, params,
        ),
    )
    pipe.params = params
    img, _ = pipe.restore(
        lq, cond["prompt_embeds"], cond["pooled_embeds"],
        cfg=RestoreConfig(num_inference_steps=num_steps, guidance_scale=7.0, preview_start=0.1,
                          control_guidance_end=0.7, lora_alpha=trainer.cfg.lora_alpha),
        key=jax.random.PRNGKey(0),
    )
    strips = np.stack([triplet_strip(_to_u8(l), _to_u8(g), _to_u8(t_)) for l, g, t_ in zip(lq, img, gt)])
    tracker.images(step, "validation/instantir", strips.astype(np.float32) / 255.0)
