"""Stage-1 SDXL pipeline: txt2img with IP-adapter image prompting.

Rebuild of ``pipelines/stage1_sdxl_pipeline.py`` (the reference's vanilla
SDXL pipeline used by stage-1/previewer validation): pure-noise (or given)
latents, DDPM sampling, optional custom timesteps — including the one-step
previewer validation mode (``timesteps=[999]`` with LQ-noised init latents,
``train_previewer_lora.py:98-115``).

One jitted ``lax.scan`` over the step sequence; CFG handled in-graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.schedulers.diffusion import (
    add_noise,
    ddpm_inference_timesteps,
    ddpm_prev_timesteps,
    ddpm_step,
    lcm_single_step,
)


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    num_inference_steps: int = 30
    guidance_scale: float = 5.0
    lora_scale: float = 0.0  # >0 enables the previewer LoRA during sampling
    num_train_timesteps: int = 1000
    timestep_spacing: str = "leading"
    steps_offset: int = 1
    timesteps: Optional[Tuple[int, ...]] = None  # custom (descending) sequence

    @property
    def do_cfg(self) -> bool:
        return self.guidance_scale > 1.0


class Stage1SDXLPipeline:
    """txt2img with image-prompt conditioning on this framework's models."""

    def __init__(self, unet, vae, resampler, image_encoder, schedule, params: Dict[str, Any]):
        self.unet = unet
        self.vae = vae
        self.resampler = resampler
        self.image_encoder = image_encoder
        self.schedule = schedule
        self.params = params
        self._fns: Dict[Any, Any] = {}

    def merge_previewer_lora_inplace(self, alpha: float = 1.0):
        """Fold the previewer LoRA into the UNet base kernels IN PLACE and
        drop the A/B pairs. Unlike ``InstantIRPipeline.freeze_previewer``,
        this pipeline never needs the un-merged base alongside (there is only
        one UNet pass per step), so the merge costs no extra HBM — afterwards
        apply with ``lora_scale=0`` (statically skipped) for LoRA-``alpha``
        behavior, ~12% faster at SDXL scale. Irreversible on this instance."""
        import jax

        from instantir_tpu.models.layers import merge_lora_tree

        merged = jax.jit(
            lambda p: merge_lora_tree(p, alpha, self.unet.config.lora_alpha)
        )(self.params["unet"]["params"])

        def strip(node):
            if not isinstance(node, dict):
                return node
            if "base" in node and "lora_a" in node:
                return {k: v for k, v in node.items() if k not in ("lora_a", "lora_b")}
            return {k: strip(v) for k, v in node.items()}

        self.params = {**self.params, "unet": {**self.params["unet"], "params": strip(merged)}}
        self._fns.clear()
        return self

    def _sample_fn(self, cfg: Stage1Config):
        if cfg in self._fns:
            return self._fns[cfg]
        schedule = self.schedule
        unet = self.unet
        do_cfg = cfg.do_cfg

        if cfg.timesteps is not None:
            ts = np.asarray(cfg.timesteps, np.int64)
            n = len(ts)
            prev_ts = np.concatenate([ts[1:], [-1]])
        else:
            ts = ddpm_inference_timesteps(
                cfg.num_inference_steps, cfg.num_train_timesteps, cfg.timestep_spacing, cfg.steps_offset
            )
            prev_ts = ddpm_prev_timesteps(ts, cfg.num_train_timesteps, cfg.num_inference_steps)
        steps = {
            "t": jnp.asarray(ts, jnp.int32),
            "prev_t": jnp.asarray(prev_ts, jnp.int32),
        }

        def sample(params, latents, cond, ip_tokens, key):
            bsz = latents.shape[0]

            def body(carry, step_in):
                latents, key = carry
                t = step_in["t"]
                tb = jnp.full((bsz * (2 if do_cfg else 1),), t, jnp.int32)
                latent_in = jnp.concatenate([latents] * 2, axis=0) if do_cfg else latents
                eps = unet.apply(
                    params["unet"],
                    latent_in,
                    tb,
                    encoder_hidden_states=cond["prompt_embeds"],
                    added_text_embeds=cond["pooled_embeds"],
                    added_time_ids=cond["time_ids"],
                    ip_hidden_states=ip_tokens,
                    lora_scale=cfg.lora_scale,
                )
                if do_cfg:
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
                key, sub = jax.random.split(key)
                latents, _ = ddpm_step(
                    schedule,
                    eps,
                    jnp.full((bsz,), t, jnp.int32),
                    jnp.full((bsz,), step_in["prev_t"], jnp.int32),
                    latents,
                    jax.random.normal(sub, latents.shape, jnp.float32),
                )
                return (latents, key), ()

            (latents, _), _ = jax.lax.scan(body, (latents, key), steps)
            return latents

        fn = jax.jit(sample)
        self._fns[cfg] = fn
        return fn

    def one_step_preview(self, latents: jnp.ndarray, t: int, cond, ip_tokens, lora_scale: float = 1.0):
        """The previewer-validation mode: single UNet pass + LCM step (jitted,
        cached per lora_scale — an eager SDXL UNet pass costs seconds of
        per-op dispatch through this environment's TPU relay)."""
        key = ("one_step_preview", float(lora_scale))
        if key not in self._fns:

            def preview(params, latents, t, cond, ip_tokens):
                tb = jnp.full((latents.shape[0],), t, jnp.int32)
                eps = self.unet.apply(
                    params["unet"],
                    latents,
                    tb,
                    encoder_hidden_states=cond["prompt_embeds"],
                    added_text_embeds=cond["pooled_embeds"],
                    added_time_ids=cond["time_ids"],
                    ip_hidden_states=ip_tokens,
                    lora_scale=lora_scale,
                )
                return lcm_single_step(self.schedule, eps, tb, latents)

            self._fns[key] = jax.jit(preview)
        return self._fns[key](self.params, latents, jnp.asarray(t, jnp.int32), cond, ip_tokens)

    def __call__(
        self,
        prompt_embeds: jnp.ndarray,
        pooled_embeds: jnp.ndarray,
        ip_tokens: jnp.ndarray,
        height: int,
        width: int,
        cfg: Stage1Config = Stage1Config(),
        latents: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        negative_pooled_embeds: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
        output_type: str = "latent",
    ):
        if key is None:
            key = jax.random.PRNGKey(0)
        b = prompt_embeds.shape[0]
        vae_scale = 2 ** (len(self.vae.config.block_out_channels) - 1)
        lat_h, lat_w = height // vae_scale, width // vae_scale
        key, k_init = jax.random.split(key)
        if latents is None:
            latents = jax.random.normal(k_init, (b, lat_h, lat_w, 4), jnp.float32)

        if cfg.do_cfg:
            if negative_prompt_embeds is None:
                negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
                negative_pooled_embeds = jnp.zeros_like(pooled_embeds)
            prompt_embeds = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
            pooled_embeds = jnp.concatenate([negative_pooled_embeds, pooled_embeds], axis=0)
            if ip_tokens.shape[0] == b:
                ip_tokens = jnp.concatenate([ip_tokens, ip_tokens], axis=0)
        time_ids = jnp.tile(
            jnp.asarray([[height, width, 0, 0, height, width]], prompt_embeds.dtype), (prompt_embeds.shape[0], 1)
        )
        cond = {"prompt_embeds": prompt_embeds, "pooled_embeds": pooled_embeds, "time_ids": time_ids}
        latents = self._sample_fn(cfg)(self.params, latents, cond, ip_tokens, key)
        if output_type == "latent":
            return latents
        from instantir_tpu.models.vae import unscale_latents

        z = unscale_latents(self.vae.config, latents.astype(jnp.float32))
        return self.vae.apply(self.params["vae"], z, method=self.vae.decode)
