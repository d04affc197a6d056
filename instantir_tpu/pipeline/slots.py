"""Slot-based continuous batching: per-slot timesteps over one resident batch.

The whole-request batcher (``cli/serve.py::RestoreServer``) admits requests
only between full 30-step restores, so an unlucky request waits
(queue + whole batch) regardless of chip headroom — the round-4 serve table
is queue-dominated (docs/perf.md). This module is the vLLM-style
iteration-level counterpart for diffusion restoration: a **resident device
batch of N slots**, each slot carrying its *own* step index, per-slot RNG
stream and conditioning, stepped one denoise step at a time — finished slots
are decoded and refilled from the queue **mid-flight**.

Why the numerics core already supports this: every scheduler routine takes
batched per-sample timesteps ``[B]`` (``schedulers/diffusion.py``), and the
UNet/Aggregator take per-sample ``t`` by construction. The reference
implementation cannot do any of this — its scheduler objects hold Python
``step_index`` state shared by the whole batch
(``schedulers/lcm_single_step_scheduler.py``), and its only serving surface
is a single-user gradio demo (``gradio_demo/app.py:112``).

Design (TPU rules first):

* **One compiled step program per bucket** — static shapes, per-slot step
  indices are data, the step schedule (t, prev_t, previewing, cnet-keep) is
  baked in as gather tables. No shape-driven recompiles, ever.
* **Exact per-slot math.** The three sampler phases (A: cnet on/preview off,
  B: both on, C: cnet off — ``pipeline/instantir.py``) become per-slot masks:
  a non-previewing slot's preview input is its LQ latent (= phase A), a
  cnet-off slot's residuals are multiplied to zero before the UNet add
  (= phase C bit-for-bit, since phase C adds nothing). A single slot stepped
  alone is bitwise-identical to the staged phase sampler at batch 1
  (tests/test_slots.py).
* **Traced-cond skips.** The previewer/aggregator branches run under
  ``lax.cond(jnp.any(mask))`` — when no resident slot needs them (e.g. the
  whole batch is in the C tail, always true near the end at batch 1) the
  chip skips them entirely; mixed batches pay the superset once for all
  slots.
* **Per-slot RNG.** Each slot carries its own PRNG key, split once per step
  it actually executes — a slot's trajectory is bitwise-independent of what
  else occupies the batch (mid-flight refills change nothing; tested).
* **Host-side step accounting.** The host knows every slot's step count
  deterministically (it advances by one per executed step), so scheduling
  decisions need no device→host sync; the serve layer fetches the on-device
  ``step_idx`` only as pacing/assertion.

Reference parity anchor: the per-step schedule flags mirror
``pipelines/sdxl_instantir.py:1414-1421`` via ``build_step_phases`` (the
tables are derived from the same function the phase sampler uses).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.models.dinov2 import preprocess_dinov2
from instantir_tpu.pipeline.instantir import RestoreConfig, build_step_phases, rescale_noise_cfg
from instantir_tpu.schedulers.diffusion import add_noise, ddpm_step, lcm_single_step


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SlotState:
    """Device-resident state of one bucket's slot batch (a pytree).

    Conditioning is stored as separate uncond/cond halves ([N, ...] rows);
    the step program concatenates them into the CFG batch layout
    ``[uncond, text]`` exactly as the phase sampler does.
    """

    latents: jnp.ndarray        # [N, h, w, 4] current x_t per slot
    image_latent: jnp.ndarray   # [N, h, w, 4] LQ condition latent per slot
    prompt_u: jnp.ndarray       # [N, 77, 2048]
    prompt_c: jnp.ndarray
    pooled_u: jnp.ndarray       # [N, 1280]
    pooled_c: jnp.ndarray
    ip_base_u: jnp.ndarray      # [N, 64, 2048] resampler tokens, lora off
    ip_base_c: jnp.ndarray
    ip_lora_u: jnp.ndarray      # [N, 64, 2048] resampler tokens, lora on
    ip_lora_c: jnp.ndarray
    rng: jnp.ndarray            # [N, 2] uint32 per-slot PRNG keys
    step_idx: jnp.ndarray       # [N] int32: next step to execute; == n_steps → idle/done


def build_step_tables(cfg: RestoreConfig) -> Dict[str, np.ndarray]:
    """Flat per-step schedule tables, derived from the SAME ``build_step_phases``
    the phase sampler compiles from — one source of truth for the reference's
    per-step flags (``sdxl_instantir.py:1414-1421``)."""
    t, prev_t, previewing, keep = [], [], [], []
    for phase in build_step_phases(cfg):
        for i in range(len(phase["t"])):
            t.append(phase["t"][i])
            prev_t.append(phase["prev_t"][i])
            previewing.append(1.0 if phase["mode"] == "B" else 0.0)
            keep.append(1.0 if phase["mode"] in ("A", "B") else 0.0)
    return {
        "t": np.asarray(t, np.int32),
        "prev_t": np.asarray(prev_t, np.int32),
        "previewing": np.asarray(previewing, np.float32),
        "keep": np.asarray(keep, np.float32),
    }


class SlotSampler:
    """Compiled slot programs for one (pipeline, RestoreConfig, bucket) triple.

    Programs (all static-shape, compiled once at warmup):
      * ``prelude(params, image, pe, pooled, npe, npooled, key)`` — batch-1
        encode: VAE posterior sample, DINOv2→Resampler ip tokens (both LoRA
        modes), init noise. RNG split structure mirrors
        ``InstantIRPipeline.restore`` exactly (k_vae / k_init / loop key), so
        a slot's end-to-end trajectory matches the staged pipeline's.
      * ``step(params, state)`` — ONE denoise step for every active slot.
      * ``insert(state, payload, slot)`` / ``extract(state, slot)`` — O(1)
        functional scatter/gather on the resident state.
      * ``decode1`` — batch-1 VAE decode (only finished slots pay decode).
    """

    def __init__(self, pipe, cfg: RestoreConfig, resolution: int, n_slots: int):
        if cfg.deepcache_interval > 1:
            raise ValueError("slot serving is exact-schedule only: deepcache caches are "
                             "cross-step state that per-slot staggering would corrupt; "
                             "use the whole-request batcher for --deepcache_interval")
        for flag in ("multistep_restore", "adastep_restore", "save_preview_row",
                     "fused", "sequence_parallel", "fuse_previewer_lora"):
            if getattr(cfg, flag):
                raise ValueError(f"slot serving does not support RestoreConfig.{flag}")
        if pipe._prev_unet is not None:
            raise ValueError("slot serving does not support freeze_previewer pipelines")
        if pipe.mesh is not None:
            raise ValueError("slot serving is single-host-placement only for now; "
                             "run without pipe.shard(mesh) (scale by adding server "
                             "processes per chip, the production serving layout)")

        self.pipe = pipe
        self.cfg = cfg
        self.resolution = int(resolution)
        self.n_slots = int(n_slots)
        self.tables = build_step_tables(cfg)
        self.n_steps = len(self.tables["t"])
        self._latent = resolution // 8
        self._build()

    # -- program construction ----------------------------------------------

    def _build(self):
        pipe, cfg = self.pipe, self.cfg
        schedule = pipe.schedule
        unet, aggregator, vae, resampler, dino = (
            pipe.unet, pipe.aggregator, pipe.vae, pipe.resampler, pipe.image_encoder)
        do_cfg = cfg.do_cfg
        gs = cfg.guidance_scale
        share_preview = do_cfg and not cfg.preview_cfg
        share_cnet = do_cfg and not cfg.controlnet_cfg
        t_tab = self.tables["t"]
        prev_tab = self.tables["prev_t"]
        pv_tab = self.tables["previewing"]
        keep_tab = self.tables["keep"]
        n_steps = self.n_steps
        res = self.resolution
        t_first = int(t_tab[0])

        def double(x):
            return jnp.concatenate([x, x], axis=0) if do_cfg else x

        def unet_apply(params, latents, t, cond, lora_scale, ip_tokens,
                       residuals=None, mid_residual=None):
            return unet.apply(
                params["unet"], latents, t,
                encoder_hidden_states=cond["prompt_embeds"],
                added_text_embeds=cond["pooled_embeds"],
                added_time_ids=cond["time_ids"],
                ip_hidden_states=ip_tokens,
                down_block_additional_residuals=residuals,
                mid_block_additional_residual=mid_residual,
                lora_scale=lora_scale,
            )

        def cfg_combine(noise_pred):
            if not do_cfg:
                return noise_pred
            uncond, text = jnp.split(noise_pred, 2, axis=0)
            pred = uncond + gs * (text - uncond)
            if cfg.guidance_rescale > 0.0:
                pred = rescale_noise_cfg(pred, text, cfg.guidance_rescale)
            return pred

        def step(params, state: SlotState) -> SlotState:
            n = state.latents.shape[0]
            act = state.step_idx < n_steps                      # [N] bool
            ii = jnp.minimum(state.step_idx, n_steps - 1)
            t = jnp.asarray(t_tab)[ii]                          # [N] int32
            prev_t = jnp.asarray(prev_tab)[ii]
            pv = jnp.asarray(pv_tab)[ii] * act                  # [N] f32
            kp = jnp.asarray(keep_tab)[ii] * act

            latents = state.latents
            latent_in = double(latents)
            tb = double(t)
            cond = {
                "prompt_embeds": jnp.concatenate([state.prompt_u, state.prompt_c], 0) if do_cfg else state.prompt_c,
                "pooled_embeds": jnp.concatenate([state.pooled_u, state.pooled_c], 0) if do_cfg else state.pooled_c,
            }
            cond["time_ids"] = jnp.tile(
                jnp.asarray([[res, res, 0, 0, res, res]], cond["prompt_embeds"].dtype),
                (cond["prompt_embeds"].shape[0], 1),
            )
            ip_base = jnp.concatenate([state.ip_base_u, state.ip_base_c], 0) if do_cfg else state.ip_base_c
            ip_lora = jnp.concatenate([state.ip_lora_u, state.ip_lora_c], 0) if do_cfg else state.ip_lora_c
            image_latent_d = double(state.image_latent)

            # -- previewer (phase-B slots), skipped when no slot previews ---
            def run_prev(_):
                p_lat = latents if share_preview else latent_in
                p_tb = t if share_preview else tb
                p_cond = ({k: v[-n:] for k, v in cond.items()} if share_preview else cond)
                p_ip = ip_lora[-n:] if share_preview else ip_lora
                noise = unet_apply(params, p_lat, p_tb, p_cond, cfg.lora_alpha, p_ip)
                preview = lcm_single_step(schedule, noise, p_tb, p_lat)
                return double(preview) if share_preview else preview

            preview = jax.lax.cond(jnp.any(pv > 0), run_prev,
                                   lambda _: jnp.zeros_like(latent_in), None)
            # phase-A slots condition the aggregator on the LQ latent
            # (reference :1582); per-slot select, doubled to the CFG layout
            pv_mask = double(pv).reshape(-1, 1, 1, 1) > 0
            preview_latent = jnp.where(pv_mask, preview, image_latent_d)

            # -- aggregator + main UNet. Two traced branches: when every
            # resident slot is in the C tail the chip runs the plain-UNet
            # branch (bitwise phase C); otherwise the aggregator runs once
            # for the batch and cnet-off slots zero their residuals before
            # the UNet's adds — adding zero is exact, so per-slot phase C
            # stays bitwise inside a mixed batch too.
            def controlled(_):
                down, mid = aggregator.apply(
                    params["aggregator"],
                    image_latent_d[-n:] if share_cnet else image_latent_d,
                    t if share_cnet else tb,
                    controlnet_cond=(preview_latent[-n:] if share_cnet else preview_latent).astype(latents.dtype),
                    added_text_embeds=cond["pooled_embeds"][-n:] if share_cnet else cond["pooled_embeds"],
                    added_time_ids=cond["time_ids"][-n:] if share_cnet else cond["time_ids"],
                )
                if share_cnet:
                    down = tuple(double(r) for r in down)
                    mid = double(mid)
                # cnet-on slots scale by controlnet_conditioning_scale like
                # the phase sampler's clipped preview factor at its default 1.0
                cond_scale = double(kp * cfg.controlnet_conditioning_scale).reshape(-1, 1, 1, 1)
                down = tuple(r * cond_scale.astype(r.dtype) for r in down)
                mid = mid * cond_scale.astype(mid.dtype)
                return unet_apply(params, latent_in, tb, cond, 0.0, ip_base, down, mid)

            def plain(_):
                return unet_apply(params, latent_in, tb, cond, 0.0, ip_base)

            noise_pred = cfg_combine(jax.lax.cond(jnp.any(kp > 0), controlled, plain, None))

            # per-slot RNG: one split per EXECUTED step, so a slot's stream
            # depends only on its own progress, never on batch composition
            split2 = jax.vmap(lambda k: jax.random.split(k, 2))(state.rng)  # [N,2,2]
            new_keys, subs = split2[:, 0], split2[:, 1]
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (1,) + latents.shape[1:], jnp.float32)[0]
            )(subs)
            new_latents, _ = ddpm_step(schedule, noise_pred, t, prev_t, latents, noise)

            act4 = act.reshape(-1, 1, 1, 1)
            return dataclasses.replace(
                state,
                latents=jnp.where(act4, new_latents, latents),
                rng=jnp.where(act.reshape(-1, 1), new_keys, state.rng),
                step_idx=state.step_idx + act.astype(jnp.int32),
            )

        self._step = jax.jit(step, donate_argnums=(1,))

        # -- batch-1 prelude: mirrors restore()'s stage math + RNG order ----
        def prelude(params, image, pe, pooled, npe, npooled, uncond_tokens, key):
            key, k_vae, k_init = jax.random.split(key, 3)
            from instantir_tpu.models.vae import scale_latents

            raw = vae.apply(params["vae"], image.astype(jnp.float32), rng=k_vae,
                            sample=True, method=vae.encode)
            image_latent = scale_latents(vae.config, raw).astype(pe.dtype)

            pixels = preprocess_dinov2((image + 1.0) / 2.0, size=dino.config.image_size)
            dino_c = dino.apply(params["image_encoder"], pixels)
            dino_u = jnp.broadcast_to(uncond_tokens, dino_c.shape)
            tokens = jnp.concatenate([dino_u, dino_c], axis=0) if do_cfg else dino_c
            ip_base = resampler.apply(params["resampler"], tokens, lora_scale=0.0)
            ip_lora = resampler.apply(params["resampler"], tokens, lora_scale=float(cfg.lora_alpha))

            t0 = jnp.full((image.shape[0],), t_first, jnp.int32)
            latents = add_noise(schedule, image_latent,
                                jax.random.normal(k_init, image_latent.shape, jnp.float32), t0)
            if do_cfg:
                ip_base_u, ip_base_c = jnp.split(ip_base, 2, axis=0)
                ip_lora_u, ip_lora_c = jnp.split(ip_lora, 2, axis=0)
            else:
                ip_base_u = ip_base_c = ip_base
                ip_lora_u = ip_lora_c = ip_lora
            npe = jnp.zeros_like(pe) if npe is None else npe
            npooled = jnp.zeros_like(pooled) if npooled is None else npooled
            return {
                "latents": latents, "image_latent": image_latent,
                "prompt_u": npe, "prompt_c": pe, "pooled_u": npooled, "pooled_c": pooled,
                "ip_base_u": ip_base_u, "ip_base_c": ip_base_c,
                "ip_lora_u": ip_lora_u, "ip_lora_c": ip_lora_c,
                "rng": key[None] if key.ndim == 1 else key,
            }

        self._prelude = jax.jit(prelude)

        def insert(state: SlotState, payload, slot):
            upd = {k: getattr(state, k).at[slot].set(v[0]) for k, v in payload.items()}
            return dataclasses.replace(
                state, step_idx=state.step_idx.at[slot].set(0), **upd)

        # no donation on insert: an extract of the finishing slot may still
        # be in flight on the same buffers; the state copy is ~3 MB
        self._insert = jax.jit(insert)
        self._extract = jax.jit(lambda state, slot: state.latents[slot][None])

    # -- host API -----------------------------------------------------------

    def empty_state(self, payload: Dict[str, jnp.ndarray]) -> SlotState:
        """All-idle slot state shaped after one ``prelude`` payload (shapes
        and dtypes follow the model configs, not hard-coded SDXL dims)."""
        n = self.n_slots

        def rep(x):
            return jnp.zeros((n,) + tuple(x.shape[1:]), x.dtype)

        return SlotState(
            **{k: rep(v) for k, v in payload.items() if k != "rng"},
            rng=jnp.zeros((n, 2), jnp.uint32),
            # idle slots sit at n_steps (inactive); refill resets to 0
            step_idx=jnp.full((n,), self.n_steps, jnp.int32),
        )

    def prelude(self, image: jnp.ndarray, prompt_embeds: jnp.ndarray,
                pooled_embeds: jnp.ndarray, negative_prompt_embeds: Optional[jnp.ndarray],
                negative_pooled_embeds: Optional[jnp.ndarray], key: jax.Array) -> Dict[str, jnp.ndarray]:
        """Encode ONE request ([1, r, r, 3] in [-1,1]) into a slot payload."""
        enc_size = self.pipe.image_encoder.config.image_size
        uncond = self.pipe._ensure_uncond_tokens(
            self.pipe.params, (enc_size, enc_size, 3), image.dtype)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        if negative_pooled_embeds is None:
            negative_pooled_embeds = jnp.zeros_like(pooled_embeds)
        return self._prelude(self.pipe.params, image, prompt_embeds, pooled_embeds,
                             negative_prompt_embeds, negative_pooled_embeds, uncond, key)

    def insert(self, state: SlotState, payload: Dict[str, jnp.ndarray], slot: int) -> SlotState:
        return self._insert(state, payload, jnp.int32(slot))

    def step(self, state: SlotState) -> SlotState:
        """Advance every active slot by one denoise step (async dispatch)."""
        return self._step(self.pipe.params, state)

    def extract_decode(self, state: SlotState, slot: int) -> jnp.ndarray:
        """Finished slot → [1, r, r, 3] image in [-1,1] (device array; the
        caller fetches, so the scheduler thread never blocks on decode)."""
        lat = self._extract(state, jnp.int32(slot))
        dtype = jnp.bfloat16 if self.cfg.decode_dtype == "bfloat16" else None
        tiling = (self.cfg.vae_tile_latent, self.cfg.vae_tile_overlap) if self.cfg.vae_tiling else None
        return self.pipe.decode_latents(self.pipe.params, lat, dtype=dtype, tiling=tiling)
