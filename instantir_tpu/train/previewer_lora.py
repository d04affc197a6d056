"""Previewer trainer: one-step LCM-LoRA distillation.

Rebuild of ``train_previewer_lora.py:1360-1681``: distill the SDXL+adapter
teacher into a previewer LoRA that denoises in one step. Per step:

  1. sample solver index i; start_t = ddim_timesteps[i]; t = start_t − T/50
     (clamped ≥ 0, ``:1416-1421``);
  2. student (LoRA ON): ε̂ at start_t with *uncond text* + cond image embeds
     → model_pred = c_skip·z + c_out·x̂0 (``:1450-1465``);
  3. teacher (LoRA OFF, no grad): cond + uncond passes, LCM-style CFG
     ``cond + w·(cond − uncond)`` with w∼U[w_min,w_max] (``:1486-1546``),
     DDIM-step to x_prev (``:1550``);
  4. target (LoRA ON, no grad — same network, no EMA): at t on x_prev →
     target = c_skip·x_prev + c_out·x̂0 (``:1557-1582``);
  5. Huber(model_pred, target) (``config_files/losses.yaml`` huber_c=1e-3);
     update LoRA params only (incl. resampler LoRA).

Latents are VAE-encoded **GT** images; the condition is the **degraded**
image's DINOv2 tokens, so the distilled previewer restores while denoising.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from instantir_tpu.data.degradation import RealESRGANDegradation
from instantir_tpu.losses import DiffusionLossInputs, build_losses
from instantir_tpu.losses.loss_config import LossesConfig, SingleLossConfig
from instantir_tpu.models.dinov2 import preprocess_dinov2
from instantir_tpu.models.vae import scale_latents
from instantir_tpu.schedulers.diffusion import (
    add_noise,
    ddim_solver_timesteps,
    lcm_boundary_scalings,
    pred_eps_from_x0,
    pred_x0_from_eps,
    sdxl_schedule,
)
from instantir_tpu.train import common


@dataclasses.dataclass
class PreviewerConfig:
    output_dir: str = "previewer_out"
    max_train_steps: int = 1000
    train_batch_size: int = 32
    shard_optimizer_state: bool = True  # ZeRO-1 Adam moments over the data axis
    learning_rate: float = 1e-4
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 100
    weight_decay: float = 1e-2
    use_8bit_adam: bool = False  # blockwise-int8 Adam moments (bnb AdamW8bit)
    # QLoRA storage mode: frozen base kernels int8, LoRA branches fp — the
    # literal QLoRA configuration (LoRA distillation over a quantized base).
    quantize_frozen_unet: bool = False
    max_grad_norm: float = 1.0
    # host-pipelined batch preparation: a worker thread runs next(data)+
    # prepare_batch N steps ahead of the train loop, hiding the host-side
    # batch cost (loader + host->device upload) behind device compute.
    # Default 2 (round 5): measured 1.65x run-loop speedup on stage-2 with
    # prepare fully hidden (docs/perf.md round 4), and the produced
    # (recipe, key) sequence is bitwise-identical to the sequential loop
    # (tests/test_prefetch.py). 0 = sequential.
    prefetch_batches: int = 2
    gradient_accumulation_steps: int = 1
    resolution: int = 512
    jit_degradation: bool = True  # single-program traced degradation (common.run_degradation)
    num_ddim_timesteps: int = 50
    w_min: float = 3.0
    w_max: float = 15.0
    lora_alpha: float = 1.0
    image_drop_rate: float = 0.05
    checkpointing_steps: int = 500
    checkpoints_total_limit: Optional[int] = 3
    logging_steps: int = 10
    seed: int = 42
    sanity_check: bool = False
    validation_steps: int = 0  # 0 disables
    resume_from_checkpoint: Optional[str] = "latest"
    handle_preemption: bool = False  # SIGTERM -> checkpoint + clean exit (TPU spot/maintenance)
    async_checkpointing: bool = False  # overlap orbax writes with the next train steps
    report_to: str = "tensorboard"  # tracker backend: tensorboard | wandb | all (reference --report_to)


def lora_trainable_pred(path: Tuple[str, ...]) -> bool:
    return any(p in ("lora_a", "lora_b") for p in path)


def build_previewer_step(unet, resampler, vae, image_encoder, schedule, losses, cfg: PreviewerConfig):
    from instantir_tpu.losses.losses import DINOLoss, LCMVisualization
    from instantir_tpu.models.vae import unscale_latents

    solver_ts = jnp.asarray(ddim_solver_timesteps(schedule.num_train_timesteps, cfg.num_ddim_timesteps))
    topk = schedule.num_train_timesteps // cfg.num_ddim_timesteps
    alpha = cfg.lora_alpha
    # optional image-space branch (reference train_previewer_lora.py:1595-1623):
    # any needs_images loss (DINO/LPIPS/DreamSIM) gets pred/target decoded
    # through the VAE
    has_image_loss = any(getattr(l, "needs_images", False) for l, _ in losses)
    has_vis = any(isinstance(l, LCMVisualization) for l, _ in losses)

    def unet_fwd(params, z, t, text, cond, ip, lora):
        return unet.apply(
            params["unet"],
            z,
            t,
            encoder_hidden_states=text,
            added_text_embeds=cond["pooled_embeds"],
            added_time_ids=cond["time_ids"],
            ip_hidden_states=ip,
            lora_scale=lora,
        )

    def loss_fn(trainable, frozen, batch, key, dino_center):
        params = common.merge_params(trainable, frozen)
        k_i, k_noise, k_w, k_drop, k_vae = jax.random.split(key, 5)
        lq, gt = batch["lq"], batch["gt"]
        bsz = gt.shape[0]
        cond = batch

        # conditions
        pixels = preprocess_dinov2((lq + 1.0) / 2.0)
        tokens_cond = image_encoder.apply(params["image_encoder"], pixels)
        tokens_uncond = jnp.broadcast_to(batch["uncond_tokens"].astype(tokens_cond.dtype), tokens_cond.shape)
        drop = jax.random.uniform(k_drop, (bsz, 1, 1)) < cfg.image_drop_rate
        tokens = jnp.where(drop, tokens_uncond, tokens_cond)
        ip_lora = resampler.apply(params["resampler"], tokens, lora_scale=alpha)
        ip_base = jax.lax.stop_gradient(resampler.apply(params["resampler"], tokens, lora_scale=0.0))
        ip_uncond_base = jax.lax.stop_gradient(
            resampler.apply(params["resampler"], tokens_uncond, lora_scale=0.0)
        )

        z0 = vae.apply(params["vae"], gt.astype(jnp.float32), rng=k_vae, sample=True, method=vae.encode)
        latents = jax.lax.stop_gradient(scale_latents(vae.config, z0))

        # solver timesteps
        index = jax.random.randint(k_i, (bsz,), 0, cfg.num_ddim_timesteps)
        start_t = solver_ts[index]
        t = jnp.maximum(start_t - topk, 0)
        c_skip_s, c_out_s = lcm_boundary_scalings(start_t, schedule.timestep_scaling)
        c_skip, c_out = lcm_boundary_scalings(t, schedule.timestep_scaling)

        def bcast(x):
            return x.reshape(-1, 1, 1, 1).astype(latents.dtype)

        noise = jax.random.normal(k_noise, latents.shape)
        noisy = add_noise(schedule, latents, noise, start_t)
        w = cfg.w_min + (cfg.w_max - cfg.w_min) * jax.random.uniform(k_w, (bsz, 1, 1, 1))

        text, uncond_text = cond["prompt_embeds"], cond["uncond_prompt_embeds"]

        # student (LoRA on, uncond text + cond image)
        eps_student = unet_fwd(params, noisy, start_t, uncond_text, cond, ip_lora, alpha)
        x0_student = pred_x0_from_eps(schedule, noisy, eps_student, start_t)
        model_pred = bcast(c_skip_s) * noisy + bcast(c_out_s) * x0_student

        # teacher (LoRA off, no grad): LCM-style CFG + DDIM step
        def teacher():
            eps_c = unet_fwd(params, noisy, start_t, text, cond, ip_base, 0.0)
            eps_u = unet_fwd(params, noisy, start_t, uncond_text, cond, ip_uncond_base, 0.0)
            x0_c = pred_x0_from_eps(schedule, noisy, eps_c, start_t)
            x0_u = pred_x0_from_eps(schedule, noisy, eps_u, start_t)
            x0 = x0_c + w * (x0_c - x0_u)
            eps = eps_c + w * (eps_c - eps_u)
            # DDIM to prev solver point: index-1; at index 0 the reference's
            # DDIMSolver uses alphas_cumprod[0] (NOT alpha=1 —
            # train_previewer_lora.py:201-203), keeping the eps term alive.
            prev_t = jnp.where(index > 0, solver_ts[jnp.maximum(index - 1, 0)], 0)
            abar_prev = jnp.asarray(schedule.alphas_cumprod)[prev_t].reshape(-1, 1, 1, 1)
            return jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1.0 - abar_prev) * eps

        x_prev = jax.lax.stop_gradient(teacher())

        # target (LoRA on, no grad, same network)
        def target_fn():
            eps_t = unet_fwd(params, x_prev, t, uncond_text, cond, ip_lora, alpha)
            x0_t = pred_x0_from_eps(schedule, x_prev, eps_t, t)
            return bcast(c_skip) * x_prev + bcast(c_out) * x0_t

        target = jax.lax.stop_gradient(target_fn())

        # optional image-space inputs: decode both predictions through the
        # VAE (target under stop_gradient; pred decode is differentiated like
        # the reference's pixel_pred, rematerialized to bound HBM)
        pred_image = target_image = None
        feature_fn = None
        if has_image_loss:
            def decode(z):
                return vae.apply(
                    params["vae"], unscale_latents(vae.config, z.astype(jnp.float32)), method=vae.decode
                )

            target_image = jax.lax.stop_gradient(decode(target))
            pred_image = jax.checkpoint(decode)(model_pred)

            def feature_fn(img):
                return image_encoder.apply(params["image_encoder"], preprocess_dinov2((img + 1.0) / 2.0))

        total = 0.0
        metrics = {}
        new_center = dino_center
        for loss, wt in losses:
            if isinstance(loss, DINOLoss):
                val, new_center = loss.apply_with_center(
                    DiffusionLossInputs(
                        predicted=model_pred, target=target, timesteps=start_t,
                        pred_image=pred_image, target_image=target_image,
                    ),
                    feature_fn,
                    dino_center,
                )
            else:
                val = loss(DiffusionLossInputs(
                    predicted=model_pred, target=target, timesteps=start_t,
                    pred_image=pred_image, target_image=target_image,
                ))
            total = total + wt * val
            metrics[type(loss).__name__] = val
        if has_vis:
            # [encoder input | decoder input | LCM prediction] strip, logged
            # host-side every visualize_every_k steps (reference
            # losses/losses.py:115-122)
            metrics["_vis_strip"] = jnp.concatenate(
                [lq, gt, pred_image.astype(lq.dtype)], axis=2
            )
        return total, (metrics, new_center)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(trainable, frozen, opt_state, tx, batch, key, dino_center):
        (loss, (metrics, new_center)), grads = grad_fn(trainable, frozen, batch, key, dino_center)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return trainable, opt_state, metrics, new_center

    return step


class PreviewerTrainer:
    def __init__(
        self,
        unet,
        resampler,
        vae,
        image_encoder,
        params: Dict[str, Any],
        cfg: PreviewerConfig,
        losses_config: Optional[LossesConfig] = None,
        schedule=None,
        mesh="auto",
    ):
        self.cfg = cfg
        if cfg.quantize_frozen_unet:
            # every base kernel is frozen here (only "lora_" paths train)
            params = common.quantize_frozen_unet(params)
        self.mesh = common.resolve_mesh(mesh, cfg.train_batch_size)
        self.schedule = schedule or sdxl_schedule()
        losses = build_losses(
            losses_config.lcm_losses
            if losses_config and losses_config.lcm_losses
            else [SingleLossConfig(name="HuberLoss", init_params={"huber_c": 0.001})]
        )
        self.unet, self.resampler, self.vae, self.image_encoder = unet, resampler, vae, image_encoder
        self.trainable, self.frozen = common.partition_params(params, lora_trainable_pred)
        if not self.trainable:
            raise ValueError("no LoRA params found — build the UNet/Resampler with lora_rank > 0")
        self.tx = common.make_adamw(
            common.lr_schedule(cfg.lr_scheduler, cfg.learning_rate, cfg.lr_warmup_steps, cfg.max_train_steps),
            weight_decay=cfg.weight_decay,
            use_8bit=cfg.use_8bit_adam,
            max_grad_norm=cfg.max_grad_norm,
        )
        if cfg.gradient_accumulation_steps > 1:
            # accelerate-style accumulation (reference stage-2 runs ga=2):
            # updates apply every k-th micro-step, zeros otherwise.
            import optax as _optax

            self.tx = _optax.MultiSteps(self.tx, every_k_schedule=cfg.gradient_accumulation_steps)
        self.opt_state = self.tx.init(self.trainable)
        self.trainable = common.replicate_or_keep(self.trainable, self.mesh)
        self.frozen = common.replicate_or_keep(self.frozen, self.mesh)
        self.opt_state = common.shard_opt_or_keep(self.opt_state, self.mesh, cfg.shard_optimizer_state)
        # donated trees need leaf-unique buffers (constant-cache aliasing)
        self.trainable = common.unique_buffers(self.trainable)
        self.opt_state = common.unique_buffers(self.opt_state)
        # running teacher-token center for the optional image-space DINOLoss
        # (reference losses/losses.py:448-462 momentum update)
        from instantir_tpu.losses.losses import DINOLoss, LCMVisualization

        self._dino = next((l for l, _ in losses if isinstance(l, DINOLoss)), None)
        self._vis = next((l for l, _ in losses if isinstance(l, LCMVisualization)), None)
        self.dino_center = common.replicate_or_keep(
            jnp.zeros((image_encoder.config.hidden_size,), jnp.float32), self.mesh
        )
        raw = build_previewer_step(unet, resampler, vae, image_encoder, self.schedule, losses, cfg)
        def _wrapped(tr, fr, st, b, k, c):
            new_tr, new_st, metrics, center = raw(tr, fr, st, self.tx, b, k, c)
            return common.replicate_constraint(new_tr, self.mesh), new_st, metrics, center

        self._step = jax.jit(_wrapped, donate_argnums=(0, 2))
        self.degradation = RealESRGANDegradation(resolution=cfg.resolution)
        self.ckpt = common.CheckpointManager(cfg.output_dir, cfg.checkpoints_total_limit, async_save=cfg.async_checkpointing)
        self.tracker = common.Tracker(os.path.join(cfg.output_dir, "logs") if cfg.output_dir else None, backend=cfg.report_to)
        self.global_step = 0
        print(f"[previewer] trainable LoRA params: {common.count_params(self.trainable)/1e6:.2f}M")

    def resume(self):
        if self.cfg.resume_from_checkpoint != "latest":
            return
        template = {"trainable": self.trainable, "opt_state": self.opt_state, "step": 0}
        step, state = self.ckpt.resume_latest(template)
        if state is not None:
            self.trainable = common.replicate_or_keep(state["trainable"], self.mesh)
            self.opt_state = common.shard_opt_or_keep(state["opt_state"], self.mesh, self.cfg.shard_optimizer_state)
            self.global_step = int(state["step"])
            print(f"[previewer] resumed from checkpoint-{step}")

    def _uncond_image_tokens(self):
        """DINOv2 tokens of the zero (preprocessed) image — constant per
        parameter set (the image encoder is frozen), computed once instead of
        per step (the reference pays this forward every step; the pipeline
        already caches it, pipeline/instantir.py encode_image_embeds)."""
        if getattr(self, "_uncond_tok", None) is None:
            params = common.merge_params(self.trainable, self.frozen)
            fn = jax.jit(
                lambda p: self.image_encoder.apply(p, jnp.zeros((1, 224, 224, 3), jnp.float32))
            )
            self._uncond_tok = fn(params["image_encoder"])
        return self._uncond_tok

    def prepare_batch(self, batch, cond, key, step=None):
        images = common.shard_or_keep(jnp.asarray(batch["images"]), self.mesh)
        kernels = common.shard_or_keep(
            (jnp.asarray(batch["kernel"]), jnp.asarray(batch["kernel2"]), jnp.asarray(batch["sinc_kernel"])),
            self.mesh,
        )
        lq, gt = common.run_degradation(
            self.degradation, key, images, kernels,
            jit_mode=self.cfg.jit_degradation,
            host_rng=np.random.default_rng(
                self.cfg.seed * 7919 + (self.global_step if step is None else step)
            ),
        )
        return {"lq": lq, "gt": gt, "uncond_tokens": self._uncond_image_tokens(),
                **common.shard_or_keep(dict(cond), self.mesh)}

    def train_step(self, batch, key):
        self.trainable, self.opt_state, metrics, new_center = self._step(
            self.trainable, self.frozen, self.opt_state, batch, key, self.dino_center
        )
        if self._dino is not None:
            m = self._dino.center_momentum
            self.dino_center = self.dino_center * m + new_center * (1.0 - m)
        strip = metrics.pop("_vis_strip", None)
        if (
            strip is not None
            and self._vis.visualize_every_k > 0
            and self.global_step % self._vis.visualize_every_k == 0
        ):
            self.tracker.images(
                self.global_step, "TrainVisualization",
                (np.asarray(jnp.asarray(strip, jnp.float32)) + 1.0) / 2.0,
            )
        self.global_step += 1
        return metrics

    def run(self, data_iter, cond, val_batch=None):
        cfg = self.cfg
        self.resume()
        if cfg.handle_preemption:
            common.install_preemption_handler()
        key = jax.random.PRNGKey(cfg.seed)
        # opt-in host pipelining: a worker thread prepares batches ahead
        # (identical RNG/recipe sequence — common.pipelined_batches)
        source = (
            common.pipelined_batches(
                self, data_iter, cond, key, cfg.max_train_steps, cfg.prefetch_batches
            )
            if cfg.prefetch_batches > 0
            else None
        )
        tic = time.time()
        while self.global_step < cfg.max_train_steps:
            if source is not None:
                try:
                    batch, k_step = next(source)
                except StopIteration:
                    break
            else:
                key, k_deg, k_step = jax.random.split(key, 3)
                host_batch = next(data_iter)
                # per-sample captions: a callable cond encodes the batch's
                # caption column each step (reference utils/train_utils.py:190-237)
                batch_cond = cond(host_batch) if callable(cond) else cond
                batch = self.prepare_batch(host_batch, batch_cond, k_deg)
            metrics = self.train_step(batch, k_step)
            if cfg.sanity_check:
                print("[previewer] sanity check PASS", {k: float(v) for k, v in metrics.items()})
                return
            if self.global_step % cfg.logging_steps == 0:
                dt = time.time() - tic
                tic = time.time()
                self.tracker.scalars(
                    self.global_step,
                    {**{k: float(v) for k, v in metrics.items()}, "steps_per_sec": cfg.logging_steps / dt},
                )
            if (
                val_batch is not None
                and self.cfg.validation_steps > 0
                and self.global_step % self.cfg.validation_steps == 0
            ):
                from instantir_tpu.train.validation import validate_previewer

                validate_previewer(self, val_batch['lq'], val_batch['gt'], cond, self.tracker, self.global_step)
            if self.global_step % cfg.checkpointing_steps == 0:
                self.save_checkpoint()
            if common.preemption_requested():
                print(f"[previewer] preemption: checkpointing at step {self.global_step} and exiting")
                break
        self.save_checkpoint()
        self.ckpt.wait()

    def save_checkpoint(self):
        if self.ckpt.latest_step() == self.global_step:
            return  # already saved this step (in-loop save meeting the final/preemption save)
        self.ckpt.save(self.global_step, {"trainable": self.trainable, "opt_state": self.opt_state, "step": self.global_step})

    def export_lora(self, path: str):
        """diffusers-format previewer LoRA (``unet.<path>.lora_A/B.weight``),
        the payload of ``previewer_lora_weights.bin``."""
        import torch

        from instantir_tpu.convert.flax_to_torch import export_unet

        params = common.merge_params(self.trainable, self.frozen)
        sd = export_unet(params["unet"])
        lora_sd = {f"unet.{k}": torch.from_numpy(np.asarray(v)) for k, v in sd.items() if "lora_" in k}
        torch.save(lora_sd, path)
