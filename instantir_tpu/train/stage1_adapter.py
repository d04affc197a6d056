"""Stage-1 trainer: DCP adapter pretraining (Resampler + IP attention).

Rebuild of ``train_stage1_adapter.py``: train only the image-prompt pathway
(Resampler + to_k_ip/to_v_ip/ln_k_ip/ln_v_ip) on the ε-MSE objective with
the *degraded* image's DINOv2 tokens as condition (``:1097-1237``):

  degrade → DINO embeds (with image-drop → zero-image embeds, ``:1108-1127``)
  → VAE-encode GT → importance-sample t → add noise
  → UNet forward (IP attention, no LoRA, no aggregator, ``:1155-1160``)
  → Σ weighted diffusion losses → update ip params only (``:836-844``).

TPU-native: one jitted train step over (trainable, frozen) param partitions;
DP via batch sharding on the mesh's ``data`` axis (XLA inserts the gradient
all-reduce); the degradation pipeline runs on device ahead of the step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from instantir_tpu.data.degradation import RealESRGANDegradation
from instantir_tpu.losses import DiffusionLossInputs, build_losses
from instantir_tpu.losses.loss_config import LossesConfig, SingleLossConfig
from instantir_tpu.models.dinov2 import preprocess_dinov2
from instantir_tpu.models.vae import scale_latents
from instantir_tpu.schedulers.diffusion import add_noise, importance_sampling_weights, sdxl_schedule
from instantir_tpu.train import common


@dataclasses.dataclass
class Stage1Config:
    output_dir: str = "stage1_out"
    max_train_steps: int = 1000
    train_batch_size: int = 96
    shard_optimizer_state: bool = True  # ZeRO-1 Adam moments over the data axis
    learning_rate: float = 1e-4
    lr_scheduler: str = "cosine"
    lr_warmup_steps: int = 100
    weight_decay: float = 1e-2
    use_8bit_adam: bool = False  # blockwise-int8 Adam moments (bnb AdamW8bit)
    # QLoRA storage mode (common.quantize_frozen_unet): frozen UNet base
    # kernels int8, dequantized at use; the trained ip projections stay fp.
    # ~2.6 GB of HBM back → larger single-chip batches (docs/perf.md r4).
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
    image_drop_rate: float = 0.05
    importance_sampling: bool = False
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


def stage1_trainable_pred(path: Tuple[str, ...]) -> bool:
    joined = "/".join(path)
    if "lora_" in joined:
        return False
    if path[0] == "resampler":
        return True
    return path[0] == "unet" and any(n in joined for n in ("to_k_ip", "to_v_ip", "ln_k_ip", "ln_v_ip"))


def build_stage1_step(
    unet,
    resampler,
    vae,
    image_encoder,
    schedule,
    losses,
    cfg: Stage1Config,
):
    """Returns jitted ``step(trainable, frozen, opt_state, batch, key)``."""

    def loss_fn(trainable, frozen, batch, key):
        params = common.merge_params(trainable, frozen)
        k_t, k_noise, k_drop, k_vae = jax.random.split(key, 4)
        lq, gt = batch["lq"], batch["gt"]  # [-1,1]
        bsz = gt.shape[0]

        # DINOv2 embeds of the degraded image, with per-sample image drop
        pixels = preprocess_dinov2((lq + 1.0) / 2.0)
        tokens_cond = image_encoder.apply(params["image_encoder"], pixels)
        tokens_uncond = jnp.broadcast_to(batch["uncond_tokens"].astype(tokens_cond.dtype), tokens_cond.shape)
        drop = jax.random.uniform(k_drop, (bsz, 1, 1)) < cfg.image_drop_rate
        tokens = jnp.where(drop, tokens_uncond, tokens_cond)
        ip_tokens = resampler.apply(params["resampler"], tokens)

        # GT latents
        z = vae.apply(params["vae"], gt.astype(jnp.float32), rng=k_vae, sample=True, method=vae.encode)
        latents = jax.lax.stop_gradient(scale_latents(vae.config, z))

        # reference semantics (train_stage1_adapter.py:1144-1149): t is sampled
        # UNIFORMLY and the loss is weighted by T·p(t) — do NOT sample from
        # p(t) and divide (that cancels to the uniform objective).
        t = common.sample_timesteps(k_t, bsz, schedule.num_train_timesteps, None)
        noise = jax.random.normal(k_noise, latents.shape)
        noisy = add_noise(schedule, latents, noise, t)

        eps_pred = unet.apply(
            params["unet"],
            noisy,
            t,
            encoder_hidden_states=batch["prompt_embeds"],
            added_text_embeds=batch["pooled_embeds"],
            added_time_ids=batch["time_ids"],
            ip_hidden_states=ip_tokens,
        )

        weights = None
        if cfg.importance_sampling:
            iw = importance_sampling_weights(schedule.num_train_timesteps)
            weights = schedule.num_train_timesteps * jnp.asarray(iw)[t]

        total = 0.0
        metrics = {}
        for loss, w in losses:
            val = loss(DiffusionLossInputs(predicted=eps_pred, target=noise, timesteps=t, weights=weights))
            total = total + w * val
            metrics[type(loss).__name__] = val
        return total, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(trainable, frozen, opt_state, tx, batch, key):
        (loss, metrics), grads = grad_fn(trainable, frozen, batch, key)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return trainable, opt_state, metrics

    return step


class Stage1Trainer:
    """Host loop: data → degradation → jitted step → log/checkpoint."""

    def __init__(
        self,
        unet,
        resampler,
        vae,
        image_encoder,
        params: Dict[str, Any],
        cfg: Stage1Config,
        losses_config: Optional[LossesConfig] = None,
        schedule=None,
        mesh="auto",
    ):
        self.cfg = cfg
        if cfg.quantize_frozen_unet:
            # trained ip projections stay fp (they ARE the stage-1 artifact)
            params = common.quantize_frozen_unet(params, keep_pred=stage1_trainable_pred)
        # Data parallelism is the trainers' own default path (VERDICT r1 #2):
        # params/opt-state replicated, batches sharded on the mesh's ``data``
        # axis, gradient all-reduce inserted by XLA — the TPU-native
        # ``accelerator.prepare`` (train_stage2_aggregator.py:1285-1287).
        self.mesh = common.resolve_mesh(mesh, cfg.train_batch_size)
        self.schedule = schedule or sdxl_schedule()
        losses = build_losses(
            losses_config.diffusion_losses if losses_config else [SingleLossConfig(name="L2Loss")]
        )
        self.unet, self.resampler, self.vae, self.image_encoder = unet, resampler, vae, image_encoder
        self.trainable, self.frozen = common.partition_params(params, stage1_trainable_pred)
        n_train = common.count_params(self.trainable)
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
        raw_step = build_stage1_step(unet, resampler, vae, image_encoder, self.schedule, losses, cfg)
        def _wrapped(tr, fr, st, batch, key):
            new_tr, new_st, metrics = raw_step(tr, fr, st, self.tx, batch, key)
            return common.replicate_constraint(new_tr, self.mesh), new_st, metrics

        self._step = jax.jit(_wrapped, donate_argnums=(0, 2))
        self.degradation = RealESRGANDegradation(resolution=cfg.resolution)
        self.ckpt = common.CheckpointManager(cfg.output_dir, cfg.checkpoints_total_limit, async_save=cfg.async_checkpointing)
        self.tracker = common.Tracker(os.path.join(cfg.output_dir, "logs") if cfg.output_dir else None, backend=cfg.report_to)
        self.global_step = 0
        print(f"[stage1] trainable params: {n_train/1e6:.2f}M")

    def resume(self):
        if self.cfg.resume_from_checkpoint != "latest":
            return
        template = {"trainable": self.trainable, "opt_state": self.opt_state, "step": 0}
        step, state = self.ckpt.resume_latest(template)
        if state is not None:
            self.trainable = common.replicate_or_keep(state["trainable"], self.mesh)
            self.opt_state = common.shard_opt_or_keep(state["opt_state"], self.mesh, self.cfg.shard_optimizer_state)
            self.global_step = int(state["step"])
            print(f"[stage1] resumed from checkpoint-{step}")

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

    def prepare_batch(self, batch: Dict[str, np.ndarray], cond: Dict[str, jnp.ndarray], key, step=None) -> Dict:
        # shard inputs along the batch axis BEFORE the on-device degradation,
        # so the degradation itself runs data-parallel
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

    def train_step(self, batch: Dict, key) -> Dict[str, float]:
        self.trainable, self.opt_state, metrics = self._step(self.trainable, self.frozen, self.opt_state, batch, key)
        self.global_step += 1
        return metrics

    def run(self, data_iter, cond: Dict[str, jnp.ndarray], val_batch=None):
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
            if cfg.sanity_check:
                print("[stage1] sanity check: one batch prepared", {k: v.shape for k, v in batch.items()})
                metrics = self.train_step(batch, k_step)
                print("[stage1] sanity check PASS", {k: float(v) for k, v in metrics.items()})
                return
            metrics = self.train_step(batch, k_step)
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
                from instantir_tpu.train.validation import validate_stage1

                validate_stage1(self, val_batch['lq'], val_batch['gt'], cond, self.tracker, self.global_step)
            if self.global_step % cfg.checkpointing_steps == 0:
                self.save_checkpoint()
            if common.preemption_requested():
                print(f"[stage1] preemption: checkpointing at step {self.global_step} and exiting")
                break
        self.save_checkpoint()
        self.ckpt.wait()

    def save_checkpoint(self):
        if self.ckpt.latest_step() == self.global_step:
            return  # already saved this step (in-loop save meeting the final/preemption save)
        self.ckpt.save(
            self.global_step,
            {"trainable": self.trainable, "opt_state": self.opt_state, "step": self.global_step},
        )

    def export_adapter(self, path: str):
        """Write the reference-format ``adapter_ckpt.pt`` payload
        ({image_proj, ip_adapter}) — ``train_stage1_adapter.py:753-785``."""
        import torch

        from instantir_tpu.convert.flax_to_torch import export_ip_adapter, export_resampler

        params = common.merge_params(self.trainable, self.frozen)
        # the reference loads image_proj with strict=True
        # (module/ip_adapter/utils.py:61) — LoRA leaves must not leak in
        image_proj = {
            k: torch.from_numpy(np.asarray(v))
            for k, v in export_resampler(params["resampler"]).items()
            if "lora_" not in k
        }
        payload = {
            "image_proj": image_proj,
            "ip_adapter": {
                k: torch.from_numpy(np.asarray(v))
                for k, v in export_ip_adapter(params["unet"], self.unet.config).items()
                if "lora_" not in k
            },
        }
        torch.save(payload, path)
