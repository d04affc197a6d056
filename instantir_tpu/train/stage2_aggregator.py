"""Stage-2 trainer: Aggregator training with the frozen previewer.

Rebuild of ``train_stage2_aggregator.py:1451-1676``. Per step:

  1. drop conditions: one uniform per sample partitions into image-drop /
     text-drop / both (``:1461-1467``);
  2. degrade → DINO embeds → VAE-encode GT and LQ (``:1469-1484``);
  3. t ~ U[0,T); noisy GT (``:1496-1502``);
  4. previewer (no grad, **EMA adapter** + LoRA ON): predicts ε on the noisy
     GT with optional train-time CFG w∼U[1,CFG_scale] (``:1505-1552``) →
     LCM single-step preview (``:1553-1558``);
  5. aggregator(LQ latent, t, preview) → residuals (grad!, ``:1571-1579``);
  6. main UNet (LoRA OFF, live adapter) on noisy GT with residuals → ε̂
     (``:1583-1593``); ε-MSE with importance weights (``:1595-1607``);
  7. update aggregator (+ adapter if ``optimize_adapter``); EMA-update the
     adapter copy every ``ema_update_steps`` (``:1625-1628``).
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
from instantir_tpu.schedulers.diffusion import add_noise, importance_sampling_weights, lcm_single_step, sdxl_schedule
from instantir_tpu.train import common
from instantir_tpu.train.stage1_adapter import stage1_trainable_pred


@dataclasses.dataclass
class Stage2Config:
    output_dir: str = "stage2_out"
    max_train_steps: int = 1000
    train_batch_size: int = 6
    # ZeRO-1: shard fp32 Adam moments over the mesh data axis (parameters
    # stay replicated; XLA all-gathers the deltas). Stage-2 trains the full
    # ~1B-param aggregator — replicated moments alone are ~8 GB/chip.
    shard_optimizer_state: bool = True
    learning_rate: float = 1e-4
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 100
    weight_decay: float = 1e-2
    use_8bit_adam: bool = False  # blockwise-int8 Adam moments (bnb AdamW8bit)
    # QLoRA storage mode (common.quantize_frozen_unet): frozen UNet base
    # kernels stored int8, dequantized at use — ~2.6 GB of HBM back; with
    # use_8bit_adam this is what fits SDXL-scale stage-2 on ONE 16 GB v5e
    # (exact-bf16 OOMs by ~0.5 GB at 512² batch 1 — docs/perf.md round 4).
    # The ip projections stay fp (they are EMA-tracked / optionally trained).
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
    image_drop_rate: float = 0.0
    text_drop_rate: float = 0.85
    cond_drop_rate: float = 0.15
    cfg_scale: float = 1.0  # train-time previewer CFG (--CFG_scale)
    lora_alpha: float = 1.0
    optimize_adapter: bool = False
    use_ema_adapter: bool = True
    ema_decay: float = 0.999
    ema_update_steps: int = 1
    importance_sampling: bool = False
    # Working rebuild of the reference --aggregator_adapter (intended
    # semantics; the in-tree path is broken — see models/aggregator.py):
    # the aggregator gets its own Resampler over the image-encoder tokens
    # and a TA-IP branch on every attn1, both trained with the aggregator.
    # The projection happens BEFORE the aggregator call (the ordering fix
    # for train_stage2_aggregator.py:1581).
    aggregator_adapter: bool = False
    adapter_tokens: int = 64  # reference --adapter_tokens
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


def stage2_trainable_pred(cfg: Stage2Config):
    def pred(path: Tuple[str, ...]) -> bool:
        if path[0] == "aggregator":
            return True
        if path[0] == "agg_resampler":  # aggregator_adapter projector trains with the aggregator
            return True
        if cfg.optimize_adapter:
            return stage1_trainable_pred(path)
        return False

    return pred


ADAPTER_EMA_PRED = lambda path: stage1_trainable_pred(path)  # noqa: E731


def enable_aggregator_adapter(
    aggregator,
    params: Dict[str, Any],
    encoder_hidden_size: int,
    cfg: Stage2Config,
    image_proj_sd: Optional[Dict[str, np.ndarray]] = None,
    seed: int = 0,
):
    """Build the aggregator_adapter surfaces: returns
    ``(aggregator', params', agg_resampler)``.

    * ``aggregator'`` — the module rebuilt with ``aggregator_adapter=True``
      (each attn1 grows a TA-IP branch: ``to_k_ip``/``to_v_ip`` +
      AdaLN ``ln_k_ip``/``ln_v_ip``);
    * ``params'`` — the aggregator tree extended with those fresh leaves
      (existing weights untouched) plus ``params["agg_resampler"]``: the
      aggregator's own Resampler in the reference's configuration
      (``train_stage2_aggregator.py:922-929``: dim 1280, depth 4, head_dim
      64, heads 20, num_queries=adapter_tokens, embedding_dim = image
      encoder hidden size, output_dim = cross_attention_dim), optionally
      initialized from a pretrained adapter's ``image_proj`` state dict
      (``init_adapter_in_unet``'s load, ``module/ip_adapter/utils.py:60-61``).

    Deviation from the reference's (broken) intent, documented: the
    reference seeds ip projections from the host attention's text to_k/to_v
    (``attention_processor.py:1391-1397``) — on attn2, where input dims
    match. On attn1 the query_dim-sized to_k cannot seed the
    cross_attention_dim-sized to_k_ip, so the ip projections start fresh
    (lecun); AdaLN linears start at identity (zero modulation) either way.
    """
    import dataclasses as _dc

    from instantir_tpu.models.resampler import Resampler, ResamplerConfig
    from instantir_tpu.pipeline.load import fill_missing_leaves

    ucfg = aggregator.config
    agg = aggregator.clone(aggregator_adapter=True)
    lat = ucfg.sample_size
    pooled_dim = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    dt = agg.dtype
    template = jax.eval_shape(
        lambda k: agg.init(
            k, jnp.zeros((1, lat, lat, ucfg.in_channels), dt), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, lat, lat, ucfg.in_channels), dt),
            added_text_embeds=jnp.zeros((1, pooled_dim), dt),
            added_time_ids=jnp.zeros((1, 6), dt),
            ip_hidden_states=jnp.zeros((1, cfg.adapter_tokens, ucfg.cross_attention_dim), dt),
        ),
        jax.random.PRNGKey(0),
    )
    host_rng = np.random.default_rng(seed)
    agg_tree = fill_missing_leaves(jax.tree_util.tree_map(lambda x: x, params["aggregator"]), template, host_rng)

    rcfg = ResamplerConfig(
        num_queries=cfg.adapter_tokens,
        embedding_dim=encoder_hidden_size,
        output_dim=ucfg.cross_attention_dim,
    )
    agg_resampler = Resampler(rcfg, dtype=dt, param_dtype=agg.param_dtype)
    if image_proj_sd is not None:
        from instantir_tpu.convert.torch_to_flax import convert_resampler

        res_tree = convert_resampler(image_proj_sd, rcfg)
    else:
        res_template = jax.eval_shape(
            lambda k: agg_resampler.init(k, jnp.zeros((1, 5, encoder_hidden_size), dt)),
            jax.random.PRNGKey(0),
        )
        res_tree = fill_missing_leaves({"params": {}}, res_template, host_rng)
    new_params = {**params, "aggregator": agg_tree, "agg_resampler": res_tree}
    return agg, new_params, agg_resampler


def build_stage2_step(unet, aggregator, resampler, vae, image_encoder, schedule, losses,
                      cfg: Stage2Config, agg_resampler=None):
    alpha = cfg.lora_alpha

    def loss_fn(trainable, frozen, ema_adapter, batch, key):
        params = common.merge_params(trainable, frozen)
        # previewer uses the EMA adapter subtree (functional swap)
        if ema_adapter is not None:
            preview_params = common.merge_params(ema_adapter, {
                k: v for k, v in {**trainable, **frozen}.items() if k not in ema_adapter
            })
        else:
            preview_params = params

        k_t, k_noise, k_drop, k_w, k_vae1, k_vae2 = jax.random.split(key, 6)
        lq, gt = batch["lq"], batch["gt"]
        bsz = gt.shape[0]

        # condition drops (single uniform partition, reference :1461-1467)
        r = jax.random.uniform(k_drop, (bsz,))
        drop_image = r < cfg.image_drop_rate
        drop_text = (r >= cfg.image_drop_rate) & (r < cfg.image_drop_rate + cfg.text_drop_rate)
        drop_both = (r >= cfg.image_drop_rate + cfg.text_drop_rate) & (
            r < cfg.image_drop_rate + cfg.text_drop_rate + cfg.cond_drop_rate
        )
        drop_image = drop_image | drop_both
        drop_text = drop_text | drop_both

        pixels = preprocess_dinov2((lq + 1.0) / 2.0)
        tokens_cond = image_encoder.apply(params["image_encoder"], pixels)
        tokens_uncond = jnp.broadcast_to(batch["uncond_tokens"].astype(tokens_cond.dtype), tokens_cond.shape)
        tokens = jnp.where(drop_image[:, None, None], tokens_uncond, tokens_cond)

        text = jnp.where(drop_text[:, None, None], batch["uncond_prompt_embeds"], batch["prompt_embeds"])
        pooled = jnp.where(drop_text[:, None], batch["uncond_pooled_embeds"], batch["pooled_embeds"])
        cond = {"pooled_embeds": pooled, "time_ids": batch["time_ids"]}

        gt_latent = scale_latents(
            vae.config, vae.apply(params["vae"], gt.astype(jnp.float32), rng=k_vae1, sample=True, method=vae.encode)
        )
        lq_latent = scale_latents(
            vae.config, vae.apply(params["vae"], lq.astype(jnp.float32), rng=k_vae2, sample=True, method=vae.encode)
        )
        gt_latent = jax.lax.stop_gradient(gt_latent)
        lq_latent = jax.lax.stop_gradient(lq_latent)

        # uniform t; importance sampling enters as a T·p(t) loss weight
        # (reference train_stage2_aggregator.py:1498,1503)
        t = common.sample_timesteps(k_t, bsz, schedule.num_train_timesteps, None)
        noise = jax.random.normal(k_noise, gt_latent.shape)
        noisy = add_noise(schedule, gt_latent, noise, t)

        # previewer pass (no grad, EMA adapter, LoRA on)
        def previewer():
            ip = resampler.apply(preview_params["resampler"], tokens, lora_scale=alpha)

            def fwd(z, text_in, ip_in):
                return unet.apply(
                    preview_params["unet"],
                    z,
                    t,
                    encoder_hidden_states=text_in,
                    added_text_embeds=cond["pooled_embeds"],
                    added_time_ids=cond["time_ids"],
                    ip_hidden_states=ip_in,
                    lora_scale=alpha,
                )

            eps = fwd(noisy, text, ip)
            if cfg.cfg_scale > 1.0:
                ip_u = resampler.apply(preview_params["resampler"], tokens_uncond, lora_scale=alpha)
                eps_u = fwd(noisy, batch["uncond_prompt_embeds"], ip_u)
                w = 1.0 + jax.random.uniform(k_w, (bsz, 1, 1, 1)) * (cfg.cfg_scale - 1.0)
                eps = eps_u + w * (eps - eps_u)
            return lcm_single_step(schedule, eps, t, noisy)

        preview_latents = jax.lax.stop_gradient(previewer())
        preview_err = jnp.mean((preview_latents - gt_latent) ** 2)

        # aggregator (grad); with aggregator_adapter the image tokens are
        # projected through the aggregator's OWN Resampler before the call —
        # the ordering fix for the reference's post-call image_embeds insert
        # (train_stage2_aggregator.py:1581) — and consumed by the TA-IP
        # branch on each attn1. Image-drop applies to these tokens too
        # (`tokens` already carries the uncond substitution).
        agg_kwargs = {}
        if agg_resampler is not None:
            agg_kwargs["ip_hidden_states"] = agg_resampler.apply(params["agg_resampler"], tokens)
        down_res, mid_res = aggregator.apply(
            params["aggregator"],
            lq_latent,
            t,
            controlnet_cond=preview_latents,
            added_text_embeds=cond["pooled_embeds"],
            added_time_ids=cond["time_ids"],
            **agg_kwargs,
        )

        # main UNet (LoRA off, live adapter)
        ip_base = resampler.apply(params["resampler"], tokens, lora_scale=0.0)
        eps_pred = unet.apply(
            params["unet"],
            noisy,
            t,
            encoder_hidden_states=text,
            added_text_embeds=cond["pooled_embeds"],
            added_time_ids=cond["time_ids"],
            ip_hidden_states=ip_base,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res,
            lora_scale=0.0,
        )

        weights = None
        if cfg.importance_sampling:
            iw = importance_sampling_weights(schedule.num_train_timesteps)
            weights = schedule.num_train_timesteps * jnp.asarray(iw)[t]

        total = 0.0
        metrics = {"preview_error_latent": preview_err}
        for loss, w in losses:
            val = loss(DiffusionLossInputs(predicted=eps_pred, target=noise, timesteps=t, weights=weights))
            total = total + w * val
            metrics[type(loss).__name__] = val
        return total, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(trainable, frozen, ema_adapter, opt_state, tx, batch, key):
        (loss, metrics), grads = grad_fn(trainable, frozen, ema_adapter, batch, key)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return trainable, opt_state, metrics

    return step


class Stage2Trainer:
    def __init__(
        self,
        unet,
        aggregator,
        resampler,
        vae,
        image_encoder,
        params: Dict[str, Any],
        cfg: Stage2Config,
        losses_config: Optional[LossesConfig] = None,
        schedule=None,
        mesh="auto",
        agg_resampler=None,
    ):
        self.cfg = cfg
        if cfg.aggregator_adapter:
            if agg_resampler is None or "agg_resampler" not in params:
                raise ValueError(
                    "aggregator_adapter=True needs the aggregator's Resampler module and its "
                    "params['agg_resampler'] — use enable_aggregator_adapter(...) to build both"
                )
            if not getattr(aggregator, "aggregator_adapter", False):
                raise ValueError("aggregator_adapter=True but the Aggregator module was built "
                                 "without aggregator_adapter=True")
        self.agg_resampler = agg_resampler if cfg.aggregator_adapter else None
        if cfg.quantize_frozen_unet:
            # adapter (ip) kernels stay fp: they feed the EMA partition and
            # may train under --optimize_adapter
            params = common.quantize_frozen_unet(params, keep_pred=stage1_trainable_pred)
        self.mesh = common.resolve_mesh(mesh, cfg.train_batch_size)
        self.schedule = schedule or sdxl_schedule()
        losses = build_losses(
            losses_config.diffusion_losses if losses_config else [SingleLossConfig(name="L2Loss")]
        )
        self.unet, self.aggregator, self.resampler = unet, aggregator, resampler
        self.vae, self.image_encoder = vae, image_encoder
        self.trainable, self.frozen = common.partition_params(params, stage2_trainable_pred(cfg))
        # EMA copy of the adapter subtree (resampler + ip attn params)
        self.ema_adapter = None
        if cfg.use_ema_adapter:
            adapter, _ = common.partition_params(params, ADAPTER_EMA_PRED)
            self.ema_adapter = jax.tree_util.tree_map(lambda x: x, adapter)
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
        self.ema_adapter = common.replicate_or_keep(self.ema_adapter, self.mesh)
        # donated trees need leaf-unique buffers (constant-cache aliasing)
        self.trainable = common.unique_buffers(self.trainable)
        self.opt_state = common.unique_buffers(self.opt_state)
        raw = build_stage2_step(unet, aggregator, resampler, vae, image_encoder, self.schedule,
                                losses, cfg, agg_resampler=self.agg_resampler)

        def _wrapped(tr, fr, ema, st, b, k):
            new_tr, new_st, metrics = raw(tr, fr, ema, st, self.tx, b, k)
            return common.replicate_constraint(new_tr, self.mesh), new_st, metrics

        # donate the old trainable/opt-state buffers (reassigned every step)
        self._step = jax.jit(_wrapped, donate_argnums=(0, 3))
        self.degradation = RealESRGANDegradation(resolution=cfg.resolution)
        self.ckpt = common.CheckpointManager(cfg.output_dir, cfg.checkpoints_total_limit, async_save=cfg.async_checkpointing)
        self.tracker = common.Tracker(os.path.join(cfg.output_dir, "logs") if cfg.output_dir else None, backend=cfg.report_to)
        self.global_step = 0
        print(f"[stage2] trainable params: {common.count_params(self.trainable)/1e6:.2f}M")

    def _live_adapter(self):
        return common.partition_params(common.merge_params(self.trainable, self.frozen), ADAPTER_EMA_PRED)[0]

    def resume(self):
        if self.cfg.resume_from_checkpoint != "latest":
            return
        template = {"trainable": self.trainable, "opt_state": self.opt_state, "step": 0}
        if self.ema_adapter is not None:
            template["ema_adapter"] = self.ema_adapter
        step, state = self.ckpt.resume_latest(template)
        if state is not None:
            self.trainable = common.replicate_or_keep(state["trainable"], self.mesh)
            self.opt_state = common.shard_opt_or_keep(state["opt_state"], self.mesh, self.cfg.shard_optimizer_state)
            self.global_step = int(state["step"])
            self.ema_adapter = common.replicate_or_keep(state.get("ema_adapter", self.ema_adapter), self.mesh)
            print(f"[stage2] resumed from checkpoint-{step}")

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
        self.trainable, self.opt_state, metrics = self._step(
            self.trainable, self.frozen, self.ema_adapter, self.opt_state, batch, key
        )
        self.global_step += 1
        if self.ema_adapter is not None and self.cfg.optimize_adapter and (
            self.global_step % self.cfg.ema_update_steps == 0
        ):
            self.ema_adapter = common.ema_update(self.ema_adapter, self._live_adapter(), self.cfg.ema_decay)
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
                print("[stage2] sanity check PASS", {k: float(v) for k, v in metrics.items()})
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
                from instantir_tpu.train.validation import validate_stage2

                validate_stage2(self, val_batch['lq'], val_batch['gt'], cond, self.tracker, self.global_step)
            if self.global_step % cfg.checkpointing_steps == 0:
                self.save_checkpoint()
            if common.preemption_requested():
                print(f"[stage2] preemption: checkpointing at step {self.global_step} and exiting")
                break
        self.save_checkpoint()
        self.ckpt.wait()

    def save_checkpoint(self):
        if self.ckpt.latest_step() == self.global_step:
            return  # already saved this step (in-loop save meeting the final/preemption save)
        state = {"trainable": self.trainable, "opt_state": self.opt_state, "step": self.global_step}
        if self.ema_adapter is not None:
            state["ema_adapter"] = self.ema_adapter
        self.ckpt.save(self.global_step, state)

    def export_aggregator(self, path: str):
        """Reference-format ``aggregator_ckpt.pt`` (``train_stage2_aggregator.py:1023-1043``)."""
        import torch

        from instantir_tpu.convert.flax_to_torch import export_aggregator

        params = common.merge_params(self.trainable, self.frozen)
        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in export_aggregator(params["aggregator"]).items()}
        torch.save(sd, path)
