"""Training entry points — the framework's equivalents of the reference's
``train_stage1_adapter.py`` / ``train_previewer_lora.py`` /
``train_stage2_aggregator.py`` CLIs.

Single-binary design: ``python -m instantir_tpu.cli.train stage1|previewer|stage2 ...``.
Multi-chip data parallelism is the trainers' own default (``mesh="auto"``):
params/opt-state are replicated, each batch is sharded over the ``data`` mesh
axis inside ``prepare_batch``, and XLA all-reduces gradients over ICI; the
dataset additionally shards per host process. No accelerate-style launcher is
needed.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="InstantIR-TPU trainers")
    p.add_argument("stage", choices=["stage1", "previewer", "stage2"])
    p.add_argument("--sdxl_path", type=str, default=None, help="diffusers SDXL dir (omit for random init)")
    p.add_argument("--vision_encoder_path", type=str, default=None)
    p.add_argument("--adapter_path", type=str, default=None, help="adapter.pt from stage 1")
    p.add_argument("--previewer_lora_path", type=str, default=None)
    p.add_argument("--data_config", type=str, default="config_files/IR_dataset.yaml")
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--losses_config", type=str, default="config_files/losses.yaml")
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--max_train_steps", type=int, default=10000)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", type=str, default="cosine")
    p.add_argument("--lr_warmup_steps", type=int, default=100)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--sanity_check", action="store_true")
    p.add_argument("--resume_from_checkpoint", type=str, default="latest")
    p.add_argument("--prompt", type=str, default="", help="training caption (default empty)")
    # stage-specific knobs
    p.add_argument("--image_drop_rate", type=float, default=0.05)
    p.add_argument("--text_drop_rate", type=float, default=0.85)
    p.add_argument("--cond_drop_rate", type=float, default=0.15)
    p.add_argument("--CFG_scale", type=float, default=1.0)
    p.add_argument("--use_ema_adapter", action="store_true")
    p.add_argument("--optimize_adapter", action="store_true")
    p.add_argument(
        "--aggregator_adapter", action="store_true",
        help="stage2: give the aggregator its own image-prompt adapter (a "
        "Resampler over the encoder tokens + a TA-IP branch on each attn1) — "
        "working rebuild of the reference flag whose in-tree path is broken "
        "(see models/aggregator.py)",
    )
    p.add_argument("--adapter_tokens", type=int, default=64)
    p.add_argument("--importance_sampling", action="store_true")
    p.add_argument("--num_ddim_timesteps", type=int, default=50)
    p.add_argument("--w_min", type=float, default=3.0)
    p.add_argument("--w_max", type=float, default=15.0)
    p.add_argument("--synthetic_data", action="store_true", help="procedural data (smoke tests)")
    p.add_argument("--validation_steps", type=int, default=0, help="0 disables periodic validation")
    p.add_argument(
        "--validation_image", type=str, nargs="*", default=None,
        help="LQ image path(s) rendered every --validation_steps "
        "(reference --validation_image, train_stage1_adapter.py:509-516)",
    )
    p.add_argument(
        "--use_8bit_adam", action="store_true",
        help="blockwise-int8 Adam moment storage (reference --use_8bit_adam / bnb AdamW8bit)",
    )
    p.add_argument(
        "--quantize_frozen_unet", action="store_true",
        help="QLoRA storage mode (arXiv 2305.14314): frozen UNet base kernels "
        "int8, dequantized at use; trained ip/LoRA params stay fp. ~2.6 GB of "
        "HBM back — with --use_8bit_adam, fits SDXL stage-2 on ONE 16 GB v5e",
    )
    p.add_argument(
        "--prefetch_batches", type=int, default=2,
        help="host-pipelined batch preparation depth: a worker thread runs "
        "next(data)+prepare_batch N steps ahead, hiding loader + host->device "
        "upload behind device compute (default 2; 0 = sequential; the "
        "produced sequences are bitwise-identical either way)",
    )
    p.add_argument(
        "--scale_lr", action="store_true",
        help="scale lr by gradient_accumulation_steps x global batch "
        "(reference train_stage1_adapter.py:817-820)",
    )
    p.add_argument(
        "--gradient_checkpointing", action="store_true",
        help="rematerialize UNet/Aggregator blocks in the backward pass "
        "(reference train_*_*.py --gradient_checkpointing)",
    )
    p.add_argument(
        "--handle_preemption", action="store_true",
        help="SIGTERM (TPU spot/maintenance event) -> checkpoint at the next "
        "step boundary and exit cleanly; resume with --resume_from_checkpoint latest",
    )
    p.add_argument(
        "--async_checkpointing", action="store_true",
        help="overlap orbax checkpoint writes with subsequent train steps",
    )
    p.add_argument(
        "--report_to", type=str, default="tensorboard",
        choices=["tensorboard", "wandb", "all"],
        help="tracker backend (reference --report_to; its wandb branch raises "
        "NotImplementedError, here it works when wandb is importable)",
    )
    return p


def _build_models(args):
    import jax
    import jax.numpy as jnp

    if args.sdxl_path:
        from instantir_tpu.pipeline.load import load_instantir_pipeline

        pipe = load_instantir_pipeline(
            args.sdxl_path,
            instantir_path=None,
            vision_encoder_path=args.vision_encoder_path,
            adapter_path=args.adapter_path,
            previewer_lora_path=args.previewer_lora_path,
        )
        return pipe
    # random init at full architecture (for from-scratch experimentation)
    from instantir_tpu.models.dinov2 import dinov2_large_config
    from instantir_tpu.models.resampler import instantir_resampler_config
    from instantir_tpu.models.unet import sdxl_base_config
    from instantir_tpu.models.vae import sdxl_vae_config
    from instantir_tpu.pipeline.factory import build_pipeline

    return build_pipeline(
        sdxl_base_config(with_ip=True, lora_rank=64),
        sdxl_vae_config(),
        instantir_resampler_config(lora_rank=64),
        dinov2_large_config(),
        jax.random.PRNGKey(args.seed),
        dtype=jnp.bfloat16,
        image_size=args.resolution,
    )


def _conditioning(args, pipe, batch_size: int):
    """Prompt conditioning for training batches.

    Without an SDXL path: a fixed zero-embedding dict. With one: a CALLABLE
    ``cond(host_batch) -> dict`` that encodes the batch's per-sample caption
    column through the real CLIP towers each step (the reference's
    ``encode_prompt(batch[caption_column])``, ``utils/train_utils.py:190-237``;
    samples without captions fall back to ``args.prompt``). Encoded captions
    are cached host-side so repeated captions cost one device gather.
    """
    import jax.numpy as jnp
    import numpy as np

    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = (
        pipe.unet.config.projection_class_embeddings_input_dim - pipe.unet.config.addition_time_embed_dim * 6
    )
    res = args.resolution
    cond = {
        "prompt_embeds": jnp.zeros((batch_size, 77, cross), jnp.float32),
        "uncond_prompt_embeds": jnp.zeros((batch_size, 77, cross), jnp.float32),
        "pooled_embeds": jnp.zeros((batch_size, pooled_dim), jnp.float32),
        "uncond_pooled_embeds": jnp.zeros((batch_size, pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32), (batch_size, 1)),
    }
    if not args.sdxl_path:
        return cond

    from instantir_tpu.models.clip_text import encode_sdxl_prompt
    from instantir_tpu.pipeline.load import load_text_encoders

    (enc1, p1, tok1), (enc2, p2, tok2) = load_text_encoders(args.sdxl_path)

    def encode_batch(texts):
        """Encode a list of strings in one dual-tower pass (padded to a fixed
        batch so the jitted towers compile once)."""
        padded = list(texts) + [""] * (batch_size - len(texts))
        ids1 = jnp.asarray([tok1(t, padding="max_length", max_length=77, truncation=True)["input_ids"] for t in padded])
        ids2 = jnp.asarray([tok2(t, padding="max_length", max_length=77, truncation=True)["input_ids"] for t in padded])
        pe, pooled = encode_sdxl_prompt(enc1, p1, enc2, p2, ids1, ids2)
        return np.asarray(pe.astype(jnp.float32)), np.asarray(pooled.astype(jnp.float32))

    cache = {}

    def lookup(texts):
        missing = [t for t in dict.fromkeys(texts) if t not in cache]
        for group in range(0, len(missing), batch_size):
            chunk = missing[group : group + batch_size]
            pe, pooled = encode_batch(chunk)
            for i, t in enumerate(chunk):
                cache[t] = (pe[i], pooled[i])
        if len(cache) > 8192:  # bound host memory on huge caption sets
            cache.clear()
            return lookup(texts)
        pe = np.stack([cache[t][0] for t in texts])
        pooled = np.stack([cache[t][1] for t in texts])
        return jnp.asarray(pe), jnp.asarray(pooled)

    npe, npooled = lookup([""] * batch_size)

    def cond_fn(host_batch):
        captions = list(host_batch.get("captions") or [])
        captions = [(c if c else args.prompt) for c in captions] or [args.prompt] * batch_size
        pe, pooled = lookup(captions)
        return {
            **cond,
            "prompt_embeds": pe,
            "pooled_embeds": pooled,
            "uncond_prompt_embeds": npe,
            "uncond_pooled_embeds": npooled,
        }

    return cond_fn


def _is_main() -> bool:
    """Artifact exports are process-0-only in multi-host runs (the
    reference's ``accelerator.is_main_process`` gating)."""
    import jax

    return jax.process_index() == 0


def _data_iter(args):
    import jax

    # per-process dataset sharding — the analogue of accelerate's sharded
    # dataloader (utils/train_utils.py:98,171); a no-op on single-host
    pi, pc = jax.process_index(), jax.process_count()
    if args.synthetic_data:
        from instantir_tpu.data.dataset import SyntheticImageDataset

        ds = SyntheticImageDataset(seed=args.seed, process_index=pi, process_count=pc)
    else:
        from instantir_tpu.data.dataset import WeightedImageDataset, load_data_config

        ds = WeightedImageDataset(
            load_data_config(args.data_config, args.data_dir), seed=args.seed,
            process_index=pi, process_count=pc,
        )
    # GT crops at the training resolution (reference feeds gt_size=resolution
    # images into the degradation, utils/train_utils.py:123-127 + DEGRADE_OPT).
    # train_batch_size is the GLOBAL batch; each process loads its local rows
    # (the trainer's shard_batch assembles the global array from them)
    if args.train_batch_size % pc:
        raise ValueError(
            f"train_batch_size={args.train_batch_size} must divide by the "
            f"process count {pc}"
        )
    return ds.batches(batch_size=args.train_batch_size // pc, gt_size=args.resolution)


def _export_instantir_config(pipe, output_dir: str):
    """Write instantir_config.json next to exported artifacts so
    load_instantir_pipeline can rebuild the exact architecture (the reference
    hardcodes these dims at infer.py:269-273)."""
    import dataclasses
    import json

    path = os.path.join(output_dir, "instantir_config.json")
    with open(path, "w") as f:
        json.dump(
            {
                "lora_rank": pipe.unet.config.lora_rank,
                "resampler": dataclasses.asdict(pipe.resampler.config),
            },
            f,
            indent=2,
        )


def _val_batch(args):
    """[-1,1] NHWC float batch from --validation_image paths (LQ in; GT = the
    same images, matching the reference's LQ-only validation rendering)."""
    if not (args.validation_steps > 0 and args.validation_image):
        return None
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    imgs = []
    for path in args.validation_image:
        im = Image.open(path).convert("RGB").resize((args.resolution, args.resolution), Image.BICUBIC)
        imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    arr = jnp.asarray(np.stack(imgs))
    return {"lq": arr, "gt": arr}


def main(argv=None):
    args = build_parser().parse_args(argv)
    from instantir_tpu.parallel import initialize_distributed

    # multi-host: no-op unless JAX_COORDINATOR_ADDRESS is configured (TPU-pod
    # launchers set it per process); afterwards jax.devices() spans all hosts
    # and the per-process dataset sharding below does the rest
    initialize_distributed()
    from instantir_tpu.losses import load_losses_config

    losses_cfg = load_losses_config(args.losses_config) if os.path.exists(args.losses_config) else None
    pipe = _build_models(args)
    val_batch = _val_batch(args)
    if args.gradient_checkpointing:
        # param trees are identical with the flag on, so the loaded params
        # stay valid (models/unet.py remat note)
        import dataclasses

        pipe.unet = pipe.unet.clone(
            config=dataclasses.replace(pipe.unet.config, gradient_checkpointing=True)
        )
        pipe.aggregator = pipe.aggregator.clone(
            config=dataclasses.replace(pipe.aggregator.config, gradient_checkpointing=True)
        )
    cond = _conditioning(args, pipe, args.train_batch_size)
    data = _data_iter(args)

    if args.scale_lr:
        # the reference multiplies by per-GPU batch × num_processes
        # (train_stage1_adapter.py:817-820); train_batch_size here is already
        # the global batch, so the product is identical
        args.learning_rate *= args.gradient_accumulation_steps * args.train_batch_size

    shared = dict(
        output_dir=args.output_dir,
        max_train_steps=args.max_train_steps,
        train_batch_size=args.train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        learning_rate=args.learning_rate,
        use_8bit_adam=args.use_8bit_adam,
        quantize_frozen_unet=args.quantize_frozen_unet,
        prefetch_batches=args.prefetch_batches,
        validation_steps=args.validation_steps,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        resolution=args.resolution,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        seed=args.seed,
        sanity_check=args.sanity_check,
        resume_from_checkpoint=args.resume_from_checkpoint,
        handle_preemption=args.handle_preemption,
        async_checkpointing=args.async_checkpointing,
        report_to=args.report_to,
    )

    if args.stage == "stage1":
        from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer

        cfg = Stage1Config(image_drop_rate=args.image_drop_rate, importance_sampling=args.importance_sampling, **shared)
        trainer = Stage1Trainer(
            pipe.unet, pipe.resampler, pipe.vae, pipe.image_encoder, pipe.params, cfg, losses_cfg
        )
        trainer.run(data, cond, val_batch=val_batch)
        if _is_main():
            trainer.export_adapter(os.path.join(args.output_dir, "adapter_ckpt.pt"))
            _export_instantir_config(pipe, args.output_dir)
    elif args.stage == "previewer":
        from instantir_tpu.train.previewer_lora import PreviewerConfig, PreviewerTrainer

        cfg = PreviewerConfig(
            num_ddim_timesteps=args.num_ddim_timesteps, w_min=args.w_min, w_max=args.w_max,
            image_drop_rate=args.image_drop_rate, **shared,
        )
        trainer = PreviewerTrainer(
            pipe.unet, pipe.resampler, pipe.vae, pipe.image_encoder, pipe.params, cfg, losses_cfg
        )
        trainer.run(data, cond, val_batch=val_batch)
        if _is_main():
            trainer.export_lora(os.path.join(args.output_dir, "previewer_lora_weights.bin"))
            _export_instantir_config(pipe, args.output_dir)
    else:
        from instantir_tpu.train.stage2_aggregator import Stage2Config, Stage2Trainer

        cfg = Stage2Config(
            image_drop_rate=args.image_drop_rate, text_drop_rate=args.text_drop_rate,
            cond_drop_rate=args.cond_drop_rate, cfg_scale=args.CFG_scale,
            use_ema_adapter=args.use_ema_adapter, optimize_adapter=args.optimize_adapter,
            aggregator_adapter=args.aggregator_adapter, adapter_tokens=args.adapter_tokens,
            importance_sampling=args.importance_sampling, **shared,
        )
        aggregator, t_params, agg_resampler = pipe.aggregator, pipe.params, None
        if cfg.aggregator_adapter:
            from instantir_tpu.train.stage2_aggregator import enable_aggregator_adapter

            aggregator, t_params, agg_resampler = enable_aggregator_adapter(
                pipe.aggregator, pipe.params, pipe.image_encoder.config.hidden_size, cfg,
                seed=args.seed,
            )
        trainer = Stage2Trainer(
            pipe.unet, aggregator, pipe.resampler, pipe.vae, pipe.image_encoder, t_params, cfg,
            losses_cfg, agg_resampler=agg_resampler,
        )
        trainer.run(data, cond, val_batch=val_batch)
        if _is_main():
            trainer.export_aggregator(os.path.join(args.output_dir, "aggregator.pt"))
            _export_instantir_config(pipe, args.output_dir)


if __name__ == "__main__":
    main()
