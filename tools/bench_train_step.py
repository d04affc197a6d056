"""Training-step throughput at SDXL scale on one TPU chip.

Times the jitted train step of each stage at the reference's training
operating point (512² resolution, ``train_stage2_aggregator.py:346-349``;
gradient checkpointing on, as the reference launchers set it,
``train_stage1_adapter.sh:11-15``) with synthetic SDXL-scale weights and
procedural data. The measured path is the REAL trainer path —
``Trainer.prepare_batch`` (degradation chain) + ``Trainer.train_step``
(jitted fwd+bwd+Adam with donated buffers) — not a stripped-down proxy.

Single-chip notes (16 GB v5e):
  * stage1 trains the ip params (resampler + UNet ip to_kv) under the frozen
    2.6B-param UNet — fits with room.
  * previewer trains the r=64 LoRA with the CFG teacher (3 UNet forwards +
    student backward).
  * stage2 trains the FULL aggregator; fp32 Adam moments alone (~8 GB) do
    not fit next to the weights, so this bench runs the 8-bit Adam variant
    (``--use_8bit_adam``) with the EMA adapter off. Multi-chip pods use
    ZeRO-1 sharding instead (the trainers' default on a mesh).

Usage:  BENCH_TRAIN_STAGE=stage1|previewer|stage2  python tools/bench_train_step.py
        (env: BENCH_TRAIN_BATCH, BENCH_TRAIN_RES, BENCH_TRAIN_STEPS)
Prints one JSON line per run, flushed immediately.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

from bench import synth_params

STAGE = os.environ.get("BENCH_TRAIN_STAGE", "stage1")
RES = int(os.environ.get("BENCH_TRAIN_RES", "512"))
BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "4" if STAGE != "stage2" else "1"))
TIMED_STEPS = int(os.environ.get("BENCH_TRAIN_STEPS", "3"))
# QLoRA storage mode (--quantize_frozen_unet): int8 frozen UNet base kernels.
# Required for the single-chip stage-2 row — exact bf16 misses 16 GB HBM by
# ~0.5 GB at 512² batch 1 even with 8-bit Adam (docs/perf.md round 4).
QUANT_FROZEN = os.environ.get("BENCH_TRAIN_QUANT_FROZEN", "1" if STAGE == "stage2" else "0") == "1"


def build_train_models(dtype=jnp.bfloat16):
    """SDXL-scale models with per-block gradient checkpointing (nn.remat) —
    the training-side twin of bench.build_models."""
    from instantir_tpu.models.aggregator import Aggregator
    from instantir_tpu.models.dinov2 import DINOv2Model, dinov2_large_config
    from instantir_tpu.models.resampler import Resampler, instantir_resampler_config
    from instantir_tpu.models.unet import UNet2DConditionModel, sdxl_base_config
    from instantir_tpu.models.vae import AutoencoderKL, sdxl_vae_config

    ucfg = dataclasses.replace(
        sdxl_base_config(with_ip=True, lora_rank=64), gradient_checkpointing=True
    )
    unet = UNet2DConditionModel(ucfg, use_flash=True, dtype=dtype, param_dtype=dtype)
    aggregator = Aggregator(ucfg, use_flash=True, dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKL(sdxl_vae_config(), dtype=jnp.float32, param_dtype=dtype)
    resampler = Resampler(instantir_resampler_config(lora_rank=64), dtype=dtype, param_dtype=dtype)
    dino = DINOv2Model(dinov2_large_config(), dtype=dtype, param_dtype=dtype)
    return unet, aggregator, vae, resampler, dino


def synth_all(unet, aggregator, vae, resampler, dino, with_aggregator: bool):
    key = jax.random.PRNGKey(0)
    params = {
        "unet": synth_params(unet, lambda: unet.init(
            key, jnp.zeros((1, 64, 64, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 2048), jnp.bfloat16), jnp.zeros((1, 1280), jnp.bfloat16),
            jnp.zeros((1, 6), jnp.bfloat16), ip_hidden_states=jnp.zeros((1, 64, 2048), jnp.bfloat16))),
        "vae": synth_params(vae, lambda: vae.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))),
        "resampler": synth_params(resampler, lambda: resampler.init(key, jnp.zeros((1, 257, 1024), jnp.bfloat16))),
        "image_encoder": synth_params(dino, lambda: dino.init(key, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))),
    }
    if with_aggregator:
        params["aggregator"] = synth_params(aggregator, lambda: aggregator.init(
            key, jnp.zeros((1, 64, 64, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 64, 64, 4), jnp.bfloat16),
            added_text_embeds=jnp.zeros((1, 1280), jnp.bfloat16),
            added_time_ids=jnp.zeros((1, 6), jnp.bfloat16)))
    jax.block_until_ready(params)
    return params


def zero_cond(batch_size: int):
    return {
        "prompt_embeds": jnp.zeros((batch_size, 77, 2048), jnp.float32),
        "uncond_prompt_embeds": jnp.zeros((batch_size, 77, 2048), jnp.float32),
        "pooled_embeds": jnp.zeros((batch_size, 1280), jnp.float32),
        "uncond_pooled_embeds": jnp.zeros((batch_size, 1280), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32), (batch_size, 1)),
    }


def main():
    from instantir_tpu.data.dataset import SyntheticImageDataset

    unet, aggregator, vae, resampler, dino = build_train_models()
    def memstat(tag):
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            print(f"[mem] {tag}: in_use={ms.get('bytes_in_use', 0)/2**30:.2f} GiB "
                  f"peak={ms.get('peak_bytes_in_use', 0)/2**30:.2f} GiB",
                  file=sys.stderr, flush=True)
        except Exception as e:  # memory_stats is backend-optional
            print(f"[mem] {tag}: unavailable ({e})", file=sys.stderr, flush=True)

    params = synth_all(unet, aggregator, vae, resampler, dino, with_aggregator=STAGE == "stage2")
    memstat("after synth")
    if QUANT_FROZEN and STAGE == "stage2":
        # Quantize HERE, not via the trainer flag: the trainer's in-constructor
        # transform cannot free the original tree (this caller's argument
        # reference keeps it alive through the constructor's allocation peak —
        # CPython holds call arguments on the caller's stack until return; two
        # resident trees OOMed the 16 GB chip, /tmp/train_s2q*.err). Quantize
        # first, then explicitly drop the old dict so the replaced bf16 base
        # kernels free before any optimizer/copy allocation. The trainer
        # consumes the pre-quantized tree as-is (partition routes the `quant`
        # collection into `frozen`; the layers dequantize at use).
        from instantir_tpu.train.common import quantize_frozen_unet
        from instantir_tpu.train.stage1_adapter import stage1_trainable_pred

        q = quantize_frozen_unet(params, keep_pred=stage1_trainable_pred)
        params.clear()  # last reference to the pruned-away fp kernels
        params.update(q)
        del q
        memstat("after weight-only quantize")
    make_params = lambda: params  # noqa: E731

    if STAGE == "stage1":
        from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer

        # 850M trainable ip-params: fp32 Adam moments (~6.8 GB) next to the frozen
        # 2.6B bf16 UNet do not fit a 16 GB chip — run the 8-bit Adam variant here
        # (same lever the stage-2 row uses; pods shard moments via ZeRO-1 instead).
        cfg = Stage1Config(output_dir=None, max_train_steps=100, train_batch_size=BATCH,
                           resolution=RES, lr_warmup_steps=0, importance_sampling=True,
                           use_8bit_adam=True)
        trainer = Stage1Trainer(unet, resampler, vae, dino, make_params(), cfg)
    elif STAGE == "previewer":
        from instantir_tpu.train.previewer_lora import PreviewerConfig, PreviewerTrainer

        cfg = PreviewerConfig(output_dir=None, max_train_steps=100, train_batch_size=BATCH,
                              resolution=RES, lr_warmup_steps=0)
        trainer = PreviewerTrainer(unet, resampler, vae, dino, make_params(), cfg)
    elif STAGE == "stage2":
        from instantir_tpu.train.stage2_aggregator import Stage2Config, Stage2Trainer

        cfg = Stage2Config(output_dir=None, max_train_steps=100, train_batch_size=BATCH,
                           resolution=RES, lr_warmup_steps=0,
                           use_ema_adapter=False, use_8bit_adam=True)
        trainer = Stage2Trainer(unet, aggregator, resampler, vae, dino, make_params(), cfg)
    else:
        raise SystemExit(f"unknown BENCH_TRAIN_STAGE={STAGE!r}")

    # Drop the bench's own tree reference: frozen leaves are SHARED into the
    # trainer (stay alive), but the TRAINABLE leaves were copied by
    # unique_buffers — the originals (the full ~2 GB aggregator in stage 2)
    # are dead weight the 16 GB chip cannot spare.
    params.clear()
    memstat("after params.clear")

    # loader images at gt_size: the reference crops to `resolution` BEFORE the
    # degradation (utils/train_utils.py:124-151), so ori == gt_size and the
    # paired random crop is a no-op — feeding larger images would 16× the
    # degradation pixel cost vs the reference operating point.
    data = SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES)
    cond = zero_cond(BATCH)

    def one_step(seed):
        """Returns (prepare_s, step_s, loss). The split is host-visible time:
        prepare covers the host batch + degradation dispatches, step covers
        the jitted train_step dispatch + the forced device→host loss fetch
        (the only sync the run loop does — matching trainer.run timing)."""
        t0 = time.time()
        batch = trainer.prepare_batch(next(data), cond, jax.random.PRNGKey(seed))
        # fetch one pixel so 'prepare' includes the degradation's device time,
        # not just its dispatch (relay: block_until_ready does not sync)
        np.asarray(batch["lq"][0, 0, 0])
        t1 = time.time()
        metrics = trainer.train_step(batch, jax.random.PRNGKey(seed + 1))
        loss = float(metrics["loss"])  # forced device→host fetch
        t2 = time.time()
        return t1 - t0, t2 - t1, loss

    memstat("after trainer construction")
    t0 = time.time()
    _, _, loss0 = one_step(0)
    compile_s = time.time() - t0
    memstat("after first step")

    prep_times, step_times = [], []
    for i in range(TIMED_STEPS):
        p, s, _ = one_step(i + 1)
        prep_times.append(p)
        step_times.append(s)
    times = [p + s for p, s in zip(prep_times, step_times)]
    dt = min(times)

    # Steady-state RUN-LOOP throughput, sequential vs host-pipelined
    # (prefetch_batches / common.pipelined_batches): the per-phase split
    # above forces a sync after prepare, which hides exactly the overlap the
    # prefetcher buys. Here the only sync is the final loss fetch — the real
    # run-loop cadence (trainers fetch metrics at logging_steps only).
    def run_loop(depth: int, k: int) -> float:
        from instantir_tpu.train import common as _common

        target = trainer.global_step + k
        metrics = None
        t0 = time.time()
        if depth > 0:
            src = _common.pipelined_batches(
                trainer, data, cond, jax.random.PRNGKey(123 + depth), target, depth)
            for batch, k_step in src:
                metrics = trainer.train_step(batch, k_step)
                if trainer.global_step >= target:
                    break
        else:
            key = jax.random.PRNGKey(123)
            while trainer.global_step < target:
                key, k_deg, k_step = jax.random.split(key, 3)
                batch = trainer.prepare_batch(next(data), cond, k_deg)
                metrics = trainer.train_step(batch, k_step)
        assert np.isfinite(float(metrics["loss"]))  # forced sync ends the clock
        return (time.time() - t0) / k

    loop_fields = {}
    if os.environ.get("BENCH_TRAIN_PIPELINED", "1") == "1":
        k = int(os.environ.get("BENCH_TRAIN_LOOP_STEPS", "6"))
        seq = run_loop(0, k)
        pipe_ = run_loop(2, k)
        loop_fields = {
            "loop_sequential_s_per_step": round(seq, 3),
            "loop_pipelined_s_per_step": round(pipe_, 3),
            "loop_pipelined_img_per_s": round(BATCH / pipe_, 3),
            "prefetch_depth": 2,
        }

    # analytic matmul/conv FLOPs of one train step (jaxpr walk over the
    # REAL jitted step — fwd, bwd, remat recomputation, optimizer included)
    # → per-stage MFU vs the 197 TF/s v5e bf16 peak (VERDICT r4 #3/#4)
    if os.environ.get("BENCH_TRAIN_MFU", "1") == "1":
        try:
            from instantir_tpu.utils.flops import jaxpr_flops

            b0 = trainer.prepare_batch(next(data), cond, jax.random.PRNGKey(999))
            if STAGE == "stage2":  # _step also takes the EMA tree
                step_args = (trainer.trainable, trainer.frozen, trainer.ema_adapter,
                             trainer.opt_state, b0, jax.random.PRNGKey(1000))
            else:
                step_args = (trainer.trainable, trainer.frozen,
                             trainer.opt_state, b0, jax.random.PRNGKey(1000))
            flops = jaxpr_flops(trainer._step, *step_args)
            tflop = flops / 1e12
            dev_step = min(step_times)
            loop_fields["analytic_tflop_per_step"] = round(tflop, 1)
            loop_fields["mfu_device_step"] = round(tflop / dev_step / 197.0, 3)
            if "loop_pipelined_s_per_step" in loop_fields:
                loop_fields["mfu_run_loop"] = round(
                    tflop / loop_fields["loop_pipelined_s_per_step"] / 197.0, 3)
        except Exception as e:
            loop_fields["mfu_error"] = str(e)[:200]

    print(json.dumps({
        "metric": f"{STAGE} train step, {RES}², batch {BATCH} (SDXL scale, grad-ckpt, 1 chip"
                  + (", int8-frozen-unet" if QUANT_FROZEN and STAGE == "stage2" else "") + ")",
        "value": round(BATCH / dt, 3),
        "unit": "images/sec",
        "sec_per_step": round(dt, 3),
        "prepare_s": [round(t, 3) for t in prep_times],
        "step_s": [round(t, 3) for t in step_times],
        "first_step_s": round(compile_s, 1),
        "first_loss": round(loss0, 4),
        "times": [round(t, 3) for t in times],
        **loop_fields,
    }), flush=True)


if __name__ == "__main__":
    main()
