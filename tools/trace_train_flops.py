"""Host-only analytic FLOPs of each training stage's jitted step (no TPU).

Traces the REAL trainer `_step` (fwd+bwd+remat+optimizer) on the CPU backend
at SDXL scale and prints matmul/conv FLOPs per step (`utils/flops.py`), so
MFU columns can be computed for stages whose wall-times were measured in a
previous session without re-burning chip hours:

    MFU = (tflop_per_step / measured_s_per_step) / 197 TF/s.

Usage:  JAX_PLATFORMS=cpu is forced in-process.
        BENCH_TRAIN_STAGE=stage1|previewer|stage2 BENCH_TRAIN_BATCH=N \
            python tools/trace_train_flops.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

STAGE = os.environ.get("BENCH_TRAIN_STAGE", "stage1")
RES = int(os.environ.get("BENCH_TRAIN_RES", "512"))
BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "4" if STAGE != "stage2" else "1"))


def main():
    os.environ.setdefault("BENCH_TRAIN_STAGE", STAGE)
    import bench_train_step as bts

    from instantir_tpu.utils.flops import jaxpr_flops

    unet, aggregator, vae, resampler, dino = bts.build_train_models()
    params = bts.synth_all(unet, aggregator, vae, resampler, dino,
                           with_aggregator=STAGE == "stage2")
    if STAGE == "stage1":
        from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer

        cfg = Stage1Config(output_dir=None, max_train_steps=10, train_batch_size=BATCH,
                           resolution=RES, lr_warmup_steps=0, importance_sampling=True,
                           use_8bit_adam=True)
        trainer = Stage1Trainer(unet, resampler, vae, dino, params, cfg)
    elif STAGE == "previewer":
        from instantir_tpu.train.previewer_lora import PreviewerConfig, PreviewerTrainer

        cfg = PreviewerConfig(output_dir=None, max_train_steps=10, train_batch_size=BATCH,
                              resolution=RES, lr_warmup_steps=0)
        trainer = PreviewerTrainer(unet, resampler, vae, dino, params, cfg)
    else:
        from instantir_tpu.train.common import quantize_frozen_unet
        from instantir_tpu.train.stage1_adapter import stage1_trainable_pred
        from instantir_tpu.train.stage2_aggregator import Stage2Config, Stage2Trainer

        q = quantize_frozen_unet(params, keep_pred=stage1_trainable_pred)
        params.clear()
        params.update(q)
        del q
        cfg = Stage2Config(output_dir=None, max_train_steps=10, train_batch_size=BATCH,
                           resolution=RES, lr_warmup_steps=0,
                           use_ema_adapter=False, use_8bit_adam=True,
                           quantize_frozen_unet=False)
        trainer = Stage2Trainer(unet, aggregator, resampler, vae, dino, params, cfg)

    from instantir_tpu.data.dataset import SyntheticImageDataset

    data = SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES)
    cond = bts.zero_cond(BATCH)
    b0 = trainer.prepare_batch(next(data), cond, jax.random.PRNGKey(0))
    if STAGE == "stage2":
        args = (trainer.trainable, trainer.frozen, trainer.ema_adapter,
                trainer.opt_state, b0, jax.random.PRNGKey(1))
    elif STAGE == "previewer":  # _step also takes the DINO center
        args = (trainer.trainable, trainer.frozen, trainer.opt_state, b0,
                jax.random.PRNGKey(1), trainer.dino_center)
    else:
        args = (trainer.trainable, trainer.frozen, trainer.opt_state, b0, jax.random.PRNGKey(1))
    flops = jaxpr_flops(trainer._step, *args)
    print(json.dumps({"stage": STAGE, "batch": BATCH, "res": RES,
                      "tflop_per_step": round(flops / 1e12, 2),
                      "tflop_per_img": round(flops / BATCH / 1e12, 2)}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    main()
