"""W8A8 quantized-restore quality + speed probe at the headline config.

Measures, at SDXL scale on the real chip with identical inputs/PRNG:
  * PSNR of the int8-W8A8 restore vs the exact bf16 restore (decoded [0,1]
    image) — the quality cost of ``pipe.quantize()``;
  * steady-state s/img for exact vs quantized (same-session A/B, the only
    comparison that survives this environment's ambient relay drift);
  * the different-seed PSNR floor for context (same yardstick as the
    DeepCache table, tools/bench_deepcache_quality.py).

Caveat (as for DeepCache): weights are synthetic (bench.py sin-of-iota), so
this is the computational divergence of int8 execution, not perceptual
restoration quality on released checkpoints.

Usage:  python tools/bench_quant_quality.py   (env: BENCH_RES, BENCH_STEPS, BENCH_BATCH)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

import jax.numpy as jnp
import numpy as np

from bench import build_models, synth_params


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(1.0 / mse)


def main():
    from instantir_tpu.pipeline.instantir import InstantIRPipeline, RestoreConfig

    res = int(os.environ.get("BENCH_RES", "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    lat = res // 8
    key = jax.random.PRNGKey(0)

    unet, aggregator, vae, resampler, dino, schedule = build_models()
    params = {
        "unet": synth_params(unet, lambda: unet.init(
            key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 2048), jnp.bfloat16), jnp.zeros((1, 1280), jnp.bfloat16),
            jnp.zeros((1, 6), jnp.bfloat16), ip_hidden_states=jnp.zeros((1, 64, 2048), jnp.bfloat16))),
        "aggregator": synth_params(aggregator, lambda: aggregator.init(
            key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
            added_text_embeds=jnp.zeros((1, 1280), jnp.bfloat16),
            added_time_ids=jnp.zeros((1, 6), jnp.bfloat16))),
        "vae": synth_params(vae, lambda: vae.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))),
        "resampler": synth_params(resampler, lambda: resampler.init(key, jnp.zeros((1, 257, 1024), jnp.bfloat16))),
        "image_encoder": synth_params(dino, lambda: dino.init(key, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))),
    }
    jax.block_until_ready(params)
    pipe = InstantIRPipeline(unet, aggregator, vae, resampler, dino, schedule, params)

    cfg = RestoreConfig(num_inference_steps=steps, guidance_scale=7.0,
                        preview_start=0.1, control_guidance_end=0.7)
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(batch, res, res, 3)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(batch, 77, 2048)) * 0.1, jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(batch, 1280)) * 0.1, jnp.bfloat16)

    def run(seed=11):
        image, _ = pipe.restore(lq, pe, pooled, cfg=cfg, key=jax.random.PRNGKey(seed))
        arr = (np.asarray(image, dtype=np.float32) + 1.0) / 2.0
        return np.clip(arr, 0.0, 1.0)

    def timed(n=2):
        times = []
        for _ in range(n):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        return min(times) / batch

    out = {"res": res, "steps": steps, "batch": batch}
    t0 = time.time()
    exact = run()
    out["exact_first_call_s"] = round(time.time() - t0, 1)
    out["exact_s_per_img"] = round(timed(), 2)
    other = run(seed=12)
    out["different_seed_floor_db"] = round(psnr(exact, other), 2)

    pipe.quantize()
    from instantir_tpu.ops.quant import quantized_bytes

    qb, tot = quantized_bytes(pipe.params["unet"])
    out["unet_int8_bytes_gb"] = round(qb / 2**30, 2)
    t0 = time.time()
    quant = run()
    out["quant_first_call_s"] = round(time.time() - t0, 1)
    out["quant_s_per_img"] = round(timed(), 2)
    out["quant_psnr_db"] = round(psnr(exact, quant), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
