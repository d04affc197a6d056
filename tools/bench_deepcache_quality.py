"""DeepCache divergence probe at the headline config (1024², 30 steps).

Measures how far the DeepCache-accelerated sampler's OUTPUT drifts from the
exact sampler's output — PSNR over the decoded [0,1] image — for interval 2
and 3, plus the interval-2 + shared-CFG composition (the fastest serving
mode). This quantifies the "slight quality cost" claim in docs/perf.md at
real SDXL scale on the real chip, complementing the tiny-config
bounded-divergence test (tests/test_pipeline_advanced.py).

Caveat (stated in docs): weights are synthetic (bench.py's sin-of-iota
pattern), so this measures the *trajectory divergence of the computation*
under caching, not the perceptual quality of real restorations — the latter
needs released weights (tools/parity_check.py's deployment-side story).
PSNR here is exact-vs-approx on identical inputs/PRNG, so the number is the
caching error in isolation.

Usage:  python tools/bench_deepcache_quality.py          (env: BENCH_RES, BENCH_STEPS)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses
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

    base = RestoreConfig(num_inference_steps=steps, guidance_scale=7.0,
                         preview_start=0.1, control_guidance_end=0.7)
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, res, res, 3)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(1, 77, 2048)) * 0.1, jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(1, 1280)) * 0.1, jnp.bfloat16)

    def run(cfg):
        t0 = time.time()
        image, _ = pipe.restore(lq, pe, pooled, cfg=cfg, key=jax.random.PRNGKey(11))
        # [-1,1] -> [0,1]; full fetch through the relay forces completion
        arr = (np.asarray(image, dtype=np.float32) + 1.0) / 2.0
        return np.clip(arr, 0.0, 1.0), time.time() - t0

    exact, t_exact = run(base)
    out = {"res": res, "steps": steps, "exact_first_call_s": round(t_exact, 1), "psnr_db": {}}
    variants = {
        "interval2": dict(deepcache_interval=2),
        "interval3": dict(deepcache_interval=3),
        "interval2_depth2": dict(deepcache_interval=2, deepcache_depth=2),
        "interval2_shared_cfg": dict(deepcache_interval=2, preview_cfg=False, controlnet_cfg=False),
    }
    for name, kw in variants.items():
        img, t = run(dataclasses.replace(base, **kw))
        out["psnr_db"][name] = round(psnr(exact, img), 2)
        out.setdefault("call_s", {})[name] = round(t, 1)
    # context: the same exact config under a different PRNG key — the scale of
    # "a different random sample entirely", the floor any approximation should
    # beat to be meaningfully 'the same image'
    image2, _ = pipe.restore(lq, pe, pooled, cfg=base, key=jax.random.PRNGKey(12))
    other = np.clip((np.asarray(image2, dtype=np.float32) + 1.0) / 2.0, 0.0, 1.0)
    out["psnr_db"]["different_seed_floor"] = round(psnr(exact, other), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
