"""Per-stage attribution of the headline restore time (VERDICT r1 weak #1/#10).

Times each dispatch of InstantIRPipeline.restore separately on the real TPU —
VAE encode, DINOv2, resampler ×2, init, the denoise scan, decode — plus the
pure relay dispatch overhead (a trivial jitted op), to attribute the gap
between the scan's device time and the end-to-end wall time. Also times the
bf16 decode variant.

Run: python tools/bench_restore_stages.py  (ambient TPU env)
"""

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

import jax.numpy as jnp
import numpy as np

from bench import build_models, synth_params


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0], np.float32))


def timed(label, fn, n=3):
    fn()  # compile / warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label:55s} {min(ts)*1000:9.1f} ms   (runs: {[round(t*1000) for t in ts]})")
    return min(ts)


def main():
    from instantir_tpu.pipeline.instantir import InstantIRPipeline, RestoreConfig

    res, steps = 1024, 30
    unet, aggregator, vae, resampler, dino, schedule = build_models()
    key = jax.random.PRNGKey(0)
    lat = res // 8
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
    cfg = RestoreConfig(num_inference_steps=steps, guidance_scale=7.0, preview_start=0.1,
                        control_guidance_end=0.7)

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, res, res, 3)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(1, 77, 2048)) * 0.1, jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(1, 1280)) * 0.1, jnp.bfloat16)

    # 0. pure dispatch overhead
    trivial = jax.jit(lambda x: x + 1.0)
    xsmall = jnp.zeros((8,), jnp.float32)
    timed("relay dispatch overhead (trivial jitted op + fetch)", lambda: fetch(trivial(xsmall)), n=5)

    # 1. end-to-end
    def full():
        image, _ = pipe.restore(lq, pe, pooled, cfg=cfg, key=jax.random.PRNGKey(1))
        return image[0, 0, 0, 0]

    timed("restore end-to-end (fp32 decode)", full, n=3)

    cfg16 = RestoreConfig(num_inference_steps=steps, guidance_scale=7.0, preview_start=0.1,
                          control_guidance_end=0.7, decode_dtype="bfloat16")

    def full16():
        image, _ = pipe.restore(lq, pe, pooled, cfg=cfg16, key=jax.random.PRNGKey(1))
        return image[0, 0, 0, 0]

    timed("restore end-to-end (bf16 decode)", full16, n=3)

    # 2. stages
    k = jax.random.PRNGKey(2)
    timed("VAE encode 1024² fp32", lambda: fetch(pipe.encode_vae_image(params, lq, k)))
    image_latent = pipe.encode_vae_image(params, lq, k).astype(jnp.bfloat16)

    def dino_stage():
        c, u = pipe.encode_image_embeds(params, (lq + 1.0) / 2.0)
        return fetch(c)

    timed("DINOv2 embeds (incl. eager preprocess ops)", dino_stage)
    dc, du = pipe.encode_image_embeds(params, (lq + 1.0) / 2.0)
    tokens = jnp.concatenate([du, dc], axis=0)
    timed("resampler projection (one scale)", lambda: fetch(pipe.project_ip_tokens(params, tokens, 1.0)))
    ip = pipe.project_ip_tokens(params, tokens, 0.0)

    # 3. the scan alone
    cond = {
        "prompt_embeds": jnp.concatenate([jnp.zeros_like(pe), pe]),
        "pooled_embeds": jnp.concatenate([jnp.zeros_like(pooled), pooled]),
        "time_ids": jnp.tile(jnp.asarray([[res, res, 0, 0, res, res]], jnp.bfloat16), (2, 1)),
    }
    lat0 = image_latent
    img2 = jnp.concatenate([image_latent] * 2)
    fn = pipe.sample_fn(cfg)

    def scan_only():
        out, _ = fn(params, lat0, cond, img2, ip, ip, jax.random.PRNGKey(3))
        return fetch(out)

    timed("denoise scans only (30 steps, 3 phases)", scan_only)

    # 4. decode
    z = fn(params, lat0, cond, img2, ip, ip, jax.random.PRNGKey(3))[0]
    timed("VAE decode 1024² fp32", lambda: fetch(pipe.decode_latents(params, z)))
    timed("VAE decode 1024² bf16", lambda: fetch(pipe.decode_latents(params, z, dtype=jnp.bfloat16)))


if __name__ == "__main__":
    main()
