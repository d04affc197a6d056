"""Per-component attribution of one denoise step at 1024² (CFG batch 2).

Times each sub-network forward on the real TPU: main UNet (lora 0), previewer
UNet (lora 1), aggregator — plus the three restore phases' per-step cost
implied by the phase scans. Identifies where the 303 ms/step goes and what
the previewer LoRA branch costs.

Run: python tools/bench_step_parts.py  (ambient TPU env)
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


def timed(label, fn, n=4):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label:58s} {min(ts)*1000:9.1f} ms   (runs: {[round(t*1000) for t in ts]})")
    return min(ts)


def main():
    res = 1024
    lat = res // 8
    unet, aggregator, vae, resampler, dino, schedule = build_models()
    key = jax.random.PRNGKey(0)
    unet_params = synth_params(unet, lambda: unet.init(
        key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 2048), jnp.bfloat16), jnp.zeros((1, 1280), jnp.bfloat16),
        jnp.zeros((1, 6), jnp.bfloat16), ip_hidden_states=jnp.zeros((1, 64, 2048), jnp.bfloat16)))
    agg_params = synth_params(aggregator, lambda: aggregator.init(
        key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
        added_text_embeds=jnp.zeros((1, 1280), jnp.bfloat16),
        added_time_ids=jnp.zeros((1, 6), jnp.bfloat16)))
    jax.block_until_ready((unet_params, agg_params))

    b = 2  # CFG batch
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(b, lat, lat, 4)) * 0.5, jnp.bfloat16)
    tb = jnp.full((b,), 500, jnp.int32)
    text = jnp.asarray(rng.normal(size=(b, 77, 2048)) * 0.1, jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(b, 1280)) * 0.1, jnp.bfloat16)
    tids = jnp.tile(jnp.asarray([[res, res, 0, 0, res, res]], jnp.bfloat16), (b, 1))
    ip = jnp.asarray(rng.normal(size=(b, 64, 2048)) * 0.1, jnp.bfloat16)

    def unet_fwd(scale):
        @jax.jit
        def f(p, z, tb, text, pooled, tids, ip):
            return unet.apply(p, z, tb, encoder_hidden_states=text, added_text_embeds=pooled,
                              added_time_ids=tids, ip_hidden_states=ip, lora_scale=scale)
        return lambda: fetch(f(unet_params, z, tb, text, pooled, tids, ip))

    @jax.jit
    def agg_f(p, z, tb, cond, pooled, tids):
        return aggregator.apply(p, z, tb, controlnet_cond=cond,
                                added_text_embeds=pooled, added_time_ids=tids)

    t_main = timed("main UNet fwd (lora_scale 0, static skip)", unet_fwd(0.0))
    t_prev = timed("previewer UNet fwd (lora_scale 1.0, rank 64)", unet_fwd(1.0))
    t_agg = timed("aggregator fwd (H-concat, 8192-token attn)",
                  lambda: fetch(agg_f(agg_params, z, tb, z, pooled, tids)))
    print(f"\nLoRA branch marginal cost: {(t_prev - t_main) * 1000:.1f} ms "
          f"({(t_prev / t_main - 1) * 100:.0f}% of the base UNet)")
    print(f"mode-B step (prev+agg+main): {(t_prev + t_agg + t_main) * 1000:.1f} ms")
    print(f"mode-A step (agg+main):      {(t_agg + t_main) * 1000:.1f} ms")
    print(f"mode-C step (main only):     {t_main * 1000:.1f} ms")


if __name__ == "__main__":
    main()
