"""Probe TPU compiler options against the in-scan UNet forward.

The headline gap is conv/fusion *scheduling* quality inside the per-step
network forwards (docs/perf.md "What's known and next"): the main SDXL UNet
runs at ~97 TF/s in-scan vs the chip's 171 TF/s demonstrated matmul roofline.
This probe times the main UNet forward (CFG batch 2, 1024² latents, bf16,
flash attention) with the marginal-trip-count method inside ONE executable
(dynamic trip count → a single compile), under compiler options passed as a
JSON dict in ``PROBE_OPTS``:

    PROBE_OPTS='{"xla_tpu_scoped_vmem_limit_kib": "65536"}' \
        python tools/bench_xla_flags.py

NOTE: this environment's axon client rejects TPU flags in ``XLA_FLAGS``
(parse_flags_from_env aborts on them) — per-compile ``compiler_options`` is
the path that reaches the remote TPU compiler, and unknown option names fail
fast with "No such compile option". Each distinct option set compiles fresh
(~3 min for this body) and lands in the persistent cache.
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

B = 2  # CFG batch


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0], np.float32))


def main():
    import json

    res = int(os.environ.get("PROBE_RES", "1024"))
    lat = res // 8
    n_small = int(os.environ.get("PROBE_N_SMALL", "4"))
    n_big = int(os.environ.get("PROBE_N_BIG", "12"))
    opts = json.loads(os.environ.get("PROBE_OPTS", "{}"))

    unet, _aggregator, _vae, _resampler, _dino, _schedule = build_models()
    key = jax.random.PRNGKey(0)
    params = synth_params(unet, lambda: unet.init(
        key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 2048), jnp.bfloat16), jnp.zeros((1, 1280), jnp.bfloat16),
        jnp.zeros((1, 6), jnp.bfloat16), ip_hidden_states=jnp.zeros((1, 64, 2048), jnp.bfloat16)))
    jax.block_until_ready(params)

    z = jnp.zeros((B, lat, lat, 4), jnp.bfloat16)
    tb = jnp.zeros((B,), jnp.int32)
    text = jnp.zeros((B, 77, 2048), jnp.bfloat16)
    pooled = jnp.zeros((B, 1280), jnp.bfloat16)
    tids = jnp.zeros((B, 6), jnp.bfloat16)
    ip = jnp.zeros((B, 64, 2048), jnp.bfloat16)

    def step(p, x):
        # feed the output back as the next input so iterations form a real
        # dependency chain (no cross-iteration overlap can fake the number)
        out = unet.apply(p, x, tb, text, pooled, tids, ip_hidden_states=ip, lora_scale=0.0)
        return out.astype(x.dtype)

    # dynamic trip count → ONE compiled executable serves both measurements
    run = jax.jit(
        lambda p, x, n: jax.lax.fori_loop(0, n, lambda _, c: step(p, c), x),
        compiler_options=opts or None,
    )

    t0 = time.time()
    fetch(run(params, z, n_small))
    compile_s = time.time() - t0
    fetch(run(params, z, n_big))

    ts, tbig = [], []
    for _ in range(3):
        t0 = time.time()
        fetch(run(params, z, n_small))
        ts.append(time.time() - t0)
        t0 = time.time()
        fetch(run(params, z, n_big))
        tbig.append(time.time() - t0)
    ms = (min(tbig) - min(ts)) / (n_big - n_small) * 1000

    # analytic FLOPs of one SDXL UNet forward at this latent size, batch B
    # (docs/perf.md: ~11.4 TFLOP at 1024² batch 2)
    tf = 11.4 / ms * 1000 if res == 1024 else float("nan")
    print(f"PROBE_OPTS={opts}")
    print(f"unet fwd in-scan: {ms:.1f} ms  (~{tf:.0f} TF/s)   first-compile {compile_s:.0f}s")


if __name__ == "__main__":
    main()
