"""Isolate the 128²-c320 resnet inefficiency: bare conv vs GN+SiLU vs resnet.

Round-2b attribution (docs/perf.md) shows the 128²-c320 resnets at 83 TF/s
while the same-FLOP 64²-c640 resnets hit 157 TF/s. Two hypotheses:
  (a) the 3×3 conv itself tiles poorly at 320 output channels
      (320 = 2.5×128 MXU lanes → padding waste), or
  (b) the conv is fine and the GroupNorm/SiLU elementwise passes around it
      (2× the activation bytes of the 64² level) dominate.
This times each piece with the dependency-chained marginal method. If (a),
a Pallas conv kernel could pay; if (b), it's HBM-bound elementwise cost and
a kernel would lose like the fused-GroupNorm attempt did.

Run: python tools/bench_conv_probe.py   (ambient TPU env)
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

B = 2


def fetch(x):
    return float(np.asarray(x.ravel()[0], np.float32))


def marginal_ms(step, args, n_small=8, n_big=24, reps=3):
    run = jax.jit(
        lambda a, n: jax.lax.fori_loop(0, n, lambda _, c: step(*c), a),
    )
    fetch(run(args, n_small)[0])
    fetch(run(args, n_big)[0])
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.time()
        fetch(run(args, n_small)[0])
        ts.append(time.time() - t0)
        t0 = time.time()
        fetch(run(args, n_big)[0])
        tb.append(time.time() - t0)
    return (min(tb) - min(ts)) / (n_big - n_small) * 1000


def conv_case(hw, ch):
    k = (jnp.arange(9 * ch * ch, dtype=jnp.float32).reshape(3, 3, ch, ch) % 7 - 3) * (0.01 / ch)
    k = k.astype(jnp.bfloat16)
    x = jnp.full((B, hw, hw, ch), 0.1, jnp.bfloat16)

    def step(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (y.astype(jnp.bfloat16) * 0.5, k)

    ms = marginal_ms(step, (x, k))
    flops = 2 * B * hw * hw * 9 * ch * ch
    return ms, flops


def gn_silu_case(hw, ch, groups=32):
    x = jnp.full((B, hw, hw, ch), 0.1, jnp.bfloat16)
    scale = jnp.ones((ch,), jnp.bfloat16)

    def step(x, scale):
        xf = x.astype(jnp.float32).reshape(B, hw * hw, groups, ch // groups)
        mu = xf.mean(axis=(1, 3), keepdims=True)
        var = (xf * xf).mean(axis=(1, 3), keepdims=True) - mu * mu
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        y = y.reshape(B, hw, hw, ch).astype(jnp.bfloat16) * scale
        return (y * jax.nn.sigmoid(y), scale)

    ms = marginal_ms(step, (x, scale))
    bytes_moved = 2 * B * hw * hw * ch * 2  # read + write, bf16
    return ms, bytes_moved


def main():
    print(f"{'case':40s} {'ms':>8s} {'TF/s or GB/s':>14s}")
    for hw, ch in ((128, 320), (64, 640), (128, 384), (128, 256)):
        ms, fl = conv_case(hw, ch)
        print(f"bare conv3x3 {hw}x{hw} c{ch:<4d}            {ms:8.3f} {fl/ms/1e9:10.1f} TF/s")
    for hw, ch in ((128, 320), (64, 640)):
        ms, by = gn_silu_case(hw, ch)
        print(f"GN+SiLU {hw}x{hw} c{ch:<4d}                 {ms:8.3f} {by/ms/1e6:10.1f} GB/s")


if __name__ == "__main__":
    main()
