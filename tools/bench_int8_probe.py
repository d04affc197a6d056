"""Does the v5e int8 MXU path pay through XLA? (VERDICT r3 ask #2 probe)

v5e datasheet: 394 int8 TOPS vs 197 bf16 TFLOP/s — IF XLA lowers an
int8×int8→int32 dot/conv to the native MXU mode. This measures, with the
dependency-chained marginal method (relay-safe):

  1. bf16 matmul roofline (sanity vs the recorded 171 TF/s);
  2. int8×int8→int32 matmul at the same shape;
  3. the full W8A8 recipe a quantized layer would run: dynamic per-row
     activation abs-max quant + int8 dot + f32 rescale;
  4. int8 vs bf16 3×3 convs at the UNet's hot geometries.

If (2) ≈ 2× (1) and (3) keeps most of it, a quantized inference mode is
worth building; if XLA upcasts (int8 ≈ bf16 rate), record the negative
result in docs/perf.md and stop.

Run: python tools/bench_int8_probe.py   (ambient TPU env)
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


def fetch(x):
    return float(np.asarray(x.ravel()[0], np.float32))


def marginal_ms(step, args, n_small=4, n_big=16, reps=3):
    run = jax.jit(lambda a, n: jax.lax.fori_loop(0, n, lambda _, c: step(*c), a))
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


N = 8192


def bf16_matmul():
    x = jnp.full((N, N), 0.01, jnp.bfloat16)
    w = jnp.full((N, N), 0.01, jnp.bfloat16)

    def step(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return (y.astype(jnp.bfloat16) * 1e-3, w)

    return marginal_ms(step, (x, w)), 2 * N**3


def int8_matmul():
    x = jnp.ones((N, N), jnp.int8)
    w = jnp.ones((N, N), jnp.int8)

    def step(x, w):
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # keep the chain int8 (mod keeps values tiny, no overflow growth)
        return ((y % 3).astype(jnp.int8), w)

    return marginal_ms(step, (x, w)), 2 * N**3


def w8a8_recipe():
    """bf16 activations → per-row absmax int8 quant → int8 dot → rescale."""
    x = jnp.full((N, N), 0.01, jnp.bfloat16)
    wq = jnp.ones((N, N), jnp.int8)
    wscale = jnp.full((N,), 1e-3, jnp.float32)

    def step(x, wq, wscale):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
        xs = ax / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * xs * wscale[None, :]
        return (out.astype(jnp.bfloat16) * 1e-3, wq, wscale)

    return marginal_ms(step, (x, wq, wscale)), 2 * N**3


def conv_case(hw, ch, dtype):
    b = 2
    if dtype == jnp.int8:
        x = jnp.ones((b, hw, hw, ch), jnp.int8)
        k = jnp.ones((3, 3, ch, ch), jnp.int8)

        def step(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return ((y % 3).astype(jnp.int8), k)
    else:
        x = jnp.full((b, hw, hw, ch), 0.1, jnp.bfloat16)
        k = jnp.full((3, 3, ch, ch), 0.01, jnp.bfloat16)

        def step(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return (y.astype(jnp.bfloat16) * 0.5, k)

    return marginal_ms(step, (x, k)), 2 * b * hw * hw * 9 * ch * ch


def main():
    rows = []
    ms, fl = bf16_matmul()
    rows.append(("bf16 8192^3 matmul", ms, fl / ms / 1e9))
    ms, fl = int8_matmul()
    rows.append(("int8 8192^3 matmul (int32 acc)", ms, fl / ms / 1e9))
    ms, fl = w8a8_recipe()
    rows.append(("W8A8 recipe (dyn act quant + rescale)", ms, fl / ms / 1e9))
    for hw, ch in ((128, 320), (64, 640), (32, 1280)):
        ms, fl = conv_case(hw, ch, jnp.bfloat16)
        rows.append((f"bf16 conv3x3 {hw}x{hw} c{ch}", ms, fl / ms / 1e9))
        ms, fl = conv_case(hw, ch, jnp.int8)
        rows.append((f"int8 conv3x3 {hw}x{hw} c{ch}", ms, fl / ms / 1e9))
    print(f"{'case':42s} {'ms':>9s} {'T(FL)OP/s':>10s}")
    for name, ms, tput in rows:
        print(f"{name:42s} {ms:9.3f} {tput:10.1f}")


if __name__ == "__main__":
    main()
