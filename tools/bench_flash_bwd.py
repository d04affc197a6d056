"""Marginal-cost timing of flash-attention forward+backward on the real TPU.

Methodology per docs/perf.md: vary the chained-iteration count inside one
jitted program (a lax.scan whose carry feeds the next iteration's input, so
XLA cannot CSE the repeats) and difference the wall times — per-dispatch
relay overhead (~25-90 ms) cancels out. Run:

  python tools/bench_flash_bwd.py            # flash custom-VJP path
  ATTN_IMPL=xla python tools/bench_flash_bwd.py   # XLA reference path
"""

import functools
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

from instantir_tpu.ops.attention import _flash_diff, attention_xla

IMPL = os.environ.get("ATTN_IMPL", "flash")


def main():
    for seq, heads in [(4096, 20), (8192, 20)]:
        d = 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, seq, heads, d)) * 0.2, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(2, seq, heads, d)) * 0.2, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(2, seq, heads, d)) * 0.2, jnp.bfloat16)
        scale = d**-0.5

        if IMPL == "flash":
            attn = lambda q, k, v: _flash_diff(q, k, v, scale, False)
        else:
            attn = lambda q, k, v: attention_xla(q, k, v, scale=scale)

        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)

        grad_fn = jax.grad(loss, argnums=(0, 1, 2))

        @functools.partial(jax.jit, static_argnames="n")
        def run_n(q, k, v, n):
            def body(carry, _):
                dq, dk, dv = grad_fn(q + carry.astype(q.dtype), k, v)
                return carry + jnp.mean(dq).astype(jnp.float32) * 1e-9, ()

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
            return c

        def timed(n):
            t0 = time.time()
            x = float(np.asarray(run_n(q, k, v, n)))  # forced device→host fetch
            return time.time() - t0, x

        timed(1)  # compile n=1
        timed(6)  # compile n=6
        t1, _ = timed(1)
        t6, _ = timed(6)
        per = (t6 - t1) / 5.0
        print(f"[{IMPL}] seq={seq} heads={heads}: fwd+bwd {per*1000:.1f} ms/iter (t1={t1:.3f}s t6={t6:.3f}s)")


if __name__ == "__main__":
    main()
