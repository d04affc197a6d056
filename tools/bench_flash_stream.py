"""On-chip validation + timing of the K/V-STREAMING flash kernels (round 5).

The round-4 kernels held K/V for one (batch, head) resident in VMEM, which
capped dense attention below 32K tokens (the 2048² H-concat probe died on
the 16 MB scoped-vmem limit — docs/perf.md round 4). Round 5 streams K/V
blocks through the grid's innermost sequential dimension with the softmax
state in VMEM scratch. This probe proves, on the real chip:

  1. parity: flash fwd and grads match the XLA einsum path at bf16 tolerance
     (4096 tokens — both paths fit densely there);
  2. no regression: fwd and fwd+bwd per-iter times at the InstantIR operating
     points (4096 / 8192 tokens) vs the round-2b records (1.06 / 4.57 ms fwd,
     5.8 / 21.0 ms fwd+bwd at H20);
  3. new capability: fwd at 16384 and 32768 tokens (the 2048² UNet /16 and
     Aggregator H-concat sequences) now compiles and runs on one chip.

Marginal-cost methodology per docs/perf.md (chained lax.scan, differenced
wall times, forced device→host fetch).  Usage: python tools/bench_flash_stream.py
"""

import functools
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

import jax.numpy as jnp
import numpy as np

from instantir_tpu.ops.attention import _flash_diff, attention_xla


def marginal(run_n):
    def timed(n):
        t0 = time.time()
        float(np.asarray(run_n(n)))  # forced device→host fetch
        return time.time() - t0

    timed(1)
    timed(6)
    t1, t6 = timed(1), timed(6)
    return (t6 - t1) / 5.0


def make_inputs(seq, heads, batch=2, d=64):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(batch, seq, heads, d)) * 0.2, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(batch, seq, heads, d)) * 0.2, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(batch, seq, heads, d)) * 0.2, jnp.bfloat16)
    return q, k, v


def main():
    out = {}

    def record(label, value):
        out[label] = value
        print(json.dumps({label: value}), file=sys.stderr, flush=True)

    d = 64
    scale = d**-0.5

    # -- 1. parity at 4096 (fwd + grads vs the XLA path) --------------------
    q, k, v = make_inputs(4096, 4)

    @jax.jit
    def both(q, k, v):
        def loss_f(impl, q, k, v):
            return jnp.sum(impl(q, k, v).astype(jnp.float32) ** 2) * 1e-6

        flash = lambda q, k, v: _flash_diff(q, k, v, scale, False)
        xla = lambda q, k, v: attention_xla(q, k, v, scale=scale)
        o_f, o_x = flash(q, k, v), xla(q, k, v)
        g_f = jax.grad(functools.partial(loss_f, flash), argnums=(0, 1, 2))(q, k, v)
        g_x = jax.grad(functools.partial(loss_f, xla), argnums=(0, 1, 2))(q, k, v)
        errs = [jnp.max(jnp.abs(o_f.astype(jnp.float32) - o_x.astype(jnp.float32)))]
        errs += [jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))) for a, b in zip(g_f, g_x)]
        return jnp.stack(errs)

    errs = np.asarray(both(q, k, v))
    record("parity_max_abs_err", {n: round(float(e), 5) for n, e in zip(["o", "dq", "dk", "dv"], errs)})

    # -- 2/3. fwd timing at operating points + the formerly-impossible seqs --
    for seq, heads, label in [(4096, 20, "fwd_4096"), (8192, 20, "fwd_8192"),
                              (16384, 10, "fwd_16384"), (32768, 10, "fwd_32768")]:
        q, k, v = make_inputs(seq, heads)

        @functools.partial(jax.jit, static_argnames="n")
        def run_n(n, q=q, k=k, v=v):
            def body(carry, _):
                o = _flash_diff(q + carry.astype(q.dtype), k, v, scale, False)
                return carry + jnp.mean(o).astype(jnp.float32) * 1e-9, ()

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
            return c

        per = marginal(run_n)
        flops = 4 * q.shape[0] * heads * seq * seq * d  # QK^T + PV
        record(label, {"ms": round(per * 1000, 2), "tflops": round(flops / per / 1e12, 1)})

    # -- fwd+bwd at the training operating points ---------------------------
    for seq, heads, label in [(4096, 20, "fwdbwd_4096"), (8192, 20, "fwdbwd_8192")]:
        q, k, v = make_inputs(seq, heads)

        def loss(q, k, v):
            return jnp.sum(_flash_diff(q, k, v, scale, False).astype(jnp.float32) ** 2)

        grad_fn = jax.grad(loss, argnums=(0, 1, 2))

        @functools.partial(jax.jit, static_argnames="n")
        def run_n(n, q=q, k=k, v=v):
            def body(carry, _):
                dq, dk, dv = grad_fn(q + carry.astype(q.dtype), k, v)
                return carry + jnp.mean(dq).astype(jnp.float32) * 1e-9, ()

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
            return c

        record(label, {"ms": round(marginal(run_n) * 1000, 2)})

    print(json.dumps(out))


if __name__ == "__main__":
    main()
