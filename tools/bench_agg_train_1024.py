"""1024² training feasibility: aggregator forward+backward marginal time.

The round-1 cliff (VERDICT weak #2): the aggregator's H-concat gives
8192-token self-attention whose XLA backward materializes O(S²) scores —
566.9 ms forward alone at round 1; training at 1024² was impractical. With
the Pallas flash custom-VJP this measures the realized fwd+bwd step time of
the full SDXL-scale aggregator at 1024² latents (the stage-2 gradient path),
flash vs XLA attention.

Run: python tools/bench_agg_train_1024.py            # flash (default)
     ATTN_IMPL=xla python tools/bench_agg_train_1024.py
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

from bench import synth_params

IMPL = os.environ.get("ATTN_IMPL", "flash")
RES = int(os.environ.get("RES", "1024"))


def main():
    from instantir_tpu.models.aggregator import Aggregator
    from instantir_tpu.models.unet import sdxl_base_config

    lat = RES // 8
    ucfg = sdxl_base_config(with_ip=True, lora_rank=64)
    aggregator = Aggregator(ucfg, use_flash=(IMPL == "flash"), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = synth_params(aggregator, lambda: aggregator.init(
        key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
        added_text_embeds=jnp.zeros((1, 1280), jnp.bfloat16),
        added_time_ids=jnp.zeros((1, 6), jnp.bfloat16)))
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    b = 1
    z = jnp.asarray(rng.normal(size=(b, lat, lat, 4)) * 0.2, jnp.bfloat16)
    cond = jnp.asarray(rng.normal(size=(b, lat, lat, 4)) * 0.2, jnp.bfloat16)
    te = jnp.asarray(rng.normal(size=(b, 1280)) * 0.1, jnp.bfloat16)
    ti = jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.bfloat16)
    tb = jnp.full((b,), 500, jnp.int32)

    def loss(p, z, cond):
        down, mid = aggregator.apply(p, z, tb, controlnet_cond=cond,
                                     added_text_embeds=te, added_time_ids=ti)
        return sum(jnp.sum(r.astype(jnp.float32) ** 2) for r in down) + jnp.sum(mid.astype(jnp.float32) ** 2)

    grad_fn = jax.grad(loss)

    @functools.partial(jax.jit, static_argnames="n")
    def run_n(p, z, cond, n):
        def body(carry, _):
            g = grad_fn(p, z + carry.astype(z.dtype), cond)
            lead = jax.tree_util.tree_leaves(g)[0]
            return carry + jnp.mean(lead).astype(jnp.float32) * 1e-9, ()

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    def timed(n):
        t0 = time.time()
        float(np.asarray(run_n(params, z, cond, n)))
        return time.time() - t0

    timed(1)
    timed(4)
    t1 = timed(1)
    t4 = timed(4)
    per = (t4 - t1) / 3.0
    # H-concat doubles H: max attn seq = (2·lat/2)·(lat/2) tokens at the /16 level
    print(f"[{IMPL}] aggregator fwd+bwd @ {RES}² (max {(lat // 2) * (lat // 2) * 2}-token attn): "
          f"{per*1000:.1f} ms/iter (t1={t1:.3f}s t4={t4:.3f}s)")


if __name__ == "__main__":
    main()
