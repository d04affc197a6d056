"""Serving performance on the real chip — the BASELINE "p50 per-image
latency" metric, measured from the server's own quantile window.

Drives `cli.serve.RestoreServer` exactly as production would (SDXL-scale
models, synthetic weights — throughput is weight-independent): warmup
compiles every bucket program, then N client threads submit a mixed
512²/1024² workload and we read `stats()` — p50/p95 end-to-end request
latency (queue wait + batch wait + device), per-batch device seconds, and
throughput. Also reports the bucket-routing win: the same 512² image served
through the 512 bucket vs forced through the 1024 bucket.

Env: BENCH_SERVE_BATCHES ("4,1" — per-bucket device batch, matched to the
sorted buckets; at 1024² one 16 GB v5e fits batch 1 next to the 9.5 GB
weight set, the 512² bucket runs batch 4), BENCH_SERVE_STEPS (30),
BENCH_SERVE_REQS (16), BENCH_SERVE_CLIENTS (8),
BENCH_SERVE_BUCKETS ("512,1024").

Round-5 knobs (VERDICT r4 #1/#5):
  BENCH_SERVE_MODE=continuous  → step-level continuous batching
      (ContinuousRestoreServer; per-slot timesteps, mid-flight refill);
      BENCH_SERVE_TICK (5) sets the scheduler tick quantum.
  BENCH_SERVE_SHARED=1         → shared-CFG fast tier *as served*
  BENCH_SERVE_DEEPCACHE=N      → DeepCache interval N (whole-request only)
  BENCH_SERVE_QUANT=w8         → weight-only int8 pipeline (batch-2 enabler)
  BENCH_SERVE_ROUTING=0        → skip the bucket-routing comparison section
Usage:  python tools/bench_serve.py       (ambient TPU env; 2 bucket compiles)
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import build_models, synth_params


def main():
    from instantir_tpu.cli.serve import ContinuousRestoreServer, RestoreServer, ServeConfig
    from instantir_tpu.pipeline.instantir import InstantIRPipeline

    steps = int(os.environ.get("BENCH_SERVE_STEPS", "30"))
    n_reqs = int(os.environ.get("BENCH_SERVE_REQS", "16"))
    n_clients = int(os.environ.get("BENCH_SERVE_CLIENTS", "8"))
    mode = os.environ.get("BENCH_SERVE_MODE", "whole")
    tick = int(os.environ.get("BENCH_SERVE_TICK", "5"))
    shared = os.environ.get("BENCH_SERVE_SHARED") == "1"
    deepcache = int(os.environ.get("BENCH_SERVE_DEEPCACHE", "1"))
    quant = os.environ.get("BENCH_SERVE_QUANT", "")
    routing = os.environ.get("BENCH_SERVE_ROUTING", "1") == "1"
    buckets = tuple(sorted(int(r) for r in os.environ.get("BENCH_SERVE_BUCKETS", "512,1024").split(",")))
    batch_sizes = tuple(int(b) for b in os.environ.get("BENCH_SERVE_BATCHES", "4,1").split(","))
    assert len(batch_sizes) == len(buckets), "BENCH_SERVE_BATCHES must match BENCH_SERVE_BUCKETS"

    key = jax.random.PRNGKey(0)
    unet, aggregator, vae, resampler, dino, schedule = build_models()
    lat = max(buckets) // 8
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
    del params  # caller-held-duplicate rule (docs/perf.md round 4)
    if quant:
        pipe.quantize(weight_only=quant == "w8")

    rng = np.random.default_rng(0)
    embed_const = (jnp.asarray(rng.normal(size=(1, 77, 2048)) * 0.1, jnp.bfloat16),
                   jnp.asarray(rng.normal(size=(1, 1280)) * 0.1, jnp.bfloat16))

    def encode_fn(prompts):
        b = len(prompts)
        return (jnp.tile(embed_const[0], (b, 1, 1)), jnp.tile(embed_const[1], (b, 1)))

    cfg = ServeConfig(resolutions=buckets, batch_sizes=batch_sizes,
                      num_inference_steps=steps, batch_wait_ms=50.0,
                      shared_cfg=shared, deepcache_interval=deepcache,
                      continuous=mode == "continuous", tick_steps=tick)
    server_cls = ContinuousRestoreServer if mode == "continuous" else RestoreServer
    server = server_cls(pipe, encode_fn, cfg)
    t0 = time.time()
    server.start(warmup=True)
    warmup_s = time.time() - t0

    # mixed workload: alternating 512² and 1024² source images
    images = [
        (rng.uniform(size=(buckets[i % len(buckets)], buckets[i % len(buckets)], 3)) * 2 - 1)
        .astype(np.float32)
        for i in range(n_reqs)
    ]
    errors = []
    it = iter(range(n_reqs))
    lock = threading.Lock()

    def client():
        while True:
            with lock:
                try:
                    i = next(it)
                except StopIteration:
                    return
            try:
                server.submit(images[i], timeout=1200)
            except Exception as e:  # noqa: BLE001
                errors.append(str(e))

    t0 = time.time()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    stats = server.stats()

    out = {
        "mode": mode, "batch_sizes": list(batch_sizes), "steps": steps,
        "buckets": list(buckets),
        "requests": n_reqs, "clients": n_clients, "errors": errors,
        "shared_cfg": shared, "deepcache": deepcache, "quant": quant or None,
        "warmup_s": round(warmup_s, 1),
        "throughput_img_per_s": round(stats["requests_served"] / wall, 4),
        "request_latency_s": stats["request_latency_seconds"],
        "batch_seconds": stats["batch_seconds"],
        "batches_run": stats["batches_run"],
    }
    if mode == "continuous":
        out["tick_steps"] = tick
        out["ticks_run"] = stats["ticks_run"]

    if routing:
        # bucket-routing win: one 512² request through each bucket, back-to-back
        small = (rng.uniform(size=(512, 512, 3)) * 2 - 1).astype(np.float32)
        t0 = time.time()
        server.submit(small, timeout=1200)
        out["small_req_via_512_bucket_s"] = round(time.time() - t0, 2)
        big_cfg = ServeConfig(batch_size=batch_sizes[-1], resolution=max(buckets),
                              num_inference_steps=steps)
        server2 = RestoreServer(pipe, encode_fn, big_cfg)
        server2.start(warmup=True)  # programs already in the persistent cache
        t0 = time.time()
        server2.submit(small, timeout=1200)
        out["small_req_via_1024_bucket_s"] = round(time.time() - t0, 2)
        server2.stop()
    server.drain()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
