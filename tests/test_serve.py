"""Serving layer: microbatching executor + HTTP adapter (cli/serve.py).

The reference has no serving entry point (gradio demo only); these tests pin
the production-serving contract: concurrent requests share one padded
static-shape device batch, one program serves every request, prompt
embeddings are cached per prompt, and the HTTP layer round-trips PNG bytes.
"""

import io
import threading

import numpy as np
import pytest

import jax

from instantir_tpu.cli.serve import RestoreServer, ServeConfig, _Request, make_http_server
from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.pipeline.instantir import InstantIRPipeline

RES = 32


@pytest.fixture(scope="module")
def server():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    bundle = build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES
    )
    pipe = InstantIRPipeline(
        bundle.unet, bundle.aggregator, bundle.vae, bundle.resampler, bundle.image_encoder,
        bundle.schedule, bundle.params,
    )
    cross = ucfg.cross_attention_dim
    pooled_dim = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    calls = []

    def encode(prompts):
        calls.append(list(prompts))
        rngs = [np.random.default_rng(abs(hash(p)) % 2**31) for p in prompts]
        pe = np.stack([r.normal(size=(7, cross)).astype(np.float32) * 0.1 for r in rngs])
        pooled = np.stack([r.normal(size=(pooled_dim,)).astype(np.float32) * 0.1 for r in rngs])
        return pe, pooled

    cfg = ServeConfig(batch_size=2, batch_wait_ms=200.0, resolution=RES,
                      num_inference_steps=2, guidance_scale=7.0,
                      preview_start=0.0, creative_start=1.0)
    srv = RestoreServer(pipe, encode, cfg).start(warmup=True)
    srv._encode_calls = calls
    yield srv
    srv.stop()


def test_single_request_roundtrip(server):
    img = (np.random.default_rng(0).uniform(0, 255, size=(48, 40, 3))).astype(np.uint8)
    out = server.submit(img, prompt="a cat", timeout=300)
    # restored image comes back at the ORIGINAL size (PIL size is (w, h))
    assert out.shape == (48, 40, 3) and out.dtype == np.uint8


def test_concurrent_requests_share_a_batch(server):
    before = server.batches_run
    results = {}

    def call(i):
        img = np.full((RES, RES, 3), 10 * i, np.uint8)
        results[i] = server.submit(img, prompt="same prompt", timeout=300)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert all(results[i].shape == (RES, RES, 3) for i in range(2))
    # both requests fit one device batch (batch_size=2, generous batch_wait):
    # at most 2 batches even under scheduler jitter, not strictly 1, because
    # the worker may have dequeued the first request before the second landed
    assert server.batches_run - before <= 2


def test_prompt_embed_cache(server):
    n_before = sum(len(c) for c in server._encode_calls)
    img = np.zeros((RES, RES, 3), np.uint8)
    server.submit(img, prompt="a cached prompt", timeout=300)
    server.submit(img, prompt="a cached prompt", timeout=300)
    n_after = sum(len(c) for c in server._encode_calls)
    # the second submit must not re-encode "a cached prompt"
    assert ("a cached prompt" in {p for c in server._encode_calls for p in c})
    assert n_after - n_before <= 2  # 1 novel prompt + possibly its neg default


def _queued_request(i=0):
    return _Request(
        image=np.full((RES, RES, 3), 0.01 * i, np.float32),
        prompt="drain test", neg_prompt="", out_size=(RES, RES),
    )


def test_graceful_drain_finishes_queued_requests(server):
    """drain() must complete every accepted request before stopping (the
    serving counterpart of trainer preemption handling), then refuse new
    submissions."""
    srv2 = RestoreServer(server.pipe, server.encode_fn, server.cfg)
    reqs = [_queued_request(i) for i in range(3)]  # > batch_size=2: two batches
    for r in reqs:
        srv2._enqueue(r)
    srv2._worker.start()
    srv2.drain(timeout=600)
    for r in reqs:
        assert r.done.is_set() and r.error is None
        assert r.result.shape == (RES, RES, 3)
    with pytest.raises(RuntimeError, match="draining"):
        srv2.submit(np.zeros((RES, RES, 3), np.uint8))


def test_stop_unblocks_queued_waiters(server):
    """Immediate stop() must fail still-queued requests so their waiters
    unblock instead of hanging until timeout."""
    srv2 = RestoreServer(server.pipe, server.encode_fn, server.cfg)
    req = _queued_request()
    srv2._enqueue(req)
    srv2.stop()  # worker never started — the request can only be flushed
    assert req.done.is_set()
    assert isinstance(req.error, RuntimeError)


def test_http_roundtrip(server):
    from http.client import HTTPConnection

    from PIL import Image

    httpd = make_http_server(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("GET", "/healthz")
        health = conn.getresponse()
        assert health.status == 200
        body = health.read()
        assert b'"ok": true' in body

        buf = io.BytesIO()
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(buf, format="PNG")
        conn.request("POST", "/restore?prompt=hello", body=buf.getvalue(),
                     headers={"Content-Length": str(buf.getbuffer().nbytes)})
        resp = conn.getresponse()
        assert resp.status == 200
        out = Image.open(io.BytesIO(resp.read()))
        assert out.size == (40, 40)

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        httpd.shutdown()


def test_metrics_latency_quantiles(server):
    """stats()/metrics_text() report request-latency and batch-time quantiles
    over the recent window, plus counters and queue depth — the serving
    observability surface (BASELINE's "p50 per-image latency" metric)."""
    img = np.zeros((RES, RES, 3), np.uint8)
    for _ in range(3):
        server.submit(img, prompt="metrics probe")

    s = server.stats()
    assert s["requests_served"] >= 3 and s["batches_run"] >= 1
    assert s["queue_depth"] == 0
    lat = s["request_latency_seconds"]
    assert set(lat) == {"0.5", "0.9", "0.99"}
    assert 0 < lat["0.5"] <= lat["0.99"]
    bat = s["batch_seconds"]
    assert 0 < bat["0.5"] <= lat["0.99"] + 1e-9  # batch time bounded by e2e latency window

    text = server.metrics_text()
    assert "# TYPE instantir_requests_served_total counter" in text
    assert 'instantir_request_latency_seconds{quantile="0.5"}' in text
    assert text.endswith("\n")

    # HTTP exposition
    import threading as _threading
    from http.client import HTTPConnection

    httpd = make_http_server(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    _threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type", "").startswith("text/plain")
        assert b"instantir_batches_run_total" in resp.read()
        # /healthz now carries the full stats dict
        conn.request("GET", "/healthz")
        health = conn.getresponse()
        assert health.status == 200
        assert b"request_latency_seconds" in health.read()
    finally:
        httpd.shutdown()


def test_resolution_buckets(server):
    """Multi-bucket serving: each request routes to the smallest resolution
    bucket that covers it (one static-shape program per bucket, all warmed),
    and drain still finishes every queued request across buckets."""
    srv = RestoreServer(
        server.pipe, server.encode_fn,
        ServeConfig(batch_size=2, batch_wait_ms=50.0, resolution=RES,
                    resolutions=(16, RES), num_inference_steps=2,
                    preview_start=0.0, creative_start=1.0),
    ).start(warmup=True)
    try:
        assert srv.buckets == (16, RES)
        # routing: 12×10 fits the 16-bucket; 28×28 needs the 32-bucket
        img_small, _, b_small = srv._to_bucket(np.zeros((10, 12, 3), np.uint8))
        img_big, _, b_big = srv._to_bucket(np.zeros((28, 28, 3), np.uint8))
        assert b_small == 16 and img_small.shape == (16, 16, 3)
        assert b_big == RES and img_big.shape == (RES, RES, 3)
        # oversized inputs fall back to the largest bucket
        assert srv._to_bucket(np.zeros((64, 64, 3), np.uint8))[2] == RES

        out_small = srv.submit(np.zeros((10, 12, 3), np.uint8), prompt="small")
        out_big = srv.submit(np.zeros((28, 28, 3), np.uint8), prompt="big")
        assert out_small.shape == (10, 12, 3) and out_big.shape == (28, 28, 3)
        assert srv.stats()["buckets"] == [16, RES]
        assert srv.requests_served == 2 and srv.batches_run == 2  # distinct buckets
    finally:
        srv.drain()


def test_per_bucket_batch_sizes(server):
    """Per-bucket device batches (ServeConfig.batch_sizes): the small bucket
    runs a larger microbatch than the HBM-limited big bucket — each bucket's
    program pads to ITS batch size, and concurrent small-bucket requests
    still share one device batch."""
    srv = RestoreServer(
        server.pipe, server.encode_fn,
        ServeConfig(batch_wait_ms=200.0, resolution=RES,
                    resolutions=(16, RES), batch_sizes=(2, 1),
                    num_inference_steps=2, preview_start=0.0, creative_start=1.0),
    ).start(warmup=True)
    try:
        assert srv._bucket_batch == {16: 2, RES: 1}
        assert srv.stats()["bucket_batch_sizes"] == [2, 1]
        # two concurrent small-bucket requests coalesce into ONE batch-2 run
        results = [None, None]

        def client(i):
            results[i] = srv.submit(np.zeros((10, 12, 3), np.uint8), prompt=f"p{i}")

        threads = [threading.Thread(target=client, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None and r.shape == (10, 12, 3) for r in results)
        assert srv.batches_run == 1 and srv.requests_served == 2
        # the big bucket executes alone at its batch size of 1
        out = srv.submit(np.zeros((RES, RES, 3), np.uint8), prompt="big")
        assert out.shape == (RES, RES, 3)
        assert srv.batches_run == 2
    finally:
        srv.drain()

    # mismatched lengths are rejected up front
    with pytest.raises(ValueError):
        RestoreServer(
            server.pipe, server.encode_fn,
            ServeConfig(resolutions=(16, RES), batch_sizes=(2,),
                        num_inference_steps=2),
        )
