"""Production serving entry point — batched restoration over HTTP.

The reference ships only a single-user gradio demo (``gradio_demo/app.py``);
this is the production counterpart for TPU serving:

  * **request microbatching** — concurrent requests are gathered into one
    device batch (up to ``batch_size``, waiting at most ``batch_wait_ms`` for
    stragglers), so the chip always sees its most efficient batch;
  * **static shapes** — inputs are resized into fixed resolution buckets
    (``--resolutions 512,768,1024``; one bucket by default) and each batch is
    padded to exactly ``batch_size``: a finite set of XLA programs, all
    compiled at warmup, serves every request (no shape-driven recompiles —
    the cardinal TPU serving rule). Requests route to the smallest bucket
    that covers them, so small inputs don't pay the big bucket's step cost;
  * **warmup** — the full restore program (and the text encoders) compile
    before the server accepts traffic, so no request ever pays the
    multi-minute remote compile;
  * **stdlib HTTP** (ThreadingHTTPServer) — POST an image to ``/restore``,
    GET ``/healthz`` for liveness/readiness probes, GET ``/metrics`` for
    Prometheus-format counters and request-latency quantiles (the BASELINE
    "p50 per-image latency" serving metric). No extra dependencies.

The batching core (``RestoreServer``) is transport-independent and tested on
the CPU mesh without HTTP; the HTTP layer is a thin adapter over it.
"""

from __future__ import annotations

import argparse
import collections
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from instantir_tpu.cli.infer import DEFAULT_NEG_PROMPT, DEFAULT_PROMPT


@dataclass
class ServeConfig:
    batch_size: int = 4          # device batch (pad-to-full; compile once)
    batch_wait_ms: float = 25.0  # max straggler wait once a request is queued
    resolution: int = 1024       # fixed resolution bucket (static shapes)
    # optional extra buckets (e.g. (512, 768, 1024)): each input routes to the
    # smallest bucket that covers it, so small images stop paying the largest
    # bucket's step cost. One program per bucket, all compiled at warmup —
    # still a fixed, finite program set (the static-shape serving rule).
    resolutions: Tuple[int, ...] = ()
    # per-bucket device batch sizes, matched to sorted(resolutions). Larger
    # batches on small buckets keep the MXU fed where activations are cheap;
    # the big bucket can stay at the HBM-limited batch (at 1024² one 16 GB
    # v5e fits batch 1 with the 9.5 GB weight set — docs/perf.md). Empty →
    # every bucket uses ``batch_size``.
    batch_sizes: Tuple[int, ...] = ()
    num_inference_steps: int = 30
    guidance_scale: float = 7.0
    preview_start: float = 0.1
    creative_start: float = 0.7  # maps to control_guidance_end
    shared_cfg: bool = False     # CFG single-pass control branch (docs/perf.md)
    deepcache_interval: int = 1  # DeepCache block caching; 1 = exact (docs/perf.md)
    deepcache_depth: int = 1
    seed: int = 42


@dataclass
class _Request:
    image: np.ndarray            # [H, W, 3] float32 in [-1, 1] at bucket res
    prompt: str
    neg_prompt: str
    out_size: Tuple[int, int]    # (w, h) to resize the restored image back to
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[BaseException] = None
    t_submit: float = 0.0        # monotonic enqueue time (latency metrics)
    bucket: int = 0              # resolution bucket this request routed to


class RestoreServer:
    """Microbatching executor around ``InstantIRPipeline.restore``.

    ``encode_fn(list[str]) -> (prompt_embeds, pooled_embeds)`` supplies text
    conditioning (the CLIP towers, or a stub in tests). Submissions block the
    calling thread until their batch completes; the single worker thread owns
    every device dispatch, so requests never contend for the chip.
    """

    def __init__(self, pipe, encode_fn: Callable, cfg: ServeConfig = ServeConfig()):
        import jax

        from instantir_tpu.pipeline.instantir import RestoreConfig

        self.pipe = pipe
        self.encode_fn = encode_fn
        self.cfg = cfg
        self.restore_cfg = RestoreConfig(
            num_inference_steps=cfg.num_inference_steps,
            guidance_scale=cfg.guidance_scale,
            preview_start=cfg.preview_start,
            control_guidance_end=cfg.creative_start,
            preview_cfg=not cfg.shared_cfg,
            controlnet_cfg=not cfg.shared_cfg,
            deepcache_interval=cfg.deepcache_interval,
            deepcache_depth=cfg.deepcache_depth,
        )
        # resolution buckets: per-bucket request queues plus one notify queue
        # of bucket ids (every submit adds exactly one token, every worker
        # iteration removes exactly one — tokens ≥ pending requests, so an
        # empty notify queue proves every bucket queue is drained)
        self.buckets: Tuple[int, ...] = tuple(sorted(set(cfg.resolutions))) or (cfg.resolution,)
        if cfg.batch_sizes:
            if len(cfg.batch_sizes) != len(self.buckets):
                raise ValueError(
                    f"batch_sizes {cfg.batch_sizes} must match the {len(self.buckets)} "
                    f"resolution bucket(s) {self.buckets} (sorted ascending)"
                )
            self._bucket_batch: Dict[int, int] = dict(zip(self.buckets, cfg.batch_sizes))
        else:
            self._bucket_batch = {r: cfg.batch_size for r in self.buckets}
        self._queues: Dict[int, "queue.Queue[_Request]"] = {r: queue.Queue() for r in self.buckets}
        self._notify: "queue.Queue[int]" = queue.Queue()
        self._stop = threading.Event()
        self._closing = threading.Event()
        self._key = jax.random.PRNGKey(cfg.seed)
        self._embed_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        self._lock = threading.Lock()
        self.batches_run = 0
        self.requests_served = 0
        # bounded latency windows (seconds): per-request end-to-end
        # (enqueue → result ready, queue wait included) and per-batch device
        # execute time — the p50-per-image-latency serving metric
        self._request_latencies: collections.deque = collections.deque(maxlen=1024)
        self._batch_seconds: collections.deque = collections.deque(maxlen=256)
        self._worker = threading.Thread(target=self._run, name="restore-worker", daemon=True)

    # -- lifecycle ---------------------------------------------------------

    def start(self, warmup: bool = True):
        if warmup:
            self.warmup()
            # warmup is not traffic: report clean production counters
            self.batches_run = 0
            self.requests_served = 0
            self._request_latencies.clear()
            self._batch_seconds.clear()
        self._worker.start()
        return self

    def stop(self):
        """Immediate stop: the worker exits after its current batch; any
        still-queued requests are failed so their waiters unblock."""
        self._closing.set()
        self._stop.set()
        if self._worker.is_alive():
            self._worker.join(timeout=600)
        for q in self._queues.values():
            while True:
                try:
                    req = q.get_nowait()
                except queue.Empty:
                    break
                req.error = RuntimeError("server stopped")
                req.done.set()

    def drain(self, timeout: Optional[float] = 600):
        """Graceful shutdown: refuse new submissions, finish every queued
        request (in-flight batches included), then stop the worker. This is
        the serving counterpart of the trainers' SIGTERM preemption handling —
        a preempted/redeployed server loses no accepted request."""
        self._closing.set()
        if self._worker.is_alive():
            self._worker.join(timeout)
        self.stop()

    def warmup(self):
        """Compile every bucket's full-batch restore program (and the
        encoders) before accepting traffic. The persistent compilation cache
        makes restarts skip the remote compile entirely."""
        for r in self.buckets:
            reqs = [
                _Request(
                    image=np.zeros((r, r, 3), np.float32),
                    prompt=DEFAULT_PROMPT,
                    neg_prompt=DEFAULT_NEG_PROMPT,
                    out_size=(r, r),
                    bucket=r,
                )
                for _ in range(self._bucket_batch[r])
            ]
            self._execute(reqs)

    # -- request path ------------------------------------------------------

    def submit(self, image: np.ndarray, prompt: Optional[str] = None,
               neg_prompt: Optional[str] = None, timeout: Optional[float] = None) -> np.ndarray:
        """Blocking restore of ONE image ([H,W,3] uint8 or float in [-1,1]).
        Thread-safe; concurrent callers share a device batch."""
        if self._closing.is_set():
            raise RuntimeError("server is draining — not accepting new requests")
        img, out_size, bucket = self._to_bucket(image)
        req = _Request(
            image=img,
            prompt=prompt or DEFAULT_PROMPT,
            neg_prompt=neg_prompt or DEFAULT_NEG_PROMPT,
            out_size=out_size,
            t_submit=time.monotonic(),
            bucket=bucket,
        )
        self._enqueue(req)
        if not req.done.wait(timeout):
            raise TimeoutError("restore request timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def _enqueue(self, req: _Request):
        """Queue a prepared request on its bucket (requests built outside
        ``submit`` — e.g. test fixtures — default to the largest bucket)."""
        if req.bucket not in self._queues:
            req.bucket = self.buckets[-1]
        self._queues[req.bucket].put(req)
        self._notify.put(req.bucket)

    def _to_bucket(self, image: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int], int]:
        """Resize any input into a fixed resolution bucket — the smallest
        that covers it (largest otherwise). Static per-bucket shapes keep
        this a finite-program server."""
        from PIL import Image

        if image.dtype == np.uint8:
            pil = Image.fromarray(image)
        else:
            pil = Image.fromarray(((np.clip(image, -1, 1) + 1) * 127.5).astype(np.uint8))
        out_size = pil.size
        side = max(out_size)
        r = next((b for b in self.buckets if b >= side), self.buckets[-1])
        if pil.size != (r, r):
            pil = pil.resize((r, r), Image.LANCZOS)
        return np.asarray(pil, np.float32) / 127.5 - 1.0, out_size, r

    # -- worker ------------------------------------------------------------

    def _run(self):
        while not self._stop.is_set():
            try:
                bucket = self._notify.get(timeout=0.1)
            except queue.Empty:
                if self._closing.is_set():
                    return  # drained: no tokens ⇒ every bucket queue is empty
                continue
            try:
                first = self._queues[bucket].get_nowait()
            except queue.Empty:
                continue  # stale token: its request left in an earlier batch
            batch = [first]
            deadline = self.cfg.batch_wait_ms / 1000.0
            while len(batch) < self._bucket_batch[bucket]:
                try:
                    batch.append(self._queues[bucket].get(timeout=deadline))
                except queue.Empty:
                    break
            try:
                self._execute(batch)
            except BaseException as e:  # propagate to every waiter
                for req in batch:
                    req.error = e
                    req.done.set()

    def _embeds(self, prompts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Per-prompt embedding cache — production traffic reuses a handful
        of prompts; encoding is one jitted CLIP pass per novel prompt."""
        missing = sorted({p for p in prompts if p not in self._embed_cache})
        if missing:
            pe, pooled = self.encode_fn(missing)
            pe, pooled = np.asarray(pe, np.float32), np.asarray(pooled, np.float32)
            for i, p in enumerate(missing):
                self._embed_cache[p] = (pe[i], pooled[i])
        pe = np.stack([self._embed_cache[p][0] for p in prompts])
        pooled = np.stack([self._embed_cache[p][1] for p in prompts])
        return pe, pooled

    def _execute(self, batch: List[_Request]):
        import jax
        import jax.numpy as jnp

        from PIL import Image

        n, full = len(batch), self._bucket_batch[batch[0].bucket]
        pad = full - n
        images = np.stack([r.image for r in batch] + [batch[-1].image] * pad)
        pe, pooled = self._embeds([r.prompt for r in batch] + [batch[-1].prompt] * pad)
        npe, npooled = self._embeds([r.neg_prompt for r in batch] + [batch[-1].neg_prompt] * pad)

        with self._lock:
            self._key, sub = jax.random.split(self._key)
        t0 = time.monotonic()
        out, _ = self.pipe.restore(
            jnp.asarray(images),
            jnp.asarray(pe), jnp.asarray(pooled),
            negative_prompt_embeds=jnp.asarray(npe), negative_pooled_embeds=jnp.asarray(npooled),
            cfg=self.restore_cfg, key=sub,
        )
        out = np.asarray(out)  # device→host fetch = completion
        now = time.monotonic()
        self.batches_run += 1
        self.requests_served += n
        self._batch_seconds.append(now - t0)
        for i, req in enumerate(batch):
            img = ((np.clip(out[i], -1, 1) + 1) * 127.5).astype(np.uint8)
            if (img.shape[1], img.shape[0]) != req.out_size:
                img = np.asarray(Image.fromarray(img).resize(req.out_size, Image.LANCZOS))
            req.result = img
            if req.t_submit:
                self._request_latencies.append(now - req.t_submit)
            req.done.set()

    # -- observability -------------------------------------------------------

    @staticmethod
    def _quantiles(window) -> Dict[str, float]:
        xs = sorted(window)
        if not xs:
            return {}
        return {q: xs[min(len(xs) - 1, int(float(q) * len(xs)))] for q in ("0.5", "0.9", "0.99")}

    def stats(self) -> Dict:
        """Serving counters + latency quantiles over the recent window.
        Request latency is end-to-end (queue wait + batch wait + device);
        batch seconds is the device execute+fetch time of one full batch."""
        return {
            "requests_served": self.requests_served,
            "batches_run": self.batches_run,
            "queue_depth": sum(q.qsize() for q in self._queues.values()),
            "batch_size": self.cfg.batch_size,
            "resolution": self.cfg.resolution,
            "buckets": list(self.buckets),
            "bucket_batch_sizes": [self._bucket_batch[r] for r in self.buckets],
            "request_latency_seconds": self._quantiles(self._request_latencies),
            "batch_seconds": self._quantiles(self._batch_seconds),
        }

    def metrics_text(self) -> str:
        """Prometheus text exposition of ``stats()`` (no client library —
        the format is five lines of spec, stdlib-only like the rest)."""
        s = self.stats()
        lines = [
            "# TYPE instantir_requests_served_total counter",
            f"instantir_requests_served_total {s['requests_served']}",
            "# TYPE instantir_batches_run_total counter",
            f"instantir_batches_run_total {s['batches_run']}",
            "# TYPE instantir_queue_depth gauge",
            f"instantir_queue_depth {s['queue_depth']}",
            "# TYPE instantir_request_latency_seconds summary",
        ]
        for q, v in s["request_latency_seconds"].items():
            lines.append(f'instantir_request_latency_seconds{{quantile="{q}"}} {v:.4f}')
        lines.append("# TYPE instantir_batch_seconds summary")
        for q, v in s["batch_seconds"].items():
            lines.append(f'instantir_batch_seconds{{quantile="{q}"}} {v:.4f}')
        return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# HTTP layer (stdlib; POST image bytes → PNG response)
# ---------------------------------------------------------------------------


def make_http_server(server: RestoreServer, host: str = "0.0.0.0", port: int = 8000):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                body = json.dumps({"ok": True, **server.stats()}).encode()
                ctype = "application/json"
            elif path == "/metrics":
                body = server.metrics_text().encode()
                ctype = "text/plain; version=0.0.4"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            from PIL import Image

            url = urlparse(self.path)
            if url.path != "/restore":
                self.send_error(404)
                return
            q = parse_qs(url.query)
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
                out = server.submit(
                    img,
                    prompt=q.get("prompt", [None])[0],
                    neg_prompt=q.get("neg_prompt", [None])[0],
                    timeout=float(q.get("timeout", [600])[0]),
                )
                buf = io.BytesIO()
                Image.fromarray(out).save(buf, format="PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except BaseException as e:
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[List[str]] = None):
    import jax
    import jax.numpy as jnp

    from instantir_tpu.models.clip_text import encode_sdxl_prompt
    from instantir_tpu.pipeline.load import load_instantir_pipeline, load_text_encoders

    p = argparse.ArgumentParser(description="InstantIR TPU serving")
    p.add_argument("--sdxl_path", type=str, required=True)
    p.add_argument("--instantir_path", type=str, required=True)
    p.add_argument("--vision_encoder_path", type=str, required=True)
    p.add_argument("--adapter_model_path", type=str, default=None)
    p.add_argument("--previewer_lora_path", type=str, default=None)
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--batch_wait_ms", type=float, default=25.0)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--resolutions", type=str, default=None,
                   help="comma-separated resolution buckets (e.g. 512,768,1024): "
                   "each request routes to the smallest bucket covering it, so "
                   "small inputs skip the big bucket's step cost; one program "
                   "per bucket, all compiled at warmup")
    p.add_argument("--batch_sizes", type=str, default=None,
                   help="comma-separated per-bucket device batch sizes, matched "
                   "to the sorted --resolutions (e.g. 4,1 with 512,1024: batch-4 "
                   "on the cheap 512 bucket, HBM-limited batch-1 at 1024)")
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--cfg", type=float, default=7.0)
    p.add_argument("--preview_start", type=float, default=0.1)
    p.add_argument("--creative_start", type=float, default=0.7)
    p.add_argument("--shared_cfg", action="store_true")
    p.add_argument("--deepcache_interval", type=int, default=1,
                   help="DeepCache block caching: refresh cadence (1 = exact)")
    p.add_argument("--deepcache_depth", type=int, default=1)
    p.add_argument("--quantized", nargs="?", const="w8a8", default=None,
                   choices=("w8a8", "w8"),
                   help="int8 UNet+Aggregator: 'w8a8' (dynamic activation "
                   "quant — measured slower end-to-end than exact at 1024², "
                   "recorded negative) or 'w8' (weight-only, half the weight "
                   "HBM → bigger per-bucket batches; docs/perf.md)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the serve batch over all local devices (batch_size "
                   "must divide by the device count)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="with --mesh: tensor-parallel axis size (devices = "
                   "data × model). model>1 splits attention/MLP AND conv "
                   "weights over chips (86%% of UNet+Aggregator bytes, "
                   "parallel/tp.py) to cut per-image latency and per-chip "
                   "weight footprint, not just throughput")
    args = p.parse_args(argv)

    from instantir_tpu.parallel import initialize_distributed

    initialize_distributed()  # multi-host no-op unless a coordinator is configured
    pipe = load_instantir_pipeline(
        args.sdxl_path, args.instantir_path,
        vision_encoder_path=args.vision_encoder_path,
        adapter_path=args.adapter_model_path,
        previewer_lora_path=args.previewer_lora_path,
    )
    if args.quantized:
        pipe.quantize(weight_only=args.quantized == "w8")
    if args.mesh:
        from instantir_tpu.parallel.mesh import make_mesh

        pipe.shard(make_mesh(model_parallel=args.model_parallel))
    (enc1, p1, tok1), (enc2, p2, tok2) = load_text_encoders(args.sdxl_path)

    def encode(prompts: List[str]):
        ids1 = jnp.asarray([tok1(s, padding="max_length", max_length=77, truncation=True)["input_ids"] for s in prompts])
        ids2 = jnp.asarray([tok2(s, padding="max_length", max_length=77, truncation=True)["input_ids"] for s in prompts])
        return encode_sdxl_prompt(enc1, p1, enc2, p2, ids1, ids2)

    cfg = ServeConfig(
        batch_size=args.batch_size, batch_wait_ms=args.batch_wait_ms,
        resolution=args.resolution,
        resolutions=tuple(int(r) for r in args.resolutions.split(",")) if args.resolutions else (),
        batch_sizes=tuple(int(b) for b in args.batch_sizes.split(",")) if args.batch_sizes else (),
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.cfg, preview_start=args.preview_start,
        creative_start=args.creative_start, shared_cfg=args.shared_cfg,
        deepcache_interval=args.deepcache_interval, deepcache_depth=args.deepcache_depth,
    )
    server = RestoreServer(pipe, encode, cfg).start(warmup=True)
    httpd = make_http_server(server, args.host, args.port)

    # SIGTERM (TPU preemption / redeploy) and SIGINT drain gracefully: stop
    # accepting connections, finish every accepted request, then exit
    import signal

    def _graceful(signum, frame):
        print(f"[serve] signal {signum}: draining...", flush=True)
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)

    buckets = ", ".join(f"{r}²" for r in server.buckets)
    print(f"[serve] ready on {args.host}:{args.port} "
          f"(batch {cfg.batch_size} @ {buckets}, {len(jax.devices())} device(s))")
    try:
        httpd.serve_forever()
    finally:
        server.drain()
        print(f"[serve] drained: {server.requests_served} request(s) served", flush=True)


if __name__ == "__main__":
    main()
