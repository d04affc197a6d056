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
    # step-level continuous batching (ContinuousRestoreServer): a resident
    # slot batch per bucket, per-slot timesteps, mid-flight refill — cuts the
    # whole-request batcher's head-of-line latency (docs/perf.md round 5)
    continuous: bool = False
    tick_steps: int = 5          # denoise steps dispatched between scheduler decisions
    # refuse configs whose estimated HBM footprint exceeds the chip (clear
    # startup error instead of a mid-traffic OOM); override to experiment
    allow_overbudget: bool = False


# HBM planning coefficients (16 GB v5e), derived from measured fits in
# docs/perf.md round 4: exact-bf16 batch 1 at 1024² fits next to the 9.5 GB
# weight set; W8 (≈6.4 GB weights) batch 2 fits; bf16 batch 2 does NOT.
# Activation+temp footprint scales with CFG-doubled pixels ⇒ ≈4.4 GB per
# 1024² image satisfies all three observations with margin. These are
# planning numbers for fail-fast config validation, not allocator truth.
_HBM_ACT_GB_PER_MPIX = 4.4
_HBM_LIMIT_GB = 15.6  # 16 GB minus runtime/allocator reserve


def estimate_hbm_budget(pipe, buckets, bucket_batch, allow_overbudget=False):
    """Estimate per-(bucket, batch) HBM and fail fast when over budget.

    Returns a report dict (printed at warmup). Raises ``ValueError`` with the
    offending rows when the estimate exceeds the chip and
    ``allow_overbudget`` is not set (VERDICT r4 #7: serve must refuse with a
    clear message instead of a mid-traffic OOM).
    """
    import jax

    params_gb = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(pipe.params)
    ) / 1e9
    rows, over = [], []
    for r in buckets:
        b = bucket_batch[r]
        act_gb = _HBM_ACT_GB_PER_MPIX * (r * r / 1e6) * b
        total = params_gb + act_gb
        rows.append({"bucket": r, "batch": b, "params_gb": round(params_gb, 2),
                     "act_gb": round(act_gb, 2), "total_gb": round(total, 2),
                     "limit_gb": _HBM_LIMIT_GB, "fits": total <= _HBM_LIMIT_GB})
        if total > _HBM_LIMIT_GB:
            over.append(f"bucket {r}² batch {b}: est {total:.1f} GB > {_HBM_LIMIT_GB} GB "
                        f"(params {params_gb:.1f} + activations {act_gb:.1f})")
    if over and not allow_overbudget:
        raise ValueError(
            "serve config exceeds the estimated HBM budget:\n  " + "\n  ".join(over)
            + "\nreduce the per-bucket batch (--batch_sizes), quantize weights "
            "(--quantized w8), or pass --allow_overbudget to try anyway "
            "(planning model: docs/perf.md round 4/5)")
    return {"params_gb": round(params_gb, 2), "rows": rows}


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
        makes restarts skip the remote compile entirely. Prints the HBM
        budget table first and refuses over-budget configs with a clear
        error instead of a mid-traffic OOM (``estimate_hbm_budget``)."""
        budget = estimate_hbm_budget(self.pipe, self.buckets, self._bucket_batch,
                                     allow_overbudget=self.cfg.allow_overbudget)
        print(f"[serve] HBM budget: {json.dumps(budget)}", flush=True)
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


class ContinuousRestoreServer(RestoreServer):
    """Step-level continuous batching (vLLM-style iteration scheduling for
    diffusion restoration — VERDICT r4 #1).

    Instead of gathering whole requests into full 30-step restores, each
    bucket keeps a RESIDENT device batch of ``batch_sizes[bucket]`` slots;
    every slot carries its own timestep index and RNG stream
    (``pipeline/slots.py``). The scheduler loop round-robins buckets, each
    tick dispatching ``tick_steps`` denoise steps for the bucket's active
    slots; finished slots are decoded (batch-1 program — only finished work
    pays decode) and refilled from the queue mid-flight. Two latency effects
    vs the whole-request batcher:

      * no admission wait: a request enters the next tick, not the next
        whole-batch boundary (at 1024² batch 1 that boundary is a ~9.2 s
        restore);
      * bounded head-of-line blocking across buckets: a 512² request behind
        a 1024² restore waits one tick (~tick_steps × step), not the whole
        30-step program.

    The slot math is exact — a slot's trajectory is bitwise-identical to a
    single-request run of the staged sampler (tests/test_slots.py), so this
    is a scheduling change, not an approximation. Decoded results are handed
    to a completer thread as device arrays; the scheduler thread never
    blocks on a device fetch.
    """

    def __init__(self, pipe, encode_fn: Callable, cfg: ServeConfig = ServeConfig()):
        super().__init__(pipe, encode_fn, cfg)
        from instantir_tpu.pipeline.slots import SlotSampler

        self.samplers: Dict[int, SlotSampler] = {
            r: SlotSampler(pipe, self.restore_cfg, r, self._bucket_batch[r])
            for r in self.buckets
        }
        self._states: Dict[int, object] = {}
        self._payload_template: Dict[int, object] = {}
        self._slot_reqs: Dict[int, List[Optional[_Request]]] = {
            r: [None] * self._bucket_batch[r] for r in self.buckets
        }
        self._host_steps: Dict[int, List[int]] = {
            r: [0] * self._bucket_batch[r] for r in self.buckets
        }
        self.ticks_run = 0
        self._complete_q: "queue.Queue" = queue.Queue()
        self._completer = threading.Thread(target=self._complete_loop,
                                           name="restore-completer", daemon=True)

    # -- lifecycle ---------------------------------------------------------

    def start(self, warmup: bool = True):
        if warmup:
            self.warmup()
            self.batches_run = 0
            self.requests_served = 0
            self._request_latencies.clear()
            self._batch_seconds.clear()
        self._completer.start()
        self._worker.start()
        return self

    def warmup(self):
        """Compile every slot program (prelude, step — both traced branches
        compile at trace time — insert, extract, batch-1 decode) per bucket,
        then reset to empty states. Budget-gated like the whole-request
        server."""
        import jax
        import jax.numpy as jnp

        budget = estimate_hbm_budget(self.pipe, self.buckets, self._bucket_batch,
                                     allow_overbudget=self.cfg.allow_overbudget)
        print(f"[serve] HBM budget: {json.dumps(budget)}", flush=True)
        pe, pooled = self._embeds([DEFAULT_PROMPT])
        npe, npooled = self._embeds([DEFAULT_NEG_PROMPT])
        for r in self.buckets:
            s = self.samplers[r]
            payload = s.prelude(
                jnp.zeros((1, r, r, 3), jnp.float32),
                jnp.asarray(pe), jnp.asarray(pooled),
                jnp.asarray(npe), jnp.asarray(npooled),
                jax.random.PRNGKey(0),
            )
            state = s.insert(s.empty_state(payload), payload, 0)
            state = s.step(state)
            _ = np.asarray(s.extract_decode(state, 0))  # forced fetch = compiled
            self._states[r] = s.empty_state(payload)
            self._payload_template[r] = jax.tree.map(jnp.zeros_like, payload)

    def stop(self):
        super().stop()
        self._complete_q.put(None)
        if self._completer.is_alive():
            self._completer.join(timeout=60)

    # -- scheduler ---------------------------------------------------------

    def _refill(self, r: int) -> bool:
        """Admit queued requests into free slots of bucket ``r``."""
        import jax
        import jax.numpy as jnp

        import jax
        import jax.numpy as jnp

        s = self.samplers[r]
        admitted = False
        for slot in range(self._bucket_batch[r]):
            if self._slot_reqs[r][slot] is not None:
                continue
            try:
                req = self._queues[r].get_nowait()
            except queue.Empty:
                break
            try:
                pe, pooled = self._embeds([req.prompt])
                npe, npooled = self._embeds([req.neg_prompt])
                with self._lock:
                    self._key, sub = jax.random.split(self._key)
                payload = s.prelude(
                    jnp.asarray(req.image[None]),
                    jnp.asarray(pe), jnp.asarray(pooled),
                    jnp.asarray(npe), jnp.asarray(npooled), sub,
                )
                if r not in self._states:  # start(warmup=False) path
                    self._states[r] = s.empty_state(payload)
                    self._payload_template[r] = jax.tree.map(jnp.zeros_like, payload)
                self._states[r] = s.insert(self._states[r], payload, slot)
            except BaseException as e:  # fail THIS request; the batch survives
                req.error = e
                req.done.set()
                continue
            self._slot_reqs[r][slot] = req
            self._host_steps[r][slot] = 0
            admitted = True
        return admitted

    def _run(self):
        import numpy as _np

        while not self._stop.is_set():
            progressed = False
            for r in self.buckets:
                s = self.samplers[r]
                self._refill(r)
                active = [i for i, q_ in enumerate(self._slot_reqs[r]) if q_ is not None]
                if not active:
                    continue
                remaining = max(s.n_steps - self._host_steps[r][i] for i in active)
                k = min(self.cfg.tick_steps, remaining)
                t0 = time.monotonic()
                try:
                    st = self._states[r]
                    for _ in range(k):
                        st = s.step(st)
                    self._states[r] = st
                    # pacing sync: bounds the host's dispatch lead to one tick
                    # and checks the device agrees with host-side accounting
                    idx = _np.asarray(st.step_idx)
                    self.ticks_run += 1
                    self._batch_seconds.append(time.monotonic() - t0)
                    for i in active:
                        self._host_steps[r][i] = min(self._host_steps[r][i] + k, s.n_steps)
                        if idx[i] != self._host_steps[r][i]:
                            raise RuntimeError(
                                f"device step_idx {idx[i]} != host {self._host_steps[r][i]}")
                        if self._host_steps[r][i] >= s.n_steps:
                            req = self._slot_reqs[r][i]
                            img = s.extract_decode(self._states[r], i)  # async dispatch
                            self._slot_reqs[r][i] = None
                            self.requests_served += 1
                            self._complete_q.put((req, img))
                except BaseException as e:
                    for i in active:
                        req = self._slot_reqs[r][i]
                        if req is not None:
                            req.error = e
                            req.done.set()
                            self._slot_reqs[r][i] = None
                    # state buffers were donated mid-step: rebuild from the
                    # zero payload template (or lazily on the next refill)
                    if r in self._payload_template:
                        self._states[r] = s.empty_state(self._payload_template[r])
                    else:
                        self._states.pop(r, None)
                    self._host_steps[r] = [0] * self._bucket_batch[r]
                    continue
                progressed = True
            if not progressed:
                if self._closing.is_set() and not self._pending():
                    return
                try:
                    self._notify.get(timeout=0.05)
                except queue.Empty:
                    pass

    def _pending(self) -> bool:
        return any(q.qsize() for q in self._queues.values()) or any(
            req is not None for reqs in self._slot_reqs.values() for req in reqs
        ) or not self._complete_q.empty()

    def _complete_loop(self):
        """Fetch decoded device arrays and fulfil requests — off the
        scheduler thread, so stepping never waits on decode/postprocess."""
        from PIL import Image

        while True:
            item = self._complete_q.get()
            if item is None:
                return
            req, arr = item
            try:
                out = np.asarray(arr.astype("float32"))[0]
                img = ((np.clip(out, -1, 1) + 1) * 127.5).astype(np.uint8)
                if (img.shape[1], img.shape[0]) != req.out_size:
                    img = np.asarray(Image.fromarray(img).resize(req.out_size, Image.LANCZOS))
                req.result = img
            except BaseException as e:
                req.error = e
            if req.t_submit:
                self._request_latencies.append(time.monotonic() - req.t_submit)
            req.done.set()

    def stats(self) -> Dict:
        s = super().stats()
        s["mode"] = "continuous"
        s["tick_steps"] = self.cfg.tick_steps
        s["ticks_run"] = self.ticks_run
        s["slot_occupancy"] = {
            str(r): sum(1 for q_ in reqs if q_ is not None)
            for r, reqs in self._slot_reqs.items()
        }
        return s


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
    p.add_argument("--continuous", action="store_true",
                   help="step-level continuous batching: resident slot batch per "
                   "bucket, per-slot timesteps, mid-flight refill — cuts the "
                   "whole-request batcher's head-of-line latency (docs/perf.md "
                   "round 5). Exact schedule only (no --deepcache_interval)")
    p.add_argument("--tick_steps", type=int, default=5,
                   help="with --continuous: denoise steps dispatched between "
                   "scheduler decisions (admission/finish cadence)")
    p.add_argument("--allow_overbudget", action="store_true",
                   help="skip the fail-fast HBM budget check at warmup")
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

        if args.continuous:
            raise SystemExit("--continuous does not compose with --mesh yet; "
                             "scale continuous serving with one server process "
                             "per chip (pipeline/slots.py)")
        mesh = make_mesh(model_parallel=args.model_parallel)
        # per-bucket batches must divide the data axis, or warmup dies later
        # with an opaque sharding error (ADVICE r4): validate up front
        data_size = dict(mesh.shape).get("data", 1)
        buckets = tuple(sorted(int(r) for r in args.resolutions.split(","))) if args.resolutions else (args.resolution,)
        batches = tuple(int(b) for b in args.batch_sizes.split(",")) if args.batch_sizes else (args.batch_size,) * len(buckets)
        for r, b in zip(buckets, batches):
            if b % data_size:
                raise SystemExit(
                    f"--mesh: bucket {r}² batch {b} does not divide the mesh data "
                    f"axis ({data_size} devices); adjust --batch_sizes/--batch_size")
        pipe.shard(mesh)
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
        continuous=args.continuous, tick_steps=args.tick_steps,
        allow_overbudget=args.allow_overbudget,
    )
    server_cls = ContinuousRestoreServer if args.continuous else RestoreServer
    server = server_cls(pipe, encode, cfg).start(warmup=True)
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
