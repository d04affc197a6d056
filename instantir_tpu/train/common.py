"""Shared training infrastructure: optimizer masking, EMA, LR schedules,
checkpoint/resume, logging.

TPU-native replacements for the reference's accelerate machinery:
  * parameter-subset training (the reference's ``seperate_ip_params_from_unet``
    / ``seperate_lora_params_from_unet``, ``utils/train_utils.py:286-308``)
    becomes ``optax.masked`` over path predicates — the untrained majority of
    the tree gets ``set_to_zero``, so optimizer state is tiny;
  * EMA adapter copies (``train_stage2_aggregator.py:892-918``) are plain
    parameter pytrees updated functionally;
  * ``accelerator.save_state`` + resume-latest scanning ``checkpoint-*`` dirs
    (``train_stage1_adapter.py:1054-1078``) maps to orbax checkpoints with
    the same directory convention and total-limit GC;
  * trackers → tensorboardX.
"""

from __future__ import annotations

import dataclasses
import os
import re
import shutil
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# parameter selection
# ---------------------------------------------------------------------------


def path_contains(*needles: str) -> Callable:
    """Predicate on a flattened param path: any component contains a needle."""

    def pred(path: Tuple[str, ...]) -> bool:
        joined = "/".join(str(p) for p in path)
        return any(n in joined for n in needles)

    return pred


IP_PARAM_PRED = path_contains("to_k_ip", "to_v_ip", "ln_k_ip", "ln_v_ip")
LORA_PARAM_PRED = path_contains("lora_a", "lora_b")


def _path_str(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        out.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return tuple(out)


def trainable_mask(params: Any, pred: Callable) -> Any:
    """Boolean pytree: True where ``pred(path)``."""
    return jax.tree_util.tree_map_with_path(lambda path, _: bool(pred(_path_str(path))), params)


def partition_params(params: Dict, pred: Callable) -> Tuple[Dict, Dict]:
    """Split a nested param dict into (trainable, frozen) flat dicts by path
    predicate. Gradients are then taken w.r.t. the trainable dict only — the
    frozen majority never enters the backward pass's parameter cotangents."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if pred(tuple(str(p) for p in k))}
    frozen = {k: v for k, v in flat.items() if k not in trainable}
    return trainable, frozen


def merge_params(*flat_dicts: Dict) -> Dict:
    from flax.traverse_util import unflatten_dict

    merged = {}
    for d in flat_dicts:
        merged.update(d)
    return unflatten_dict(merged)


def masked_optimizer(tx: optax.GradientTransformation, mask: Any) -> optax.GradientTransformation:
    """Apply ``tx`` only where mask is True; zero updates elsewhere."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask),
    )


def count_params(params: Any, mask: Optional[Any] = None) -> int:
    leaves = jax.tree_util.tree_leaves(params)
    if mask is None:
        return int(sum(np.prod(l.shape) for l in leaves))
    mleaves = jax.tree_util.tree_leaves(mask)
    return int(sum(np.prod(l.shape) for l, m in zip(leaves, mleaves) if m))


# ---------------------------------------------------------------------------
# data parallelism
# ---------------------------------------------------------------------------


def resolve_mesh(mesh, batch_size: int):
    """Resolve a trainer's mesh argument.

    ``None`` → single device. An explicit ``jax.sharding.Mesh`` is returned
    as-is (batch must divide its data axis). ``"auto"`` (the default in every
    trainer — the analogue of ``accelerator.prepare``'s implicit DDP wrap,
    ``train_stage2_aggregator.py:1285-1287``) builds a data-parallel mesh over
    the largest local device count that divides the batch size.
    """
    if mesh is None:
        return None
    if mesh != "auto":
        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"train_batch_size={batch_size} not divisible by mesh data axis {mesh.shape['data']}"
            )
        return mesh
    from instantir_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    d = next((k for k in range(min(n, batch_size), 0, -1) if batch_size % k == 0), 1)
    if d <= 1:
        return None
    return make_mesh(num_devices=d)


def shard_or_keep(tree: Any, mesh) -> Any:
    """Shard every leaf along its leading (batch) axis when a mesh is active."""
    if mesh is None:
        return tree
    from instantir_tpu.parallel.mesh import shard_batch

    return shard_batch(tree, mesh)


def replicate_or_keep(tree: Any, mesh) -> Any:
    if mesh is None or tree is None:
        return tree
    from instantir_tpu.parallel.mesh import replicate_params

    return replicate_params(tree, mesh)


def run_degradation(degradation, key, images, kernels, *, jit_mode: bool, host_rng):
    """Degrade a batch via the single-program traced chain when possible.

    The eager chain issues ~10² individually-dispatched device ops with fresh
    host randomness per step — a structural loss on a remote-relay TPU where
    each dispatch costs 25-90 ms of host time. ``jit_mode`` (every trainer's
    default) uses ``RealESRGANDegradation.traced_call``: one compiled program,
    all random choices traced from ``key``. Falls back to the eager chain when
    the input shape doesn't meet the traced path's static-canvas requirement
    (H, W multiples of 16·sf — tiny test geometries)."""
    if jit_mode:
        h, w = images.shape[1], images.shape[2]
        mult = 16 * degradation.degrade_opt["sf"]
        if h % mult == 0 and w % mult == 0:
            return degradation.jitted()(key, images, kernels)
    return degradation(key, images, kernels=kernels, host_rng=host_rng)


def pipelined_batches(trainer, data_iter, cond, key, max_steps: int, depth: int):
    """Host-pipelined batch preparation (opt-in ``prefetch_batches=N``).

    A single worker thread runs the per-step HOST path ahead of the train
    loop: ``next(data_iter)`` (loader + recipe host work), caption-cond
    encoding, and ``prepare_batch`` (host→device upload + the jitted
    degradation dispatch). With depth N, the host work and upload of batch
    n+k overlap the device's execution of step n — on a remote-relay TPU the
    upload alone is ~12 MB/batch of blocking host time (docs/perf.md round
    4); the device-side degradation program still serializes with the train
    step on a single chip, as it must.

    Determinism: the worker advances its own ``(key → k_deg, k_step)`` split
    chain and passes the explicit step index into ``prepare_batch``, so the
    produced (recipe, noise, step-key) sequence is IDENTICAL to the
    sequential loop's (tests/test_prefetch.py pins equality). On early exit
    (preemption, validation abort) up to ``depth`` look-ahead items from
    ``data_iter`` are consumed and discarded — acceptable for stream-style
    training data.

    Yields ``(batch, k_step)`` pairs; the caller keeps running its own
    step/log/checkpoint bookkeeping. JAX dispatch is thread-safe; the worker
    holds no trainer mutable state (it reads ``prepare_batch`` explicitly
    parameterized by step).
    """
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    start_step = trainer.global_step

    def put_checked(item):
        """Bounded-queue put that gives up when the consumer is gone —
        a plain blocking put here would leave the daemon worker stuck
        forever holding up to ``depth`` prepared device batches in HBM
        if the consumer exits early (preemption, validation break)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return
            except _queue.Full:
                continue

    def work():
        k = key
        step = start_step
        try:
            while step < max_steps and not stop.is_set():
                k, k_deg, k_step = jax.random.split(k, 3)
                host_batch = next(data_iter)
                batch_cond = cond(host_batch) if callable(cond) else cond
                put_checked((trainer.prepare_batch(host_batch, batch_cond, k_deg, step=step), k_step))
                step += 1
            put_checked(None)
        except StopIteration:
            put_checked(None)  # data exhausted: end the loop, don't crash it
        except BaseException as e:  # surface worker failures in the consumer
            put_checked(e)

    worker = threading.Thread(target=work, daemon=True, name="batch-prefetch")
    worker.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def shard_opt_or_keep(tree: Any, mesh, zero1: bool = True) -> Any:
    """Optimizer-state placement: ZeRO-1 sharded over ``data`` (default) or
    replicated. The reference has no equivalent (accelerate DDP replicates
    everything); SURVEY §2.3 reserves this as the pjit-native upgrade."""
    if mesh is None or tree is None:
        return tree
    if not zero1:
        return replicate_or_keep(tree, mesh)
    from instantir_tpu.parallel.mesh import zero1_shard

    return zero1_shard(tree, mesh)


def unique_buffers(tree: Any) -> Any:
    """Give every leaf its own device buffer (one jitted dispatch).

    jax's constant cache can alias equal leaves — e.g. two same-shaped
    zero-init kernels share one buffer — and donating such a tree fails with
    "attempt to donate the same buffer twice". The add-zero keeps the jaxpr
    from the identity fast path; XLA writes each output to a fresh
    allocation."""
    if tree is None:
        return None
    return jax.jit(
        lambda t: jax.tree_util.tree_map(lambda x: x + jnp.zeros((), x.dtype), t)
    )(tree)


def replicate_constraint(tree: Any, mesh) -> Any:
    """Inside-jit constraint pinning every leaf replicated (the updated
    parameters come back replicated even when the optimizer state is ZeRO-1
    sharded — classic ZeRO-1: shard moments, all-gather the deltas)."""
    if mesh is None:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(lambda x: jax.lax.with_sharding_constraint(x, sharding), tree)


# ---------------------------------------------------------------------------
# EMA
# ---------------------------------------------------------------------------


def ema_update(ema: Any, new: Any, decay: float) -> Any:
    """Functional EMA: ema·d + new·(1−d) (reference ``update_ema_model``,
    ``train_stage2_aggregator.py:719-722``)."""
    return jax.tree_util.tree_map(lambda e, n: e * decay + n.astype(e.dtype) * (1.0 - decay), ema, new)


def subset_params(params: Any, mask: Any) -> Any:
    """Zero out everything not selected (for EMA of adapter-only subtrees the
    full-tree EMA with a mask predicate is simpler; kept for API symmetry)."""
    return jax.tree_util.tree_map(lambda p, m: p if m else jnp.zeros_like(p), params, mask)


def masked_ema_update(ema: Any, new: Any, mask: Any, decay: float) -> Any:
    """EMA only on masked leaves; others track ``new`` exactly."""
    return jax.tree_util.tree_map(
        lambda e, n, m: e * decay + n.astype(e.dtype) * (1.0 - decay) if m else n, ema, new, mask
    )


def swap_masked(params: Any, donor: Any, mask: Any) -> Any:
    """Take masked leaves from ``donor``, the rest from ``params`` — the
    functional analogue of the reference's EMA attn-processor swap
    (``train_stage2_aggregator.py:1535-1540``)."""
    return jax.tree_util.tree_map(lambda p, d, m: d if m else p, params, donor, mask)


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------


def lr_schedule(
    name: str, base_lr: float, warmup_steps: int = 0, total_steps: int = 1_000_000
) -> optax.Schedule:
    """constant | cosine with linear warmup (the reference uses
    ``get_scheduler('cosine'|'constant', warmup)``)."""
    if name == "constant":
        main = optax.constant_schedule(base_lr)
    elif name == "cosine":
        main = optax.cosine_decay_schedule(base_lr, max(total_steps - warmup_steps, 1))
    else:
        raise ValueError(f"unknown lr schedule {name}")
    if warmup_steps <= 0:
        return main
    # linear warmup from 0, matching HF get_scheduler (step/warmup · lr) used
    # by the reference trainers
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warmup, main], [warmup_steps])


def quantize_frozen_unet(params: Dict, keep_pred: Optional[Callable] = None) -> Dict:
    """QLoRA-style weight-only int8 storage for the FROZEN UNet during
    training (arXiv 2305.14314: quantized frozen base, fp adapters): every
    frozen LoRA-base kernel moves to an int8 ``quant`` side tree
    (``kernel_qw``) that the layers dequantize at use — an ordinary bf16 op,
    exactly differentiable w.r.t. activations, so gradients still flow
    through the frozen UNet to whatever trains upstream (the stage-2
    aggregator). Cuts the 5.15 GB bf16 UNet to ~2.6 GB — the difference
    between single-chip SDXL-scale stage-2 OOMing by ~0.5 GB and fitting
    (docs/perf.md round 4). ``keep_pred`` (a trainable-path predicate over
    full ``("unet", ...)`` paths) keeps TRAINED kernels — the ip
    projections — out of the int8 tree; the EMA-adapter partition therefore
    still sees only fp leaves.

    HBM note: this returns NEW trees; the replaced bf16 base kernels only
    free once the CALLER's reference to the input tree drops. Scripts that
    build params and hand them to a trainer must ``del`` their own reference
    afterwards, or both copies stay resident (~9.5 GB + int8 copy → OOM on a
    16 GB chip; tools/bench_train_step.py)."""
    from instantir_tpu.ops.quant import quantize_tree

    exclude = None
    if keep_pred is not None:
        exclude = lambda path: keep_pred(("unet",) + tuple(path))  # noqa: E731
    return {**params, "unet": quantize_tree(params["unet"], weight_only=True, exclude=exclude)}


def make_adamw(
    lr: optax.Schedule | float,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    use_8bit: bool = False,
) -> optax.GradientTransformation:
    if use_8bit:
        # the reference's optional bnb.optim.AdamW8bit
        # (train_stage1_adapter.py:822-833) — blockwise int8 moments
        from instantir_tpu.train.adam8bit import adamw8bit

        tx = adamw8bit(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    else:
        tx = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


# ---------------------------------------------------------------------------
# checkpointing (orbax) with the reference's checkpoint-{step} convention
# ---------------------------------------------------------------------------


_PREEMPT = {"requested": False}


def install_preemption_handler() -> bool:
    """SIGTERM → request a graceful stop at the next step boundary.

    TPU preemptions (spot/maintenance events) deliver SIGTERM with a grace
    window; the trainers' run loops check :func:`preemption_requested` after
    every step and save a resumable checkpoint before exiting, so a preempted
    job loses at most one step (``--resume_from_checkpoint latest`` picks it
    up, the same recovery entry the reference uses,
    ``train_stage1_adapter.py:1054-1078`` — which has no save-on-preemption).
    Returns False (and installs nothing) off the main thread, where signal
    handlers are not allowed.
    """
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        return False

    def _handler(signum, frame):
        _PREEMPT["requested"] = True

    signal.signal(signal.SIGTERM, _handler)
    return True


def preemption_requested() -> bool:
    return _PREEMPT["requested"]


class CheckpointManager:
    """checkpoint-{step} dirs + total-limit GC + resume-latest.

    ``async_save=True`` overlaps the disk write with the following train
    steps (orbax's ``StandardCheckpointer`` is an ``AsyncCheckpointer``:
    ``save`` returns once the arrays are staged to host memory); the next
    ``save``/``restore``/``wait`` blocks until the previous write committed,
    so at most one write is in flight and GC never races an in-flight dir.
    The reference has no equivalent (``accelerator.save_state`` is
    synchronous)."""

    def __init__(self, output_dir: str, total_limit: Optional[int] = None,
                 async_save: bool = False):
        self.output_dir = output_dir
        self.total_limit = total_limit
        self.async_save = async_save
        self._ckptr = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)

    def _checkpointer(self):
        import orbax.checkpoint as ocp

        if self._ckptr is None:
            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def wait(self):
        """Block until any in-flight async write has committed."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def _ckpt_dirs(self):
        if not os.path.isdir(self.output_dir):
            return []
        dirs = [d for d in os.listdir(self.output_dir) if re.fullmatch(r"checkpoint-\d+", d)]
        return sorted(dirs, key=lambda d: int(d.split("-")[1]))

    def save(self, step: int, state: Dict[str, Any]):
        ckptr = self._checkpointer()
        ckptr.wait_until_finished()  # ≤1 write in flight; GC below is safe
        # multi-host: orbax coordinates the array writes itself (every
        # process calls save), but the app-level GC must not race — only
        # process 0 deletes (reference: accelerate's is_main_process gating,
        # train_stage1_adapter.py:1193-1216)
        if self.total_limit is not None and jax.process_index() == 0:
            dirs = self._ckpt_dirs()
            while len(dirs) >= self.total_limit:
                shutil.rmtree(os.path.join(self.output_dir, dirs.pop(0)))
        path = os.path.abspath(os.path.join(self.output_dir, f"checkpoint-{step}"))
        ckptr.save(os.path.join(path, "state"), state)
        if not self.async_save:
            ckptr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        dirs = self._ckpt_dirs()
        return int(dirs[-1].split("-")[1]) if dirs else None

    def restore(self, step: int, template: Dict[str, Any]) -> Dict[str, Any]:
        ckptr = self._checkpointer()
        ckptr.wait_until_finished()
        path = os.path.abspath(os.path.join(self.output_dir, f"checkpoint-{step}", "state"))
        try:
            return ckptr.restore(path, template)
        except BaseException as e:
            # the common layout break is the 8-bit Adam block size (round 4
            # changed 256 → 2048): turn orbax's opaque shape mismatch into
            # an actionable message (see train/adam8bit.py module docstring)
            msg = str(e)
            if "int8" in msg or "2048" in msg or "256" in msg:
                raise RuntimeError(
                    f"checkpoint-{step} failed to restore against the current "
                    f"state template ({type(e).__name__}). If it was written with "
                    "--use_8bit_adam before the block-size change (256 → 2048, "
                    "round 4), the int8 moment layout differs: resume from the "
                    "exported model weights with a fresh optimizer, or requantize "
                    "the old state (train/adam8bit.py docstring)."
                ) from e
            raise

    def resume_latest(self, template: Dict[str, Any]) -> Tuple[Optional[int], Optional[Dict[str, Any]]]:
        step = self.latest_step()
        if step is None:
            return None, None
        return step, self.restore(step, template)


# ---------------------------------------------------------------------------
# logging
# ---------------------------------------------------------------------------


class Tracker:
    """Scalar/image logging to TensorBoard (tensorboardX) and/or wandb;
    no-op without logdir.

    Multi-host: only process 0 writes (the reference's ``is_main_process``
    tracker gating, ``train_stage1_adapter.py:948-957``). ``backend`` mirrors
    the reference's ``--report_to`` choices {tensorboard, wandb}; unlike the
    reference, whose wandb branch is ``raise NotImplementedError``
    (``train_stage1_adapter.py:137-138``), the wandb backend here works when
    the package is importable and fails with a clear error otherwise."""

    def __init__(self, logdir: Optional[str], backend: str = "tensorboard",
                 project: str = "instantir_tpu", run_name: Optional[str] = None):
        self.writer = None
        self.wandb = None
        if not (logdir and jax.process_index() == 0):
            return
        if backend not in ("tensorboard", "wandb", "all"):
            raise ValueError(f"unknown tracker backend {backend!r}")
        if backend in ("tensorboard", "all"):
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(logdir)
        if backend in ("wandb", "all"):
            try:
                import wandb
            except ImportError as e:
                raise ImportError(
                    "Tracker(backend='wandb') requires the wandb package; "
                    "install it or use backend='tensorboard'") from e
            self.wandb = wandb.init(project=project, name=run_name, dir=logdir)

    def scalars(self, step: int, values: Dict[str, float]):
        if self.writer is not None:
            for k, v in values.items():
                self.writer.add_scalar(k, float(v), step)
        if self.wandb is not None:
            self.wandb.log({k: float(v) for k, v in values.items()}, step=step)

    def images(self, step: int, tag: str, images: np.ndarray):
        """images: [N, H, W, 3] in [0, 1]."""
        clipped = np.clip(images, 0, 1)
        if self.writer is not None:
            self.writer.add_images(tag, clipped, step, dataformats="NHWC")
        if self.wandb is not None:
            import wandb

            self.wandb.log({tag: [wandb.Image(im) for im in clipped]}, step=step)

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.wandb is not None:
            self.wandb.finish()


# ---------------------------------------------------------------------------
# timestep sampling
# ---------------------------------------------------------------------------


def sample_timesteps(
    key: jax.Array, batch: int, num_train_timesteps: int, importance_weights: Optional[np.ndarray] = None
) -> jnp.ndarray:
    """Uniform or importance-weighted t ~ p(t) (reference ``:648-651``)."""
    if importance_weights is None:
        return jax.random.randint(key, (batch,), 0, num_train_timesteps)
    probs = jnp.asarray(importance_weights)
    return jax.random.categorical(key, jnp.log(probs)[None].repeat(batch, 0), axis=-1)
