"""Block-quantized 8-bit AdamW (the reference's optional ``bnb.optim.AdamW8bit``,
``train_stage1_adapter.py:822-833``), TPU-native.

Adam's fp32 moments dominate optimizer memory (2×4 bytes/param — ~8 GB for
the ~1B-param aggregator). This transformation stores both moments as int8
with per-block fp32 absmax scales (bitsandbytes' blockwise linear mode and
its published block size 2048 — "8-bit Optimizers via Block-wise
Quantization", arXiv 2110.02861 §2; 1 byte/elem + 4/2048 bytes of scale, an
~8× moment-memory reduction), dequantizing/requantizing inside the jitted
update. The block size matters at the margin: fp32 scales at block 256 cost
31 MB on the ~1B-param stage-2 aggregator — the exact 25 MB by which the
single-chip 512² stage-2 step first missed the 16 GB HBM budget
(docs/perf.md round 4).
Everything is static-shape, fully vectorized, and composes with
``optax.chain``/``masked``/``MultiSteps`` like any GradientTransformation.

Unlike bitsandbytes there is no dynamic-tree quantization — blockwise linear
absmax is the published robust core (QLoRA app. A / bnb "blockwise" mode) and
keeps the kernel a pure reshape+reduce, which XLA fuses well on TPU.

Complements ZeRO-1 (``parallel/mesh.py::zero1_shard``): ZeRO divides moment
memory across chips, this shrinks it ~4× more; both together put the stage-2
aggregator's moments at ~250 MB/chip on a v5e-8.

CHECKPOINT COMPATIBILITY: ``BLOCK`` is part of the optimizer-state layout
(int8 moments are stored ``[nblocks, BLOCK]``), so checkpoints written at a
different block size cannot be restored against a fresh template — round 4
changed 256 → 2048 (bnb parity + the 25 MB HBM margin above), breaking any
pre-round-4 ``--use_8bit_adam`` checkpoints. ``restore_guard`` turns the
otherwise-opaque orbax shape mismatch into an actionable error; migration =
resume from the model weights and reinitialize the optimizer (moments are
statistics, warmup re-accumulates them in ~β₂ horizon steps), or requantize
old block-256 state offline (dequantize per ``_dequantize``, requantize per
``_quantize``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

BLOCK = 2048


def _quantize(x: jnp.ndarray):
    """Signed blockwise absmax int8 quantization (zero-preserving).
    Returns (int8 [nblocks, BLOCK], fp32 scales [nblocks, 1])."""
    flat = x.astype(jnp.float32).ravel()
    pad = (-flat.size) % BLOCK
    blocks = jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dequantize(q: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    flat = (q.astype(jnp.float32) * scale).ravel()
    return flat[: int(np.prod(shape))].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu_q: Any        # pytree of int8 [nblocks, BLOCK]
    mu_scale: Any    # pytree of fp32 [nblocks, 1]
    nu_q: Any
    nu_scale: Any


def scale_by_adam8bit(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """`optax.scale_by_adam` with int8 blockwise-quantized moment storage."""

    def init_fn(params):
        def zq(p):
            return _quantize(jnp.zeros(p.shape))

        zeros = jax.tree_util.tree_map(zq, params)
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], zeros, is_leaf=lambda x: isinstance(x, tuple)
        )
        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            mu_q=pick(0), mu_scale=pick(1), nu_q=pick(0), nu_scale=pick(1),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1

        def new_m(g, q, s):
            return b1 * _dequantize(q, s, g.shape) + (1 - b1) * g.astype(jnp.float32)

        def new_n(g, q, s):
            return b2 * _dequantize(q, s, g.shape) + (1 - b2) * jnp.square(g.astype(jnp.float32))

        m_tree = jax.tree_util.tree_map(new_m, updates, state.mu_q, state.mu_scale)
        n_tree = jax.tree_util.tree_map(new_n, updates, state.nu_q, state.nu_scale)

        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree_util.tree_map(
            lambda g, m, n: ((m / c1) / (jnp.sqrt(n / c2) + eps)).astype(g.dtype),
            updates, m_tree, n_tree,
        )
        # requantize (the second _quantize per moment CSEs away under jit)
        new_state = ScaleByAdam8bitState(
            count=count,
            mu_q=jax.tree_util.tree_map(lambda m: _quantize(m)[0], m_tree),
            mu_scale=jax.tree_util.tree_map(lambda m: _quantize(m)[1], m_tree),
            nu_q=jax.tree_util.tree_map(lambda n: _quantize(n)[0], n_tree),
            nu_scale=jax.tree_util.tree_map(lambda n: _quantize(n)[1], n_tree),
        )
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate: optax.Schedule | float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> optax.GradientTransformation:
    """Drop-in `optax.adamw` with 8-bit moment storage (AdamW8bit)."""
    return optax.chain(
        scale_by_adam8bit(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
