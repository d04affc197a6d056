"""Attention ops: Pallas TPU flash attention + XLA reference path.

The reference runs every attention through ``F.scaled_dot_product_attention``
(e.g. ``module/ip_adapter/attention_processor.py:1165-1167``). Here the hot
self-attention (up to 4096 tokens at 1024², 8192 for the Aggregator's
H-concat) runs a blocked online-softmax Pallas kernel sized for VMEM; short
cross-attention (77 text + 64 image tokens) stays on the fused XLA path where
a flash schedule has nothing to hide.

Layout convention: ``[batch, seq, heads, head_dim]`` (BSHD) at module level;
kernels fold batch×heads.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# --- sequence-parallel (ring attention) scope -------------------------------
#
# SURVEY §5's long-context stretch goal: at ≥2K² inputs the UNet's largest
# self-attention passes 16K tokens (and the aggregator's H-concat doubles it)
# — past what one chip should hold. ``sequence_parallel_scope`` arms a
# trace-time switch: while active, ``dot_product_attention`` routes SELF-
# attention whose sequence meets the threshold (and divides the mesh axis)
# through ``parallel.ring_attention`` — K/V shards rotating over the ICI ring
# via ppermute, exact online-softmax merge, O(S/n) memory per chip. The scope
# only matters during TRACING: the pipeline activates it around the jit of a
# ``RestoreConfig(sequence_parallel=True)`` sampler, so the ring collectives
# are baked into that config's compiled program and cached per-config.

_SP_SCOPE: list = []


@contextlib.contextmanager
def sequence_parallel_scope(mesh, axis: str = "data", min_seq: int = 8192):
    _SP_SCOPE.append((mesh, axis, int(min_seq)))
    try:
        yield
    finally:
        _SP_SCOPE.pop()


# --- tensor-parallel flash scope ---------------------------------------------
#
# Under the TP layout (parallel/tp.py) attention q/k/v arrive head-sharded
# over the 'model' axis. XLA partitions its own einsums on the head dim for
# free, but a pallas_call is an opaque custom call with no sharding rule —
# GSPMD falls back to all-gathering the operands and running the FULL
# attention replicated on every chip (verified on the virtual mesh), which
# silently forfeits TP's latency win for the ~26%-of-step attention cost.
# While this scope is active, the flash path instead runs under shard_map:
# each chip executes the Pallas kernel on its local heads (and local batch
# rows when the batch divides the 'data' axis) — zero attention collectives.

_TP_SCOPE: list = []


@contextlib.contextmanager
def tensor_parallel_scope(mesh, axis: str = "model"):
    _TP_SCOPE.append((mesh, axis))
    try:
        yield
    finally:
        _TP_SCOPE.pop()


def _tp_flash(q, k, v, scale, mesh, axis, interpret=False):
    """Flash attention with heads (and batch, when divisible) shard_mapped."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    data_ok = (
        "data" in mesh.shape and mesh.shape["data"] > 1 and q.shape[0] % mesh.shape["data"] == 0
    )
    spec = P("data" if data_ok else None, None, axis, None)

    def local(q, k, v):
        return _flash_diff(q, k, v, scale, interpret)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # metadata, and the kernel is trivially per-shard (no collectives inside)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference attention, fp32 softmax. q/k/v: [B, S, H, D] → [B, Sq, H, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out_dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


_LOG2E = 1.4426950408889634

# Dispatch threshold between the two kernel structures (measured, round 5):
# the RESIDENT kernels keep the full K/V (or Q) block in VMEM with the
# softmax state in registers — fastest at the InstantIR operating points
# (S4096: 81 vs 67 TF/s for the streamed form; S8192: parity at ~74-75) but
# capped by the 16 MB scoped-VMEM budget somewhere between 16K and 32K
# tokens (the 2048² H-concat wall, docs/perf.md round 4). The STREAMED
# kernels walk K/V (or Q) blocks through the grid's innermost sequential
# dimension with the accumulators in VMEM scratch — O(block) scoped VMEM at
# ANY sequence. Dispatch is static per shape: resident at ≤8192 (the proven
# regime), streamed beyond (unbounded sequence support).
RESIDENT_MAX_SEQ = 8192


def _flash_kernel_resident(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, kv_len: int):
    """Resident-K/V forward: softmax state carried in registers through a
    fori sweep over K/V already resident in VMEM (see RESIDENT_MAX_SEQ)."""
    q = q_ref[0]  # [block_q, d]
    block_q, d = q.shape
    num_kv = kv_len // block_k
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    m = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, d), dtype=jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale: float):
    # The kernel is VPU(softmax)-bound, not MXU-bound (the d=64 heads leave
    # the matmuls cheap relative to the exp/max/sum passes over the [bq, bk]
    # score tile), so every full-tile VPU pass counts:
    #   * scale·log2e is folded into the q block ONCE ([bq, d], trivial) so
    #     the per-tile scale multiply disappears and exp becomes a bare exp2
    #     (the hardware exponential; exp(x) = exp2(x·log2e));
    #   * matmul inputs stay in their native dtype (bf16 in production) with
    #     fp32 MXU accumulation — the XLA reference path's exact semantics;
    #   * large k-blocks (default min(kv, 4096)) minimize the per-iteration
    #     rescale/bookkeeping passes.
    # Measured: 1.31→1.12 ms at S=4096 and 5.78→4.5 ms at S=8192 (docs/perf.md).
    #
    # K/V STREAM through the grid's innermost dimension (round 5): each
    # program sees ONE [block_k, d] K/V block while the fp32 running
    # (max, sum, acc) state lives in VMEM scratch that persists across the
    # sequential kv grid steps — scoped VMEM is O(block_k), not O(S), so the
    # sequence length is unbounded (the resident-K/V design hit the 16 MB
    # scoped-vmem wall at the 32K-token 2048² H-concat attention;
    # docs/perf.md round 4). Mosaic double-buffers the K/V block DMAs across
    # grid steps, so streaming adds no stalls at the measured block sizes.
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, d]
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    k = k_ref[0]  # [block_k, d]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k] fp32, log2-domain logits
    m = m_ref[...]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m - m_new)
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _pick_block(n: int, preferred: int) -> int:
    b = min(preferred, n)
    while n % b:
        b //= 2
    return max(b, 1)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blocked online-softmax attention. q/k/v: [B, S, H, D] → [B, Sq, H, D].

    Hybrid dispatch (static per shape, see RESIDENT_MAX_SEQ): at the
    InstantIR operating points (≤8192 tokens) K/V stay VMEM-resident with
    register-carried softmax state — the fastest measured form. Beyond that
    the K/V blocks STREAM through the grid's innermost sequential dimension
    with the fp32 running max/sum/acc state in VMEM scratch — scoped VMEM
    becomes O(block), independent of sequence length, removing the 16 MB
    scoped-vmem wall the 2048² 32K-token H-concat probe hit (docs/perf.md
    rounds 4-5). Large k-blocks measured fastest at these lengths (the
    kernel is softmax-bound; fewer blocks = fewer rescale passes): the
    [256, 4096] fp32 score tile costs 4 MB of VMEM.
    """
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    if scale is None:
        scale = d**-0.5
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(kv_len, block_k)

    # Fold batch and heads; kernels see [1, s, d] blocks.
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)

    if kv_len <= RESIDENT_MAX_SEQ:
        kernel = functools.partial(
            _flash_kernel_resident, scale=scale, block_k=block_k, kv_len=kv_len)
        out = pl.pallas_call(
            kernel,
            grid=(b * h, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            interpret=interpret,
        )(qf, kf, vf)
        return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)

    kernel = functools.partial(_flash_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        # kv blocks stream through the innermost (sequential) grid dim; the
        # q/o blocks' index maps ignore it, so they stay VMEM-resident
        # across the whole kv sweep while scratch carries the softmax state
        grid=(b * h, sq // block_q, kv_len // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _flash_fwd_lse_kernel_resident(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, block_k: int, kv_len: int):
    """Resident-K/V forward with logsumexp output (see RESIDENT_MAX_SEQ)."""
    q = q_ref[0]
    block_q, d = q.shape
    num_kv = kv_len // block_k
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    m = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, d), dtype=jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # log2-domain lse (see the streamed kernel's note)
    lse_ref[0] = m + jnp.log2(l)


def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, scale: float):
    """Forward that also writes the per-row logsumexp (needed by the backward
    to reconstruct P without a second online softmax). Same K/V-streaming
    grid + scratch-carry structure as ``_flash_kernel``."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # log2-domain trick + native-dtype matmuls, see _flash_kernel
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    m = m_ref[...]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m - m_new)
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        # lse is stored in the log2 domain (lse2 = log2 Σ exp2(s2) with s2 =
        # scale·log2e·s); the backward kernels reconstruct p = exp2(s2 − lse2).
        lse_ref[0] = m_ref[...] + jnp.log2(l_ref[...])  # [block_q, 1]


def _flash_bwd_dq_kernel_resident(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, scale: float, block_k: int, kv_len: int
):
    """Resident-K/V dQ (see RESIDENT_MAX_SEQ)."""
    q = q_ref[0]
    do = do_ref[0]
    block_q, d = q.shape
    q2 = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    lse = lse_ref[0]
    delta = delta_ref[0]
    num_kv = kv_len // block_k

    def body(j, acc):
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k.dtype)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel_resident(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, scale: float, block_q: int, q_len: int
):
    """Resident-Q dK/dV (see RESIDENT_MAX_SEQ)."""
    k = k_ref[0]
    v = v_ref[0]
    block_k, d = k.shape
    k2 = (k.astype(jnp.float32) * (scale * _LOG2E)).astype(k.dtype)
    num_q = q_len // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, :, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, :, pl.ds(i * block_q, block_q)]
        s_t = jax.lax.dot_general(k2, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p_t = jnp.exp2(s_t - lse)
        dv = dv + jax.lax.dot_general(
            p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds_t = (p_t * (dp_t - delta)).astype(q.dtype)
        dk = dk + jax.lax.dot_general(
            ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, num_q, body, (jnp.zeros((block_k, d), jnp.float32), jnp.zeros((block_k, d), jnp.float32))
    )
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref, *, scale: float
):
    """dQ_i = scale · Σ_j [P_ij ∘ (dO_i·V_jᵀ − D_i)] K_j  (FlashAttention-2)."""
    # Same VPU-pass economies as the forward: scale·log2e folded into the q
    # block, p reconstructed with a bare exp2 from the log2-domain lse,
    # native-dtype matmul inputs with fp32 accumulation; P/dS are rounded to
    # the K/V dtype before their matmuls, matching the XLA einsum autodiff.
    # K/V stream through the innermost grid dim with the dq accumulator in
    # scratch — O(block_k) scoped VMEM at any sequence (see _flash_kernel).
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    do = do_ref[0]
    q2 = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    lse = lse_ref[0]  # [block_q, 1], log2 domain
    delta = delta_ref[0]  # [block_q, 1]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(k.dtype)
    acc_ref[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float
):
    """dV_j = Σ_i P_ijᵀ dO_i ;  dK_j = scale · Σ_i [P ∘ (dP − D)]ᵀ_ij Q_i.

    Q/dO/lse/delta stream through the innermost grid dim (the K/V block and
    the dk/dv scratch accumulators stay resident) — the mirror image of the
    dq kernel's K/V streaming, O(block_q) scoped VMEM at any q length."""
    qq = pl.program_id(2)

    @pl.when(qq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[0]  # native dtype; log2-domain p (see _flash_bwd_dq_kernel)
    v = v_ref[0]
    k2 = (k.astype(jnp.float32) * (scale * _LOG2E)).astype(k.dtype)
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # [1, block_q], log2 domain
    delta = delta_ref[0]  # [1, block_q]
    # s_t[j, i] = scale·log2e · k_j · q_i
    s_t = jax.lax.dot_general(k2, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p_t = jnp.exp2(s_t - lse)
    dv_acc[...] += jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds_t = (p_t * (dp_t - delta)).astype(q.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qq == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_forward_lse(q, k, v, scale, block_q=256, block_k=4096, interpret=False):
    """Like ``flash_attention`` but also returns the logsumexp rows
    ([B·H, Sq], fp32) for the custom VJP."""
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(kv_len, block_k)

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)

    if kv_len <= RESIDENT_MAX_SEQ:
        kernel = functools.partial(
            _flash_fwd_lse_kernel_resident, scale=scale, block_k=block_k, kv_len=kv_len)
        out, lse = pl.pallas_call(
            kernel,
            grid=(b * h, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
                jax.ShapeDtypeStruct((b * h, sq, 1), jnp.float32),
            ),
            interpret=interpret,
        )(qf, kf, vf)
        return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3), lse

    kernel = functools.partial(_flash_fwd_lse_kernel, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, sq // block_q, kv_len // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            # trailing singleton keeps the block's last-two dims Mosaic-legal
            # ((block_q, 1): block_q | 8, 1 == array dim)
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3), lse


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_backward(q, k, v, o, lse, g, scale, block_q=512, block_k=1024, interpret=False):
    """Pallas dq/dk/dv kernels (no O(S²) materialization — VERDICT r1 #4).

    Block defaults from an on-chip sweep (same softmax-bound logic as the
    forward: bigger tiles = fewer bookkeeping passes): 512/1024 measured
    fastest at 4096/8192 tokens with ~7 MB scoped VMEM; 1024-wide grid tiles
    with 1024-deep loops OOM the 16 MB scoped-vmem budget at 8192 tokens."""
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(kv_len, block_k)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf, of, gf = fold(q), fold(k), fold(v), fold(o), fold(g)
    # D_i = Σ_d dO_i·O_i — cheap elementwise+reduce, left to XLA. lse arrives
    # as [B·H, Sq, 1] (the dq layout); the dk/dv kernel reads the transposed
    # [B·H, 1, Sq] view so neither kernel transposes internally.
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1, keepdims=True)

    if max(kv_len, sq) <= RESIDENT_MAX_SEQ:
        dq_kernel = functools.partial(
            _flash_bwd_dq_kernel_resident, scale=scale, block_k=block_k, kv_len=kv_len)
        dq = pl.pallas_call(
            dq_kernel,
            grid=(b * h, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            interpret=interpret,
        )(qf, kf, vf, gf, lse, delta)

        lse_t = lse.reshape(b * h, 1, sq)
        delta_t = delta.reshape(b * h, 1, sq)
        dkv_kernel = functools.partial(
            _flash_bwd_dkv_kernel_resident, scale=scale, block_q=block_q, q_len=sq)
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid=(b * h, kv_len // block_k),
            in_specs=[
                pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b * h, kv_len, d), k.dtype),
                jax.ShapeDtypeStruct((b * h, kv_len, d), v.dtype),
            ),
            interpret=interpret,
        )(qf, kf, vf, gf, lse_t, delta_t)

        def unfold_r(x):
            return x.reshape(b, h, x.shape[1], d).transpose(0, 2, 1, 3)

        return unfold_r(dq), unfold_r(dk), unfold_r(dv)

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, scale=scale)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h, sq // block_q, kv_len // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)

    lse_t = lse.reshape(b * h, 1, sq)
    delta_t = delta.reshape(b * h, 1, sq)
    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, scale=scale)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, kv_len // block_k, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, qq: (i, qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, qq: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, qq: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j, qq: (i, qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j, qq: (i, 0, qq), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j, qq: (i, 0, qq), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, j, qq: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, qq: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, kv_len, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, kv_len, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse_t, delta_t)

    def unfold(x):
        return x.reshape(b, h, x.shape[1], d).transpose(0, 2, 1, 3)

    return unfold(dq), unfold(dk), unfold(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_diff(q, k, v, scale, interpret=False):
    return flash_attention(q, k, v, scale=scale, interpret=interpret)


def _flash_fwd(q, k, v, scale, interpret):
    o, lse = _flash_forward_lse(q, k, v, scale, interpret=interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, o, lse, g, scale, interpret=interpret)


_flash_diff.defvjp(_flash_fwd, _flash_bwd)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Dispatching attention: Pallas flash on TPU for long sequences, XLA else.

    The flash path has no bias support (none is needed in the InstantIR
    compute graph). It is differentiable end-to-end in Pallas: the custom VJP
    runs blocked dq and dk/dv kernels from the saved logsumexp (FlashAttention-2
    backward) — no O(S²) score materialization in either direction, which is
    what makes 1024² (8192-token aggregator) training steps feasible.
    """
    kv_len = k.shape[1]
    if _SP_SCOPE and bias is None and q.shape[1] == kv_len:
        # self-attention inside a sequence-parallel scope: ring it when the
        # sequence meets the threshold and divides the mesh axis (cross/ip
        # attention and external-KV concat never satisfy q_len == kv_len)
        mesh, axis, min_seq = _SP_SCOPE[-1]
        if kv_len >= min_seq and kv_len % mesh.shape[axis] == 0:
            from instantir_tpu.parallel.ring_attention import ring_attention

            return ring_attention(q, k, v, mesh, axis=axis, scale=scale)
    on_tpu = jax.default_backend() == "tpu"
    if use_flash and bias is None and on_tpu and kv_len >= 512 and q.shape[1] >= 128:
        scale_v = q.shape[-1] ** -0.5 if scale is None else scale
        if _TP_SCOPE:
            mesh, axis = _TP_SCOPE[-1]
            if mesh.shape[axis] > 1 and q.shape[2] % mesh.shape[axis] == 0:
                return _tp_flash(q, k, v, scale_v, mesh, axis)
        return _flash_diff(q, k, v, scale_v)
    return attention_xla(q, k, v, scale=scale, bias=bias)
