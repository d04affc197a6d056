"""Ring attention: sequence-parallel exact attention over the mesh ``data`` axis.

SURVEY §5's long-context stretch goal: at ≥2K² inputs the UNet's /16
self-attention reaches 16K+ tokens and the aggregator's H-concat doubles it —
past what one chip's flash pass should hold. Ring attention shards the
*sequence* across the mesh: every device keeps its Q shard resident and the
K/V shards rotate around the ICI ring (``jax.lax.ppermute``), one hop per
step, while an online-softmax accumulator merges each visiting block — exact
attention, O(S/n) memory per chip, and the K/V transfer overlaps with the
block computation XLA schedules between hops.

The reference has no counterpart (its max sequence is 8192 tokens, done
densely — SURVEY §5 "Long-context: absent"); this is the TPU-native design
for the scale the reference cannot reach.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # moved out of experimental in newer jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attention_lse(q, k, v, scale):
    """One attention block with logsumexp, fp32 accumulators.

    q: [B, Sq, H, D], k/v: [B, Sk, H, D] → (out [B, Sq, H, D] fp32,
    lse [B, Sq, H] fp32). Plain XLA einsum — inside the ring each block is
    S/n × S/n, small enough that a flash schedule has little left to hide;
    the *ring* is what bounds memory.
    """
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", (p / l).astype(v.dtype), v, preferred_element_type=jnp.float32)
    lse = (m + jnp.log(l))[..., 0]  # [B, H, Sq]
    return out.astype(jnp.float32), lse.transpose(0, 2, 1)  # [B, Sq, H]


def _merge(o1, lse1, o2, lse2):
    """Combine two partial attentions over disjoint K/V sets (flash merge)."""
    lse = jnp.logaddexp(lse1, lse2)
    w1 = jnp.exp(lse1 - lse)[..., None]
    w2 = jnp.exp(lse2 - lse)[..., None]
    return o1 * w1 + o2 * w2, lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with q/k/v sequence-sharded over ``mesh[axis]``.

    q/k/v: [B, S, H, D] (S divisible by the axis size) → [B, S, H, D], same
    sharding. Works on the virtual CPU mesh for tests and over ICI on pods.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    if q.shape[1] % n:
        raise ValueError(f"sequence {q.shape[1]} not divisible by mesh axis {axis}={n}")
    out_dtype = q.dtype

    spec = P(None, axis, None, None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    def ring(q, k, v):
        perm = [(i, (i + 1) % n) for i in range(n)]  # one hop toward the next device

        o, lse = _block_attention_lse(q, k, v, scale)

        def step(_, carry):
            o, lse, k, v = carry
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            o2, lse2 = _block_attention_lse(q, k, v, scale)
            o, lse = _merge(o, lse, o2, lse2)
            return o, lse, k, v

        o, lse, _, _ = jax.lax.fori_loop(0, n - 1, step, (o, lse, k, v))
        return o.astype(out_dtype)

    return ring(q, k, v)


def shard_sequence(x: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Place [B, S, ...] with S sharded over the mesh axis."""
    parts = [None] * x.ndim
    parts[1] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*parts)))
