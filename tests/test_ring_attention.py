"""Ring attention (sequence parallelism over the mesh data axis) must equal
dense single-device attention exactly (same math, different partitioning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.ops.attention import attention_xla
from instantir_tpu.parallel import make_mesh
from instantir_tpu.parallel.ring_attention import ring_attention, shard_sequence

B, S, HEADS, D = 2, 64, 4, 16
NDEV = 8


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, S, HEADS, D)), jnp.float32)
    return mk(), mk(), mk()


def test_ring_matches_dense(qkv):
    q, k, v = qkv
    mesh = make_mesh(num_devices=NDEV)
    want = attention_xla(q, k, v)
    got = ring_attention(
        shard_sequence(q, mesh), shard_sequence(k, mesh), shard_sequence(v, mesh), mesh
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_ring_respects_scale_and_grad(qkv):
    q, k, v = qkv
    mesh = make_mesh(num_devices=NDEV)
    want = attention_xla(q, k, v, scale=0.5)
    got = ring_attention(q, k, v, mesh, scale=0.5)  # unsharded inputs also legal
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # differentiable end-to-end (ppermute has a transpose rule)
    g = jax.grad(lambda q: ring_attention(q, k, v, mesh).sum())(q)
    g_ref = jax.grad(lambda q: attention_xla(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-5, rtol=1e-3)


def test_ring_rejects_indivisible(qkv):
    q, k, v = qkv
    mesh = make_mesh(num_devices=NDEV)
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(q[:, : S - 4], k[:, : S - 4], v[:, : S - 4], mesh)
