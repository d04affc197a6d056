"""Flash-attention kernel parity vs XLA reference and a torch SDPA oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.ops import attention_xla, flash_attention


def _rand_qkv(rng, b=2, sq=256, skv=256, h=3, d=64, dtype=np.float32):
    q = rng.normal(size=(b, sq, h, d)).astype(dtype)
    k = rng.normal(size=(b, skv, h, d)).astype(dtype)
    v = rng.normal(size=(b, skv, h, d)).astype(dtype)
    return q, k, v


def test_xla_attention_vs_torch_sdpa(rng):
    torch = pytest.importorskip("torch")
    q, k, v = _rand_qkv(rng)
    out = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    tq, tk, tv = [torch.from_numpy(x.transpose(0, 2, 1, 3)) for x in (q, k, v)]  # BHSD
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
    ref = ref.numpy().transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sq,skv", [(256, 256), (128, 1024), (512, 384)])
def test_flash_matches_xla(rng, sq, skv):
    q, k, v = _rand_qkv(rng, sq=sq, skv=skv)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sq,skv", [(256, 1024), (512, 512)])
def test_flash_streamed_path_matches_xla(rng, sq, skv, monkeypatch):
    """Force the >RESIDENT_MAX_SEQ streamed kernels (grid-walked K/V blocks
    + scratch-carried softmax state — the unbounded-sequence path the 2048²
    restore needs) at test-size sequences by shrinking the dispatch
    threshold; must match XLA exactly like the resident path."""
    from instantir_tpu.ops import attention as attn_mod

    monkeypatch.setattr(attn_mod, "RESIDENT_MAX_SEQ", 128)
    q, k, v = _rand_qkv(rng, sq=sq, skv=skv)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), block_q=128, block_k=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_streamed_backward_matches_xla(rng, monkeypatch):
    """Streamed dq/dkv kernels (forced via the threshold) vs XLA autodiff."""
    import jax

    from instantir_tpu.ops import attention as attn_mod
    from instantir_tpu.ops.attention import _flash_diff

    monkeypatch.setattr(attn_mod, "RESIDENT_MAX_SEQ", 128)
    # h=5 keeps these shapes distinct from every other test's jit cache
    # entries, so the patched threshold is read at a FRESH trace
    q, k, v = _rand_qkv(rng, b=1, sq=512, skv=512, h=5)
    scale = 64**-0.5

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    flash = lambda q, k, v: _flash_diff(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, True)
    xla = lambda q, k, v: attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale)
    g_f = jax.grad(lambda *a: loss(flash, *a), argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(lambda *a: loss(xla, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_flash_bf16(rng):
    q, k, v = _rand_qkv(rng, sq=256, skv=512)
    qb, kb, vb = [jnp.asarray(x, dtype=jnp.bfloat16) for x in (q, k, v)]
    ref = attention_xla(qb, kb, vb)
    out = flash_attention(qb, kb, vb, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), rtol=2e-2, atol=2e-2
    )


def test_tp_flash_shard_map_matches_xla(rng):
    """Under the TP layout a pallas_call has no GSPMD rule, so the flash path
    wraps in shard_map over local heads (+ local batch rows). The wrapped
    kernel (interpret mode on the virtual mesh) must match dense attention
    and stay differentiable."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from instantir_tpu.ops.attention import _tp_flash
    from instantir_tpu.parallel import make_mesh

    mesh = make_mesh(model_parallel=2)  # data=4, model=2
    q = jnp.asarray(rng.normal(size=(4, 128, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(4, 128, 4, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(4, 128, 4, 16)), jnp.float32)
    scale = q.shape[-1] ** -0.5
    want = attention_xla(q, k, v)

    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    got = jax.jit(lambda a, b, c: _tp_flash(a, b, c, scale, mesh, "model", interpret=True))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
    # the output must stay sharded (no silent all-gather/replication)
    assert "model" in str(got.sharding.spec)

    g = jax.grad(lambda a: _tp_flash(a, k, v, scale, mesh, "model", interpret=True).sum())(q)
    g_ref = jax.grad(lambda a: attention_xla(a, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-5, rtol=1e-3)
