"""KV-cache reference-attention experiments (dormant reference component
``module/attention.py``): KVCopy extraction, external_kv injection into
Attention, and the static-shape drop_kvs."""

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.models.attention import Attention
from instantir_tpu.models.kv_cache import (
    AttentionCache,
    KVCache,
    KVCopy,
    drop_kvs,
    init_kv_copy,
)

B, N, M, DIM, HEADS = 2, 12, 5, 32, 4


def _attn(lora_rank=0):
    return Attention(query_dim=DIM, heads=HEADS, head_dim=DIM // HEADS, lora_rank=lora_rank,
                     use_flash=False)


def test_external_kv_equals_concatenated_context(rng):
    """Appending external K/V tokens must equal self-attention whose K/V were
    projected from the concatenated token sequence (the processor concat at
    attention_processor.py:380-382)."""
    attn = _attn()
    x = jnp.asarray(rng.normal(size=(B, N, DIM)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, M, DIM)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)

    # the injected cache, computed with the SAME to_k/to_v weights
    kv = KVCopy(inner_dim=DIM)
    kv_params = init_kv_copy(kv.init(jax.random.PRNGKey(1), y), params)
    cache = kv.apply(kv_params, y)
    out_ext = attn.apply(params, x, external_kv=cache)

    # oracle: queries from x, keys/values over [x; y]
    out_ref = attn.apply(params, x, encoder_hidden_states=jnp.concatenate([x, y], axis=1))
    np.testing.assert_allclose(np.asarray(out_ext), np.asarray(out_ref), atol=1e-5, rtol=1e-5)


def test_init_kv_copy_matches_source_projection(rng):
    attn = _attn()
    x = jnp.asarray(rng.normal(size=(B, N, DIM)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    kv = KVCopy(inner_dim=DIM)
    kv_params = init_kv_copy(kv.init(jax.random.PRNGKey(1), x), params)
    cache = kv.apply(kv_params, x)
    want_k = x @ params["params"]["to_k"]["base"]["kernel"]
    np.testing.assert_allclose(np.asarray(cache.k), np.asarray(want_k), atol=1e-5, rtol=1e-5)
    assert cache.k.shape == cache.v.shape == (B, N, DIM)


def test_kvcopy_lora_branch(rng):
    kv = KVCopy(inner_dim=DIM, lora_rank=4)
    x = jnp.asarray(rng.normal(size=(B, N, DIM)), jnp.float32)
    params = kv.init(jax.random.PRNGKey(0), x)
    base = kv.apply(params, x, lora_scale=0.0)
    # fresh LoRA B is zero-init → scale has no effect until trained
    on = kv.apply(params, x, lora_scale=1.0)
    np.testing.assert_allclose(np.asarray(base.k), np.asarray(on.k), atol=1e-6)
    assert "lora_a" in params["params"]["to_k"]


def test_drop_kvs_static_shapes(rng):
    def cache(s):
        a = jnp.asarray(rng.normal(size=(B, s, DIM)), jnp.float32)
        return AttentionCache(
            self_attention=KVCache(k=a, v=a * 2),
            cross_attention=KVCache(k=a[:, :3], v=a[:, :3]),
        )

    caches = {"down_0": cache(16), "mid": cache(8)}
    out = drop_kvs(caches, drop_chance=0.25, key=jax.random.PRNGKey(0))
    assert out["down_0"].self_attention.k.shape == (B, 12, DIM)
    assert out["mid"].self_attention.k.shape == (B, 6, DIM)
    # cross-attention caches pass through untouched (reference drops only self)
    np.testing.assert_array_equal(
        np.asarray(out["mid"].cross_attention.k), np.asarray(caches["mid"].cross_attention.k)
    )
    # kept rows are a subset of the original tokens
    orig = np.asarray(caches["mid"].self_attention.k)[0]
    for row in np.asarray(out["mid"].self_attention.k)[0]:
        assert any(np.allclose(row, o) for o in orig)
