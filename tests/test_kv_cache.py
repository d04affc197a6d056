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


def test_additive_external_kv_matches_torch_oracle(rng):
    """external_kv_mode="additive" ≡ AdditiveKV_AttnProcessor2_0
    (attention_processor.py:784-798): base self-attention plus
    additive_scale · SDPA(q, ext_k, ext_v)."""
    import pytest
    torch = pytest.importorskip("torch")

    scale = 0.7
    attn = Attention(query_dim=DIM, heads=HEADS, head_dim=DIM // HEADS,
                     use_flash=False, external_kv_mode="additive",
                     additive_scale=scale)
    x = jnp.asarray(rng.normal(size=(B, N, DIM)), jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.normal(size=(B, M, DIM)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(B, M, DIM)), jnp.float32),
    )
    params = attn.init(jax.random.PRNGKey(0), x, external_kv=cache)
    out = attn.apply(params, x, external_kv=cache)

    p = params["params"]
    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    W = lambda node: t(node["base"]["kernel"])
    hf = lambda a: a.view(B, -1, HEADS, DIM // HEADS).transpose(1, 2)

    q = t(x) @ W(p["to_q"])
    base = torch.nn.functional.scaled_dot_product_attention(
        hf(q), hf(t(x) @ W(p["to_k"])), hf(t(x) @ W(p["to_v"])))
    ext = torch.nn.functional.scaled_dot_product_attention(
        hf(q), hf(t(cache.k)), hf(t(cache.v)))
    merge = lambda a: a.transpose(1, 2).reshape(B, N, DIM)
    expected = (merge(base) + scale * merge(ext)) @ W(p["to_out"]) + t(p["to_out"]["base"]["bias"])
    np.testing.assert_allclose(np.asarray(out), expected.numpy(), rtol=2e-4, atol=2e-5)


def test_ta_additive_external_kv_matches_torch_oracle(rng):
    """external_kv_mode="ta_additive" ≡ TA_AdditiveKV_AttnProcessor2_0
    (attention_processor.py:903-907): AdaLayerNorm(temb) on the injected K/V
    before the additive attention."""
    import pytest
    torch = pytest.importorskip("torch")

    temb_dim = 20
    attn = Attention(query_dim=DIM, heads=HEADS, head_dim=DIM // HEADS,
                     use_flash=False, external_kv_mode="ta_additive")
    x = jnp.asarray(rng.normal(size=(B, N, DIM)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(B, temb_dim)), jnp.float32)
    cache = KVCache(
        k=jnp.asarray(rng.normal(size=(B, M, DIM)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(B, M, DIM)), jnp.float32),
    )
    params = attn.init(jax.random.PRNGKey(0), x, external_kv=cache, temb=temb)
    # randomize the zero-init adaLN linears so the modulation is exercised
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.random.default_rng(1).normal(scale=0.1, size=a.shape), a.dtype), params
    )
    out = attn.apply(params, x, external_kv=cache, temb=temb)

    p = params["params"]
    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    W = lambda node: t(node["base"]["kernel"])
    hf = lambda a: a.view(B, -1, HEADS, DIM // HEADS).transpose(1, 2)

    def ada_ln(h, node):
        emb = torch.nn.functional.silu(t(temb)) @ t(node["linear"]["base"]["kernel"]) + t(node["linear"]["base"]["bias"])
        shift, sc = emb.view(B, 1, -1).chunk(2, dim=-1)
        return torch.nn.functional.layer_norm(h, (h.shape[-1],), eps=1e-6) * (1 + sc) + shift

    q = t(x) @ W(p["to_q"])
    base = torch.nn.functional.scaled_dot_product_attention(
        hf(q), hf(t(x) @ W(p["to_k"])), hf(t(x) @ W(p["to_v"])))
    ext = torch.nn.functional.scaled_dot_product_attention(
        hf(q), hf(ada_ln(t(cache.k), p["ln_k_ext"])), hf(ada_ln(t(cache.v), p["ln_v_ext"])))
    merge = lambda a: a.transpose(1, 2).reshape(B, N, DIM)
    expected = (merge(base) + merge(ext)) @ W(p["to_out"]) + t(p["to_out"]["base"]["bias"])
    np.testing.assert_allclose(np.asarray(out), expected.numpy(), rtol=2e-4, atol=2e-5)
