"""TA-IP attention parity vs an independent torch oracle.

The oracle re-implements the documented math of the reference's
``TA_IPAttnProcessor2_0`` (``module/ip_adapter/attention_processor.py:1063-1207``)
directly in torch: text cross-attention via SDPA, a *decoupled second
softmax* over the image tokens with the same queries, AdaLayerNorm(temb) on
the projected ip K/V, and ``out = text_out + scale·ip_out`` before to_out.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.attention import Attention

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x, np.float32)


def test_ta_ip_attention_matches_torch_oracle(rng):
    b, n, dim = 2, 6, 16
    heads, head_dim = 2, 8
    cross_dim, seq, ip_tokens = 12, 5, 4
    temb_dim = 20
    ip_scale = 1.0

    attn = Attention(
        query_dim=dim,
        heads=heads,
        head_dim=head_dim,
        cross_attention_dim=cross_dim,
        with_ip=True,
        time_aware_ip=True,
        use_flash=False,
        lora_rank=0,
    )
    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, seq, cross_dim)), jnp.float32)
    ip = jnp.asarray(rng.normal(size=(b, ip_tokens, cross_dim)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(b, temb_dim)), jnp.float32)

    params = attn.init(jax.random.PRNGKey(0), x, encoder_hidden_states=ctx, ip_hidden_states=ip, temb=temb)
    # randomize the zero-init adaLN linears so the time-aware path is exercised
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.default_rng(1).normal(scale=0.1, size=p.shape), p.dtype), params
    )
    out = attn.apply(params, x, encoder_hidden_states=ctx, ip_hidden_states=ip, temb=temb)

    p = params["params"]

    def W(path_node):  # flax kernel [in, out] → torch convention handling
        return torch.from_numpy(_np(path_node["base"]["kernel"]))

    tx = torch.from_numpy(_np(x))
    tctx = torch.from_numpy(_np(ctx))
    tip = torch.from_numpy(_np(ip))
    ttemb = torch.from_numpy(_np(temb))

    q = tx @ W(p["to_q"])
    k = tctx @ W(p["to_k"])
    v = tctx @ W(p["to_v"])

    def heads_first(t):
        return t.view(b, -1, heads, head_dim).transpose(1, 2)

    text_out = torch.nn.functional.scaled_dot_product_attention(heads_first(q), heads_first(k), heads_first(v))
    text_out = text_out.transpose(1, 2).reshape(b, n, heads * head_dim)

    def ada_ln(h, node):
        lin_w = torch.from_numpy(_np(node["linear"]["base"]["kernel"]))
        lin_b = torch.from_numpy(_np(node["linear"]["base"]["bias"]))
        emb = torch.nn.functional.silu(ttemb) @ lin_w + lin_b
        shift, scale = emb.view(b, 1, -1).chunk(2, dim=-1)
        normed = torch.nn.functional.layer_norm(h, (h.shape[-1],), eps=1e-6)
        return normed * (1 + scale) + shift

    ip_k = ada_ln(tip @ W(p["to_k_ip"]), p["ln_k_ip"])
    ip_v = ada_ln(tip @ W(p["to_v_ip"]), p["ln_v_ip"])
    ip_out = torch.nn.functional.scaled_dot_product_attention(
        heads_first(q), heads_first(ip_k), heads_first(ip_v)
    )
    ip_out = ip_out.transpose(1, 2).reshape(b, n, heads * head_dim)

    combined = text_out + ip_scale * ip_out
    expected = combined @ W(p["to_out"]) + torch.from_numpy(_np(p["to_out"]["base"]["bias"]))

    np.testing.assert_allclose(_np(out), expected.numpy(), rtol=2e-4, atol=2e-5)


def test_ip_branch_is_decoupled_not_concatenated(rng):
    # If the implementation concatenated ip tokens into the text KV (a single
    # softmax), scaling the ip values would change the text-token weighting.
    # In the decoupled form, out is exactly linear in ip_v — verify linearity.
    b, n, dim = 1, 4, 16
    attn = Attention(
        query_dim=dim, heads=2, head_dim=8, cross_attention_dim=dim, with_ip=True,
        time_aware_ip=False, use_flash=False, out_bias=False,
    )
    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, 5, dim)), jnp.float32)
    ip = jnp.asarray(rng.normal(size=(b, 3, dim)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, encoder_hidden_states=ctx, ip_hidden_states=ip)

    out1 = attn.apply(params, x, encoder_hidden_states=ctx, ip_hidden_states=ip, ip_scale=1.0)
    out0 = attn.apply(params, x, encoder_hidden_states=ctx, ip_hidden_states=ip, ip_scale=0.0)
    out2 = attn.apply(params, x, encoder_hidden_states=ctx, ip_hidden_states=ip, ip_scale=2.0)
    # linear in ip_scale: out2 - out0 == 2*(out1 - out0)
    np.testing.assert_allclose(
        _np(out2 - out0), 2 * _np(out1 - out0), rtol=1e-4, atol=1e-5
    )
