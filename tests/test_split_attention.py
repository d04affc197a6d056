"""Split/sep-split aggregator attention ablations vs torch oracles.

The oracles re-implement the documented math of the reference's dormant
``split_AttnProcessor2_0`` (``module/ip_adapter/attention_processor.py:417-538``)
and ``sep_split_AttnProcessor2_0`` (``:541-700``) processors (installed by
``init_aggregator_attn_proc``, ``:1418-1467``) directly in torch: the
H-concatenated token sequence is split into (cond, ref) streams around the
zero pad row, attended (jointly, or separately with AdaLN'd bidirectional
cross-attention), and reassembled with a fresh zero pad row.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.attention import Attention, SplitAttention

torch = pytest.importorskip("torch")

B, HEADS, HEAD_DIM = 2, 2, 8
DIM = HEADS * HEAD_DIM
TEMB_DIM = 12


def _np(x):
    return np.asarray(x, np.float32)


def _randomized_params(module, key, *args, **kwargs):
    params = module.init(key, *args, **kwargs)
    # randomize zero-init leaves (AdaLN linears) so every path is exercised
    flat, tree = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(7)
    flat = [jnp.asarray(rng.normal(scale=0.1, size=p.shape), p.dtype) for p in flat]
    return jax.tree_util.tree_unflatten(tree, flat)


def _W(node):
    return torch.from_numpy(_np(node["base"]["kernel"]))


def _torch_attn(q, k, v):
    def hf(t):
        return t.view(t.shape[0], -1, HEADS, HEAD_DIM).transpose(1, 2)

    o = torch.nn.functional.scaled_dot_product_attention(hf(q), hf(k), hf(v))
    return o.transpose(1, 2).reshape(q.shape[0], -1, DIM)


def _torch_ada_ln(h, node, temb):
    lin_w = torch.from_numpy(_np(node["linear"]["base"]["kernel"]))
    lin_b = torch.from_numpy(_np(node["linear"]["base"]["bias"]))
    emb = torch.nn.functional.silu(temb) @ lin_w + lin_b
    shift, scale = emb.view(len(h), 1, -1).chunk(2, dim=-1)
    normed = torch.nn.functional.layer_norm(h, (h.shape[-1],), eps=1e-6)
    return normed * (1 + scale) + shift


@pytest.fixture
def pad_map(rng):
    h, w = 2 * 3 + 1, 4  # two 3-row streams + one pad row
    x = jnp.asarray(rng.normal(size=(B, h * w, DIM)), jnp.float32)
    return x, (h, w)


def test_split_joint_matches_torch_oracle(pad_map, rng):
    x, (h, w) = pad_map
    attn = SplitAttention(query_dim=DIM, heads=HEADS, head_dim=HEAD_DIM, mode="joint", use_flash=False)
    params = _randomized_params(attn, jax.random.PRNGKey(0), x, (h, w))
    out = attn.apply(params, x, (h, w))

    p = params["params"]
    n0 = (h // 2) * w
    tx = torch.from_numpy(_np(x))
    t = torch.cat([tx[:, :n0], tx[:, -n0:]], dim=1)  # pad row dropped (:468-469)
    joint = _torch_attn(t @ _W(p["to_q"]), t @ _W(p["to_k"]), t @ _W(p["to_v"]))
    joint = joint @ _W(p["to_out"]) + torch.from_numpy(_np(p["to_out"]["base"]["bias"]))
    zeros = torch.zeros(B, w, DIM)
    expected = torch.cat([joint[:, :n0], zeros, joint[:, n0:]], dim=1)  # re-pad (:529-533)

    np.testing.assert_allclose(_np(out), expected.numpy(), rtol=2e-4, atol=2e-5)


def test_sep_split_matches_torch_oracle(pad_map, rng):
    x, (h, w) = pad_map
    temb = jnp.asarray(rng.normal(size=(B, TEMB_DIM)), jnp.float32)
    ref_scale = 0.5
    attn = SplitAttention(query_dim=DIM, heads=HEADS, head_dim=HEAD_DIM, mode="sep", use_flash=False)
    params = _randomized_params(attn, jax.random.PRNGKey(1), x, (h, w), temb=temb)
    out = attn.apply(params, x, (h, w), temb=temb, ref_scale=ref_scale)

    p = params["params"]
    n0 = (h // 2) * w
    tx = torch.from_numpy(_np(x))
    ttemb = torch.from_numpy(_np(temb))
    t0, t1 = tx[:, :n0], tx[:, -n0:]
    q0, k0, v0 = t0 @ _W(p["to_q"]), t0 @ _W(p["to_k"]), t0 @ _W(p["to_v"])
    q1, k1, v1 = t1 @ _W(p["to_q"]), t1 @ _W(p["to_k"]), t1 @ _W(p["to_v"])
    k1 = _torch_ada_ln(k1, p["ln_k_ref"], ttemb)  # :629-631
    v1 = _torch_ada_ln(v1, p["ln_v_ref"], ttemb)
    # bidirectional cross with the reference's asymmetric scales (:655, :661-665)
    o0 = _torch_attn(q0, k0, v0) + ref_scale * _torch_attn(q0, k1, v1) * 10
    o1 = _torch_attn(q1, k1, v1) + ref_scale * _torch_attn(q1, k0, v0)
    bias = torch.from_numpy(_np(p["to_out"]["base"]["bias"]))
    o0 = o0 @ _W(p["to_out"]) + bias
    o1 = o1 @ _W(p["to_out"]) + bias
    expected = torch.cat([o0, torch.zeros(B, w, DIM), o1], dim=1)

    np.testing.assert_allclose(_np(out), expected.numpy(), rtol=2e-4, atol=2e-5)


def test_joint_without_pad_equals_plain_attention(rng):
    """COMPONENTS.md's equivalence claim, now executable: with no pad row the
    split processor computes exactly plain joint attention over the map."""
    h, w = 6, 4
    x = jnp.asarray(rng.normal(size=(B, h * w, DIM)), jnp.float32)
    split = SplitAttention(query_dim=DIM, heads=HEADS, head_dim=HEAD_DIM, mode="joint", use_flash=False)
    params = split.init(jax.random.PRNGKey(2), x, (h, w))
    plain = Attention(query_dim=DIM, heads=HEADS, head_dim=HEAD_DIM, use_flash=False)
    np.testing.assert_allclose(
        _np(split.apply(params, x, (h, w))),
        _np(plain.apply(params, x)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_aggregator_pad_concat_and_modes(rng):
    """pad_concat + split/sep_split run end-to-end on a tiny aggregator and
    produce residuals at the same (un-padded per-stream) resolutions."""
    from instantir_tpu.models.aggregator import Aggregator
    from instantir_tpu.models.unet import tiny_unet_config

    cfg = tiny_unet_config()
    lat = 8
    sample = jnp.asarray(rng.normal(size=(1, lat, lat, cfg.in_channels)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(1, lat, lat, cfg.in_channels)), jnp.float32)
    pooled_dim = cfg.projection_class_embeddings_input_dim - cfg.addition_time_embed_dim * 6
    kwargs = dict(
        added_text_embeds=jnp.zeros((1, pooled_dim), jnp.float32),
        added_time_ids=jnp.zeros((1, 6), jnp.float32),
    )

    base = Aggregator(cfg, use_flash=False)
    base_params = base.init(jax.random.PRNGKey(3), sample, 10, ref, **kwargs)
    down_base, mid_base = base.apply(base_params, sample, 10, ref, **kwargs)

    for mode in ("split", "sep_split"):
        agg = Aggregator(cfg, use_flash=False, pad_concat=True, attn1_mode=mode)
        params = agg.init(jax.random.PRNGKey(4), sample, 10, ref, **kwargs)
        down, mid = agg.apply(params, sample, 10, ref, ref_scale=0.3, **kwargs)
        assert mid.shape == mid_base.shape
        assert len(down) == len(down_base)
        for d, db in zip(down, down_base):
            assert d.shape == db.shape
        assert np.isfinite(_np(mid)).all()

    # sep_split params carry the AdaLN pairs; split shares the plain tree shape
    sep = Aggregator(cfg, use_flash=False, pad_concat=True, attn1_mode="sep_split")
    sep_params = sep.init(jax.random.PRNGKey(5), sample, 10, ref, **kwargs)
    paths = [
        jax.tree_util.keystr(path)
        for path, _ in jax.tree_util.tree_flatten_with_path(sep_params)[0]
    ]
    assert any("ln_k_ref" in s for s in paths) and any("ln_v_ref" in s for s in paths)
