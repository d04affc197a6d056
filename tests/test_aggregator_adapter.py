"""aggregator_adapter — working rebuild of the reference's broken flag.

The reference's ``--aggregator_adapter`` (train_stage2_aggregator.py:921-938)
is broken in-tree twice over: ``remove_attn2`` (:846) deletes the attention
modules the IP processors would be installed on (:929 → init_attn_proc
targets only attn2), and ``image_embeds`` is inserted into added_cond_kwargs
only AFTER the aggregator call (:1581), so ``module/aggregator.py:745-748``
raises. The rebuild (models/aggregator.py) keeps attn2 removed and puts the
TA-IP decoupled branch on each attn1, fed by the aggregator's own Resampler
applied BEFORE the call. These tests pin:

  * torch oracle for the attn1+TA-IP composition (self-attention + decoupled
    second softmax over ip tokens + AdaLN(temb) K/V — the exact ip-half of
    TA_IPAttnProcessor2_0, attention_processor.py:1063-1207);
  * ip_scale=0 equivalence with the baseline aggregator on shared weights;
  * the ip tokens are actually consumed (and per-token, not pooled);
  * enable_aggregator_adapter structure (fresh leaves, zero-init AdaLN);
  * a stage-2 train step with the flag: runs, finite, trains the
    agg_resampler and the new ip projections.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.aggregator import Aggregator
from instantir_tpu.models.attention import Attention
from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.train.stage2_aggregator import (
    Stage2Config,
    Stage2Trainer,
    enable_aggregator_adapter,
)

RES = 32


def test_self_attn_ta_ip_matches_torch_oracle(rng):
    """Self-attention with the decoupled TA-IP branch — the exact composition
    the aggregator_adapter puts on each attn1."""
    torch = pytest.importorskip("torch")
    b, n, dim = 2, 6, 16
    heads, head_dim = 2, 8
    ip_tokens, ip_dim, temb_dim = 4, 12, 20

    attn = Attention(query_dim=dim, heads=heads, head_dim=head_dim,
                     with_ip=True, time_aware_ip=True, use_flash=False, lora_rank=0)
    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    ip = jnp.asarray(rng.normal(size=(b, ip_tokens, ip_dim)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(b, temb_dim)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, ip_hidden_states=ip, temb=temb)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.default_rng(1).normal(scale=0.1, size=p.shape), p.dtype), params)
    out = attn.apply(params, x, ip_hidden_states=ip, temb=temb)

    p = params["params"]
    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))  # noqa: E731

    def lin(node, v):
        return v @ t(node["base"]["kernel"])

    def heads_split(v):
        return v.reshape(b, -1, heads, head_dim).transpose(1, 2)

    tx, tip, ttemb = t(x), t(ip), t(temb)
    q, k, v = lin(p["to_q"], tx), lin(p["to_k"], tx), lin(p["to_v"], tx)
    self_out = torch.nn.functional.scaled_dot_product_attention(
        heads_split(q), heads_split(k), heads_split(v)).transpose(1, 2).reshape(b, n, -1)

    def adaln(node, val):
        emb = torch.nn.functional.silu(ttemb) @ t(node["linear"]["base"]["kernel"]) + t(
            node["linear"]["base"]["bias"])
        shift, scale = emb[:, None, :].chunk(2, dim=-1)
        normed = torch.nn.functional.layer_norm(val, (val.shape[-1],), eps=1e-6)
        return normed * (1 + scale) + shift

    ip_k = adaln(p["ln_k_ip"], lin(p["to_k_ip"], tip))
    ip_v = adaln(p["ln_v_ip"], lin(p["to_v_ip"], tip))
    ip_out = torch.nn.functional.scaled_dot_product_attention(
        heads_split(q), heads_split(ip_k), heads_split(ip_v)).transpose(1, 2).reshape(b, n, -1)
    ref = lin(p["to_out"], self_out + 1.0 * ip_out) + t(p["to_out"]["base"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def setup():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    pipe = build_pipeline(ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(),
                          jax.random.PRNGKey(0), image_size=RES)

    # the SFT heads end in zero-init convs, so a fresh aggregator emits
    # all-zero residuals — perturb them (in the shared tree, BEFORE the
    # adapter extension copies it) so equality tests are non-vacuous
    perturb = np.random.default_rng(7)

    def unzero(node, path=()):
        if isinstance(node, dict):
            return {k: unzero(v, path + (k,)) for k, v in node.items()}
        if "zero_conv" in path and str(path[-1]) == "kernel":
            return jnp.asarray(perturb.normal(scale=0.05, size=node.shape), node.dtype)
        return node

    pipe.params = {**pipe.params, "aggregator": unzero(pipe.params["aggregator"])}
    cfg = Stage2Config(output_dir="", max_train_steps=1, train_batch_size=2, resolution=RES,
                       aggregator_adapter=True, adapter_tokens=4)
    agg, params, agg_res = enable_aggregator_adapter(
        pipe.aggregator, pipe.params, pipe.image_encoder.config.hidden_size, cfg, seed=0)
    return pipe, cfg, agg, params, agg_res


def _agg_inputs(pipe, rng, b=1):
    ucfg = pipe.unet.config
    lat = RES // 2 ** (len(pipe.vae.config.block_out_channels) - 1)
    pooled_dim = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    return dict(
        sample=jnp.asarray(rng.normal(size=(b, lat, lat, 4)), jnp.float32),
        timesteps=jnp.full((b,), 500, jnp.int32),
        controlnet_cond=jnp.asarray(rng.normal(size=(b, lat, lat, 4)), jnp.float32),
        added_text_embeds=jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32),
        added_time_ids=jnp.zeros((b, 6), jnp.float32),
    )


def test_ip_scale_zero_matches_baseline(setup, rng):
    pipe, cfg, agg, params, agg_res = setup
    inputs = _agg_inputs(pipe, rng)
    ip = jnp.asarray(rng.normal(size=(1, 4, pipe.unet.config.cross_attention_dim)), jnp.float32)
    base_down, base_mid = pipe.aggregator.apply(pipe.params["aggregator"], **inputs)
    adp_down, adp_mid = agg.apply(params["aggregator"], **inputs,
                                  ip_hidden_states=ip, ip_scale=0.0)
    np.testing.assert_allclose(np.asarray(adp_mid), np.asarray(base_mid), atol=1e-6)
    for a, b2 in zip(adp_down, base_down):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-6)


def test_ip_tokens_are_consumed(setup, rng):
    pipe, cfg, agg, params, agg_res = setup
    inputs = _agg_inputs(pipe, rng)
    ip1 = jnp.asarray(rng.normal(size=(1, 4, pipe.unet.config.cross_attention_dim)), jnp.float32)
    ip2 = jnp.asarray(rng.normal(size=(1, 4, pipe.unet.config.cross_attention_dim)), jnp.float32)
    _, mid1 = agg.apply(params["aggregator"], **inputs, ip_hidden_states=ip1)
    _, mid2 = agg.apply(params["aggregator"], **inputs, ip_hidden_states=ip2)
    assert np.abs(np.asarray(mid1) - np.asarray(mid2)).max() > 1e-7
    with pytest.raises(ValueError, match="requires ip_hidden_states"):
        agg.apply(params["aggregator"], **inputs)


def test_enable_aggregator_adapter_structure(setup):
    pipe, cfg, agg, params, agg_res = setup
    flat = {"/".join(str(k) for k in path): v for path, v in
            jax.tree_util.tree_leaves_with_path(params["aggregator"], is_leaf=lambda x: hasattr(x, "shape"))}

    def paths_with(sub):
        return [k for k in flat if sub in k]

    assert paths_with("to_k_ip") and paths_with("ln_k_ip")
    # AdaLN modulation starts as identity (zero kernel+bias)
    for k in paths_with("ln_k_ip"):
        if k.endswith("kernel']") or k.endswith("bias']") or "linear" in k:
            assert float(np.abs(np.asarray(flat[k])).max()) == 0.0, k
    # pre-existing weights are untouched
    orig = pipe.params["aggregator"]["params"]["conv_in"]["base"]["kernel"]
    new = params["aggregator"]["params"]["conv_in"]["base"]["kernel"]
    np.testing.assert_array_equal(np.asarray(orig), np.asarray(new))
    assert "agg_resampler" in params


def test_stage2_trainer_with_aggregator_adapter(setup, tmp_path):
    from instantir_tpu.data.dataset import SyntheticImageDataset

    pipe, _, agg, params, agg_res = setup
    cfg = Stage2Config(
        output_dir=str(tmp_path / "s2a"), max_train_steps=1, train_batch_size=2, resolution=RES,
        aggregator_adapter=True, adapter_tokens=4, logging_steps=1,
        learning_rate=1e-3, lr_warmup_steps=0,
    )
    tr = Stage2Trainer(pipe.unet, agg, pipe.resampler, pipe.vae, pipe.image_encoder,
                       params, cfg, agg_resampler=agg_res)
    assert any(k[0] == "agg_resampler" for k in tr.trainable)
    before = {k: jax.tree_util.tree_map(np.asarray, v) for k, v in tr.trainable.items()
              if k[0] == "agg_resampler"}
    rng = np.random.default_rng(5)
    ucfg = pipe.unet.config
    pooled_dim = ucfg.projection_class_embeddings_input_dim - ucfg.addition_time_embed_dim * 6
    cond = {
        "prompt_embeds": jnp.asarray(rng.normal(size=(2, 7, ucfg.cross_attention_dim)), jnp.float32),
        "uncond_prompt_embeds": jnp.zeros((2, 7, ucfg.cross_attention_dim), jnp.float32),
        "pooled_embeds": jnp.asarray(rng.normal(size=(2, pooled_dim)), jnp.float32),
        "uncond_pooled_embeds": jnp.zeros((2, pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32), (2, 1)),
    }
    data = SyntheticImageDataset(seed=0).batches(batch_size=2, gt_size=RES * 4)
    batch = tr.prepare_batch(next(data), cond, jax.random.PRNGKey(0))
    metrics = tr.train_step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    moved = 0.0
    for k, v in tr.trainable.items():
        if k[0] == "agg_resampler":
            for a, b in zip(jax.tree_util.tree_leaves(before[k]), jax.tree_util.tree_leaves(v)):
                moved = max(moved, float(np.abs(a - np.asarray(b)).max()))
    assert moved > 0.0


def test_trainer_guards():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=0)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim)
    pipe = build_pipeline(ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(),
                          jax.random.PRNGKey(0), image_size=RES)
    cfg = Stage2Config(output_dir="", max_train_steps=1, train_batch_size=2, resolution=RES,
                       aggregator_adapter=True)
    with pytest.raises(ValueError, match="agg_resampler"):
        Stage2Trainer(pipe.unet, pipe.aggregator, pipe.resampler, pipe.vae,
                      pipe.image_encoder, pipe.params, cfg)
