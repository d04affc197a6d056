"""Checkpoint-loading fixes: real checkpoints carry no flax LoRA leaves —
conversion must complete the tree (fill_missing_leaves) before LoRA merging,
and the resampler's share of the previewer LoRA (living under
unet.encoder_hid_proj in the torch tree) must be routed into the resampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.convert import flax_to_torch as f2t
from instantir_tpu.convert import torch_to_flax as t2f
from instantir_tpu.models.resampler import Resampler, tiny_resampler_config
from instantir_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from instantir_tpu.pipeline.load import build_aggregator_tree, fill_missing_leaves


@pytest.fixture(scope="module")
def setup():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    unet = UNet2DConditionModel(ucfg, use_flash=False)
    inputs = dict(
        sample=jnp.zeros((1, 16, 16, 4)),
        timesteps=jnp.zeros((1,), jnp.int32),
        encoder_hidden_states=jnp.zeros((1, 7, 32)),
        added_text_embeds=jnp.zeros((1, 16)),
        added_time_ids=jnp.zeros((1, 6)),
        ip_hidden_states=jnp.zeros((1, 4, 32)),
    )
    shapes = jax.eval_shape(lambda k: unet.init(k, **inputs), jax.random.PRNGKey(0))
    full_tree = unet.init(jax.random.PRNGKey(0), **inputs)
    return ucfg, unet, inputs, shapes, full_tree


def _base_only_sd(full_tree):
    """Simulate a real released checkpoint: export, drop every LoRA tensor."""
    sd = f2t.export_unet(jax.tree_util.tree_map(np.asarray, full_tree))
    return {k: v for k, v in sd.items() if "lora_" not in k}


def test_base_checkpoint_completes_and_lora_merges(setup):
    ucfg, unet, inputs, shapes, full_tree = setup
    base_sd = _base_only_sd(full_tree)
    tree = t2f.convert_unet(base_sd, ucfg)
    # real checkpoint → no lora leaves yet
    assert "lora_a" not in tree["params"]["down_blocks_1"]["attentions_0"]["blocks_0"]["attn1"]["to_q"]
    tree = fill_missing_leaves(tree, shapes, np.random.default_rng(0))
    t2f.assert_tree_compatible(tree, jax.tree_util.tree_map(np.asarray, full_tree), allow_missing=())
    # forward with LoRA enabled must now work (zero-init B ⇒ same as disabled)
    out0 = unet.apply(tree, **inputs, lora_scale=0.0)
    out1 = unet.apply(tree, **inputs, lora_scale=1.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)

    # merging a LoRA file flips the behavior on
    lora_sd = {f"unet.{k}": v for k, v in f2t.export_unet(jax.tree_util.tree_map(np.asarray, full_tree)).items() if "lora_" in k}
    # make the donor B matrices nonzero so the merge is observable
    lora_sd = {k: (v + 0.05 if "lora_B" in k else v) for k, v in lora_sd.items()}
    tree, n, _ = t2f.merge_previewer_lora(tree, lora_sd, ucfg)
    assert n == len(lora_sd) and n > 0
    out2 = unet.apply(tree, **inputs, lora_scale=1.0)
    assert np.abs(np.asarray(out2) - np.asarray(out0)).max() > 1e-5


def test_renamed_lora_key_is_reported_unmatched(setup):
    """Strict load accounting (reference strictness: sdxl_instantir.py:386-394):
    a renamed LoRA key must surface as unmatched instead of silently dropping."""
    ucfg, unet, inputs, shapes, full_tree = setup
    tree = t2f.convert_unet(_base_only_sd(full_tree), ucfg)
    tree = fill_missing_leaves(tree, shapes, np.random.default_rng(0))
    lora_sd = {
        f"unet.{k}": v
        for k, v in f2t.export_unet(jax.tree_util.tree_map(np.asarray, full_tree)).items()
        if "lora_" in k
    }
    good = len(lora_sd)
    # simulate a diffusers rename: one key moves to a module that doesn't exist
    key = sorted(lora_sd)[0]
    lora_sd["unet.down_blocks.0.resnets.0.conv1_renamed.lora_A.weight"] = lora_sd.pop(key)
    tree, n, unmatched = t2f.merge_previewer_lora(tree, lora_sd, ucfg)
    assert n == good - 1
    assert unmatched == ["unet.down_blocks.0.resnets.0.conv1_renamed.lora_A.weight"]


def test_ip_adapter_merge_strict_on_leftover_keys(setup):
    ucfg, unet, inputs, shapes, full_tree = setup
    ip_sd = f2t.export_ip_adapter(jax.tree_util.tree_map(np.asarray, full_tree), ucfg)
    tree = t2f.convert_unet(_base_only_sd(full_tree), ucfg)
    tree = fill_missing_leaves(tree, shapes, np.random.default_rng(0))
    # a mis-indexed processor key maps nowhere → strict merge aborts
    bad = dict(ip_sd)
    bad["999.to_k_ip.weight"] = next(iter(ip_sd.values()))
    with pytest.raises(ValueError):
        t2f.merge_ip_adapter(tree, bad, ucfg, strict=True)
    # opt-out allows the partial load
    t2f.merge_ip_adapter(tree, bad, ucfg, strict=False)


def test_resampler_lora_routing(rng):
    rcfg = tiny_resampler_config(lora_rank=2)
    res = Resampler(rcfg)
    x = jnp.asarray(rng.normal(size=(1, 5, rcfg.embedding_dim)), jnp.float32)
    shapes = jax.eval_shape(lambda k: res.init(k, x), jax.random.PRNGKey(0))
    full = res.init(jax.random.PRNGKey(0), x)
    # base-only checkpoint + completion
    sd = {k: v for k, v in f2t.export_resampler(jax.tree_util.tree_map(np.asarray, full)).items() if "lora_" not in k}
    tree = t2f.convert_resampler(sd, rcfg)
    tree = fill_missing_leaves(tree, shapes, np.random.default_rng(1))
    # torch-format previewer LoRA keys for the resampler
    lora_sd = {}
    for i in range(rcfg.depth):
        for tgt in ("to_q", "to_kv", "to_out"):
            node = full["params"][f"layers_{i}_attn"][tgt]
            lora_sd[f"unet.encoder_hid_proj.image_projection_layers.0.layers.{i}.0.{tgt}.lora_A.weight"] = (
                np.asarray(node["lora_a"]["kernel"]).T
            )
            lora_sd[f"unet.encoder_hid_proj.image_projection_layers.0.layers.{i}.0.{tgt}.lora_B.weight"] = (
                np.asarray(node["lora_b"]["kernel"]).T + 0.05
            )
    tree, n, _ = t2f.merge_resampler_lora(tree, lora_sd)
    assert n == len(lora_sd)
    out_off = res.apply(tree, x, lora_scale=0.0)
    out_on = res.apply(tree, x, lora_scale=1.0)
    assert np.abs(np.asarray(out_on) - np.asarray(out_off)).max() > 1e-6


def test_build_aggregator_tree_from_unet(setup):
    ucfg, unet, inputs, shapes, full_tree = setup
    from instantir_tpu.models.aggregator import Aggregator

    agg = Aggregator(ucfg, use_flash=False)
    agg_shapes = jax.eval_shape(
        lambda k: agg.init(
            k, inputs["sample"], inputs["timesteps"], inputs["sample"],
            added_text_embeds=inputs["added_text_embeds"], added_time_ids=inputs["added_time_ids"],
        ),
        jax.random.PRNGKey(0),
    )
    tree = build_aggregator_tree(jax.tree_util.tree_map(np.asarray, full_tree), agg_shapes, np.random.default_rng(0))
    # conv_in copied into both stems; zero-conv heads zero; forward runs
    np.testing.assert_array_equal(
        np.asarray(full_tree["params"]["conv_in"]["base"]["kernel"]),
        np.asarray(tree["params"]["ref_conv_in"]["base"]["kernel"]),
    )
    down, mid = agg.apply(
        tree, inputs["sample"], inputs["timesteps"], inputs["sample"],
        added_text_embeds=inputs["added_text_embeds"], added_time_ids=inputs["added_time_ids"],
    )
    assert float(jnp.abs(mid).max()) == 0.0  # zero-conv heads at init
    assert len(down) == 9
