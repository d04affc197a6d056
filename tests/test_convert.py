"""Weight converter: torch-oracle primitives + full round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.convert import flax_to_torch as f2t
from instantir_tpu.convert import torch_to_flax as t2f
from instantir_tpu.models.aggregator import Aggregator
from instantir_tpu.models.resampler import Resampler, tiny_resampler_config
from instantir_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from instantir_tpu.models.vae import AutoencoderKL, tiny_vae_config


def _tree_equal(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a.keys()) == set(b.keys()), f"{path}: {set(a)} vs {set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=path, atol=0)


def test_linear_conv_primitives_vs_torch(rng):
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    # Linear
    lin = torch.nn.Linear(6, 4)
    sd = {k: v.detach().numpy() for k, v in lin.state_dict().items()}
    flax_params = {"params": t2f.t_linear({"w.weight": sd["weight"], "w.bias": sd["bias"]}, "w")}
    x = rng.normal(size=(2, 6)).astype(np.float32)
    got = nn.Dense(4).apply(flax_params, jnp.asarray(x))
    ref = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)

    # Conv (padding=1, NCHW → NHWC)
    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    flax_params = {"params": t2f.t_conv(sd, "c")}
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    got = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)]).apply(
        flax_params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_groupnorm_vs_torch(rng):
    torch = pytest.importorskip("torch")
    from instantir_tpu.models.layers import GroupNorm32

    gn = torch.nn.GroupNorm(4, 8)
    with torch.no_grad():
        gn.weight.normal_()
        gn.bias.normal_()
    sd = {f"g.{k}": v.detach().numpy() for k, v in gn.state_dict().items()}
    params = {"params": t2f.t_groupnorm32(sd, "g")}
    x = rng.normal(size=(2, 8, 6, 6)).astype(np.float32)
    got = GroupNorm32(num_groups=4).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ref = gn(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_trees():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    unet = UNet2DConditionModel(ucfg, use_flash=False)
    rng = np.random.default_rng(0)
    b = 1
    inputs = dict(
        sample=jnp.zeros((b, 16, 16, 4)),
        timesteps=jnp.zeros((b,), jnp.int32),
        encoder_hidden_states=jnp.zeros((b, 7, 32)),
        added_text_embeds=jnp.zeros((b, 16)),
        added_time_ids=jnp.zeros((b, 6)),
        ip_hidden_states=jnp.zeros((b, 4, 32)),
    )
    unet_tree = unet.init(jax.random.PRNGKey(0), **inputs)
    # randomize so transposes are actually exercised (zeros would hide bugs)
    unet_tree = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.random.default_rng(1).normal(size=x.shape), x.dtype), unet_tree
    )
    return ucfg, unet_tree


def test_unet_roundtrip(tiny_trees):
    ucfg, unet_tree = tiny_trees
    sd = f2t.export_unet(jax.tree_util.tree_map(np.asarray, unet_tree))
    back = t2f.convert_unet(sd, ucfg)
    t2f.assert_tree_compatible(back, jax.tree_util.tree_map(np.asarray, unet_tree), allow_missing=())
    _tree_equal(back["params"], jax.tree_util.tree_map(np.asarray, unet_tree)["params"])


def test_aggregator_roundtrip():
    ucfg = tiny_unet_config()
    agg = Aggregator(ucfg, use_flash=False)
    tree = agg.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16, 16, 4)),
        added_text_embeds=jnp.zeros((1, 16)),
        added_time_ids=jnp.zeros((1, 6)),
    )
    tree = jax.tree_util.tree_map(lambda x: jnp.asarray(np.random.default_rng(2).normal(size=x.shape), x.dtype), tree)
    sd = f2t.export_aggregator(jax.tree_util.tree_map(np.asarray, tree))
    back = t2f.convert_aggregator(sd, ucfg)
    _tree_equal(back["params"], jax.tree_util.tree_map(np.asarray, tree)["params"])


def test_vae_roundtrip():
    vcfg = tiny_vae_config()
    vae = AutoencoderKL(vcfg)
    tree = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    tree = jax.tree_util.tree_map(lambda x: jnp.asarray(np.random.default_rng(3).normal(size=x.shape), x.dtype), tree)
    sd = f2t.export_vae(jax.tree_util.tree_map(np.asarray, tree))
    back = t2f.convert_vae(sd, vcfg)
    _tree_equal(back["params"], jax.tree_util.tree_map(np.asarray, tree)["params"])


def test_resampler_roundtrip():
    rcfg = tiny_resampler_config(lora_rank=2)
    res = Resampler(rcfg)
    tree = res.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, rcfg.embedding_dim)))
    tree = jax.tree_util.tree_map(lambda x: jnp.asarray(np.random.default_rng(4).normal(size=x.shape), x.dtype), tree)
    sd = f2t.export_resampler(jax.tree_util.tree_map(np.asarray, tree))
    back = t2f.convert_resampler(sd, rcfg)
    _tree_equal(back["params"], jax.tree_util.tree_map(np.asarray, tree)["params"])


def test_ip_adapter_export_merge_roundtrip(tiny_trees):
    ucfg, unet_tree = tiny_trees
    np_tree = jax.tree_util.tree_map(np.asarray, unet_tree)
    ip_sd = f2t.export_ip_adapter(np_tree, ucfg)
    assert len(ip_sd) > 0
    # wipe ip weights then merge back
    import copy

    wiped = copy.deepcopy(np_tree)

    def wipe(node):
        for k, v in node.items():
            if k in ("to_k_ip", "to_v_ip"):
                v["base"]["kernel"] = np.zeros_like(v["base"]["kernel"])
            elif isinstance(v, dict):
                wipe(v)

    wipe(wiped["params"])
    merged = t2f.merge_ip_adapter(wiped, ip_sd, ucfg)
    _tree_equal(merged["params"], np_tree["params"])


def test_dinov2_roundtrip():
    from instantir_tpu.models.dinov2 import DINOv2Model, tiny_dinov2_config

    dcfg = tiny_dinov2_config()
    dino = DINOv2Model(dcfg)
    tree = dino.init(jax.random.PRNGKey(0), jnp.zeros((1, dcfg.image_size, dcfg.image_size, 3)))
    tree = jax.tree_util.tree_map(lambda x: jnp.asarray(np.random.default_rng(5).normal(size=x.shape), x.dtype), tree)
    sd = f2t.export_dinov2(jax.tree_util.tree_map(np.asarray, tree), dcfg)
    back = t2f.convert_dinov2(sd, dcfg)
    _tree_equal(back["params"], jax.tree_util.tree_map(np.asarray, tree)["params"])


def test_clip_text_roundtrip():
    from instantir_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

    ccfg = CLIPTextConfig(vocab_size=50, hidden_size=16, num_layers=2, num_heads=2,
                          intermediate_size=32, max_length=8, projection_dim=12)
    clip = CLIPTextModel(ccfg)
    tree = clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    tree = jax.tree_util.tree_map(lambda x: jnp.asarray(np.random.default_rng(6).normal(size=x.shape), x.dtype), tree)
    sd = f2t.export_clip_text(jax.tree_util.tree_map(np.asarray, tree), ccfg)
    back = t2f.convert_clip_text(sd, ccfg)
    _tree_equal(back["params"], jax.tree_util.tree_map(np.asarray, tree)["params"])


def test_torch_layout_symmetry_all_families(tiny_trees):
    """torch→flax→torch must reproduce the torch-layout state dict bit-exactly
    — exact KEY SET, shapes, and values — for every checkpoint family the
    reference ships (SDXL UNet, VAE, aggregator.pt, adapter.pt's image_proj
    [Resampler] and ip_adapter dicts, DINOv2, CLIP; the reference's loaders:
    module/ip_adapter/utils.py:73-161, pipelines/sdxl_instantir.py:350-397).
    The flax→torch→flax direction (tests above) cannot catch an export that
    emits keys real checkpoints don't have; this direction closes the loop —
    together with test_hf_parity (convert_* consuming REAL transformers state
    dicts) it is the strongest local guarantee that released weights load."""
    from instantir_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from instantir_tpu.models.dinov2 import DINOv2Model, tiny_dinov2_config

    ucfg, unet_tree = tiny_trees
    np_unet = jax.tree_util.tree_map(np.asarray, unet_tree)

    def randomized(module, init, seed):
        tree = init()
        return jax.tree_util.tree_map(
            lambda x: np.asarray(np.random.default_rng(seed).normal(size=x.shape), x.dtype), tree
        )

    agg = Aggregator(ucfg, use_flash=False)
    agg_tree = randomized(agg, lambda: agg.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16, 16, 4)), added_text_embeds=jnp.zeros((1, 16)),
        added_time_ids=jnp.zeros((1, 6))), 7)
    vcfg = tiny_vae_config()
    vae = AutoencoderKL(vcfg)
    vae_tree = randomized(vae, lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))), 8)
    rcfg = tiny_resampler_config(lora_rank=2)
    res = Resampler(rcfg)
    res_tree = randomized(res, lambda: res.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, rcfg.embedding_dim))), 9)
    dcfg = tiny_dinov2_config()
    dino = DINOv2Model(dcfg)
    dino_tree = randomized(dino, lambda: dino.init(
        jax.random.PRNGKey(0), jnp.zeros((1, dcfg.image_size, dcfg.image_size, 3))), 10)
    ccfg = CLIPTextConfig(vocab_size=50, hidden_size=16, num_layers=2, num_heads=2,
                          intermediate_size=32, max_length=8, projection_dim=12)
    clip = CLIPTextModel(ccfg)
    clip_tree = randomized(clip, lambda: clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)), 11)

    families = {
        "unet": (f2t.export_unet(np_unet), lambda sd: f2t.export_unet(t2f.convert_unet(sd, ucfg))),
        "aggregator": (f2t.export_aggregator(agg_tree),
                       lambda sd: f2t.export_aggregator(t2f.convert_aggregator(sd, ucfg))),
        "vae": (f2t.export_vae(vae_tree), lambda sd: f2t.export_vae(t2f.convert_vae(sd, vcfg))),
        "image_proj": (f2t.export_resampler(res_tree),
                       lambda sd: f2t.export_resampler(t2f.convert_resampler(sd, rcfg))),
        "dinov2": (f2t.export_dinov2(dino_tree, dcfg),
                   lambda sd: f2t.export_dinov2(t2f.convert_dinov2(sd, dcfg), dcfg)),
        "clip": (f2t.export_clip_text(clip_tree, ccfg),
                 lambda sd: f2t.export_clip_text(t2f.convert_clip_text(sd, ccfg), ccfg)),
    }
    # ip_adapter: convert = merge into a wiped UNet tree, export back out
    ip_sd = f2t.export_ip_adapter(np_unet, ucfg)
    families["ip_adapter"] = (
        ip_sd, lambda sd: f2t.export_ip_adapter(t2f.merge_ip_adapter(np_unet, sd, ucfg), ucfg))

    for name, (sd, roundtrip) in families.items():
        assert sd, f"{name}: empty torch state dict"
        sd2 = roundtrip(sd)
        assert set(sd2) == set(sd), (
            f"{name}: key sets differ — only-in-export {sorted(set(sd2) - set(sd))[:5]}, "
            f"only-in-source {sorted(set(sd) - set(sd2))[:5]}"
        )
        for k in sd:
            assert sd[k].shape == sd2[k].shape, f"{name}/{k}: {sd[k].shape} vs {sd2[k].shape}"
            np.testing.assert_array_equal(sd[k], sd2[k], err_msg=f"{name}/{k}")


def test_previewer_lora_merge(tiny_trees):
    ucfg, unet_tree = tiny_trees
    np_tree = jax.tree_util.tree_map(np.asarray, unet_tree)
    # export full unet sd (includes .lora_A/.lora_B keys), rename to the
    # diffusers "unet." prefixed LoRA format, wipe lora in tree, merge back.
    sd = f2t.export_unet(np_tree)
    lora_sd = {f"unet.{k}": v for k, v in sd.items() if "lora_" in k}
    assert len(lora_sd) > 0
    import copy

    wiped = copy.deepcopy(np_tree)

    def wipe(node):
        for k, v in node.items():
            if k in ("lora_a", "lora_b"):
                v["kernel"] = np.zeros_like(v["kernel"])
            elif isinstance(v, dict):
                wipe(v)

    wipe(wiped["params"])
    merged, count, _ = t2f.merge_previewer_lora(wiped, lora_sd, ucfg)
    assert count == len(lora_sd)
    _tree_equal(merged["params"], np_tree["params"])
