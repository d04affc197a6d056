"""Perceptual-loss architectures vs torch oracles (random weights).

LPIPS (VGG16+heads), the CLIP vision tower, and ArcFace IR-SE50 are compared
against independently written torch implementations (HF transformers for the
CLIP tower) through their checkpoint converters — validating both the
converter key maps and the flax math. The loss classes themselves are wired
with injected tiny params and checked for finiteness and gradient flow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from instantir_tpu.losses.arcface import ArcFaceBackbone, convert_arcface, tiny_arcface_config
from instantir_tpu.losses.augmentations import image_augmentations, projective_warp
from instantir_tpu.losses.lpips import LPIPS, convert_lpips, tiny_lpips_config
from instantir_tpu.losses.losses import (
    CLIPLoss,
    DiffusionLossInputs,
    DreamSIMLoss,
    IDLoss,
    LPIPSLoss,
)
from instantir_tpu.models.clip_vision import (
    CLIPVisionModel,
    convert_clip_vision,
    tiny_clip_vision_config,
)


# ---------------------------------------------------------------------------
# CLIP vision tower vs HF transformers
# ---------------------------------------------------------------------------


def test_clip_vision_matches_transformers(rng):
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        image_size=32, patch_size=8, projection_dim=16, hidden_act="quick_gelu",
    )
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = tiny_clip_vision_config(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64, image_size=32, patch_size=8,
        projection_dim=16,
    )
    model = CLIPVisionModel(cfg)
    params = convert_clip_vision(sd, cfg)

    img = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    tokens, proj = model.apply(params, jnp.asarray(img))
    with torch.no_grad():
        out = hf(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(proj), out.image_embeds.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tokens), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# LPIPS vs an in-test torch implementation of the lpips package's math
# ---------------------------------------------------------------------------


def _lpips_torch_sd(rng, config):
    sd = {}
    in_ch = 3
    for si, (conv_ids, ch) in enumerate(zip(config.slices, config.channels)):
        for ci in conv_ids:
            sd[f"net.slice{si + 1}.{ci}.weight"] = rng.normal(size=(ch, in_ch, 3, 3)).astype(np.float32) * 0.2
            sd[f"net.slice{si + 1}.{ci}.bias"] = rng.normal(size=(ch,)).astype(np.float32) * 0.1
            in_ch = ch
        sd[f"lin{si}.model.1.weight"] = np.abs(rng.normal(size=(1, ch, 1, 1)).astype(np.float32))
    return sd


def _lpips_torch_forward(sd, config, x, y):
    """The lpips.LPIPS(net='vgg') math, transcribed (eval mode)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def trunk_feats(img):
        h = (img - shift) / scale
        feats = []
        for si, conv_ids in enumerate(config.slices):
            if si > 0:
                h = torch.nn.functional.max_pool2d(h, 2)
            for ci in conv_ids:
                w = torch.from_numpy(sd[f"net.slice{si + 1}.{ci}.weight"])
                b = torch.from_numpy(sd[f"net.slice{si + 1}.{ci}.bias"])
                h = torch.relu(torch.nn.functional.conv2d(h, w, b, padding=1))
            feats.append(h / torch.sqrt((h * h).sum(1, keepdim=True) + config.eps))
        return feats

    total = 0.0
    for si, (fx, fy) in enumerate(zip(trunk_feats(x), trunk_feats(y))):
        d = (fx - fy) ** 2
        w = torch.from_numpy(sd[f"lin{si}.model.1.weight"])
        total = total + torch.nn.functional.conv2d(d, w).mean(dim=(1, 2, 3))
    return total


def test_lpips_matches_torch_oracle(rng):
    cfg = tiny_lpips_config()
    sd = _lpips_torch_sd(rng, cfg)
    module = LPIPS(cfg)
    params = convert_lpips(sd, cfg)
    x = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    mine = module.apply(params, jnp.asarray(x), jnp.asarray(y))
    ref = _lpips_torch_forward(
        sd, cfg, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
    )
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), rtol=1e-4, atol=1e-6)


def test_lpips_loss_zero_for_identical_and_differentiable(rng):
    cfg = tiny_lpips_config()
    params = convert_lpips(_lpips_torch_sd(rng, cfg), cfg)
    loss = LPIPSLoss(params=params, config=cfg)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 16, 3)), jnp.float32)
    same = loss(DiffusionLossInputs(predicted=x, target=x, pred_image=x, target_image=x))
    assert float(same) < 1e-10

    def f(img):
        return loss(DiffusionLossInputs(predicted=img, target=x, pred_image=img, target_image=x))

    g = jax.grad(f)(x * 0.5)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_lpips_loss_requires_weights():
    with pytest.raises(NotImplementedError):
        LPIPSLoss()


# ---------------------------------------------------------------------------
# ArcFace IR-SE50 vs an in-test torch implementation
# ---------------------------------------------------------------------------


def _arcface_torch_sd(rng, cfg):
    sd = {}

    def bn(prefix, ch):
        sd[f"{prefix}.weight"] = np.abs(rng.normal(size=(ch,)).astype(np.float32)) + 0.5
        sd[f"{prefix}.bias"] = rng.normal(size=(ch,)).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = rng.normal(size=(ch,)).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = np.abs(rng.normal(size=(ch,)).astype(np.float32)) + 0.5

    sd["input_layer.0.weight"] = rng.normal(size=(cfg.stem_channels, 3, 3, 3)).astype(np.float32) * 0.2
    bn("input_layer.1", cfg.stem_channels)
    sd["input_layer.2.weight"] = np.abs(rng.normal(size=(cfg.stem_channels,)).astype(np.float32)) * 0.25

    bi = 0
    in_ch = cfg.stem_channels
    for depth, n_units in cfg.stages:
        for u in range(n_units):
            q = f"body.{bi}"
            bn(f"{q}.res_layer.0", in_ch)
            sd[f"{q}.res_layer.1.weight"] = rng.normal(size=(depth, in_ch, 3, 3)).astype(np.float32) * 0.2
            sd[f"{q}.res_layer.2.weight"] = np.abs(rng.normal(size=(depth,)).astype(np.float32)) * 0.25
            sd[f"{q}.res_layer.3.weight"] = rng.normal(size=(depth, depth, 3, 3)).astype(np.float32) * 0.2
            bn(f"{q}.res_layer.4", depth)
            sd[f"{q}.res_layer.5.fc1.weight"] = rng.normal(
                size=(depth // cfg.se_reduction, depth, 1, 1)
            ).astype(np.float32) * 0.3
            sd[f"{q}.res_layer.5.fc2.weight"] = rng.normal(
                size=(depth, depth // cfg.se_reduction, 1, 1)
            ).astype(np.float32) * 0.3
            if in_ch != depth:
                sd[f"{q}.shortcut_layer.0.weight"] = rng.normal(size=(depth, in_ch, 1, 1)).astype(np.float32) * 0.3
                bn(f"{q}.shortcut_layer.1", depth)
            in_ch = depth
            bi += 1

    spatial = cfg.input_size // (2 ** len(cfg.stages))
    flat = cfg.stages[-1][0] * spatial * spatial
    bn("output_layer.0", in_ch)
    sd["output_layer.3.weight"] = rng.normal(size=(cfg.embedding_dim, flat)).astype(np.float32) * 0.1
    sd["output_layer.3.bias"] = rng.normal(size=(cfg.embedding_dim,)).astype(np.float32) * 0.1
    bn("output_layer.4", cfg.embedding_dim)
    return sd


def _arcface_torch_forward(sd, cfg, x):
    eps = 1e-5

    def bn(prefix, h):
        w = torch.from_numpy(sd[f"{prefix}.weight"])
        b = torch.from_numpy(sd[f"{prefix}.bias"])
        m = torch.from_numpy(sd[f"{prefix}.running_mean"])
        v = torch.from_numpy(sd[f"{prefix}.running_var"])
        shape = (1, -1, 1, 1) if h.dim() == 4 else (1, -1)
        return (h - m.view(shape)) / torch.sqrt(v.view(shape) + eps) * w.view(shape) + b.view(shape)

    def prelu(h, a):
        a = torch.from_numpy(a).view(1, -1, 1, 1)
        return torch.clamp(h, min=0) + a * torch.clamp(h, max=0)

    h = torch.nn.functional.conv2d(x, torch.from_numpy(sd["input_layer.0.weight"]), padding=1)
    h = prelu(bn("input_layer.1", h), sd["input_layer.2.weight"])

    bi = 0
    in_ch = cfg.stem_channels
    for depth, n_units in cfg.stages:
        for u in range(n_units):
            q = f"body.{bi}"
            stride = 2 if u == 0 else 1
            if in_ch == depth:
                sc = h[:, :, ::stride, ::stride]
            else:
                sc = bn(f"{q}.shortcut_layer.1", torch.nn.functional.conv2d(
                    h, torch.from_numpy(sd[f"{q}.shortcut_layer.0.weight"]), stride=stride))
            r = bn(f"{q}.res_layer.0", h)
            r = torch.nn.functional.conv2d(r, torch.from_numpy(sd[f"{q}.res_layer.1.weight"]), padding=1)
            r = prelu(r, sd[f"{q}.res_layer.2.weight"])
            r = torch.nn.functional.conv2d(r, torch.from_numpy(sd[f"{q}.res_layer.3.weight"]),
                                           stride=stride, padding=1)
            r = bn(f"{q}.res_layer.4", r)
            se = r.mean(dim=(2, 3), keepdim=True)
            se = torch.relu(torch.nn.functional.conv2d(se, torch.from_numpy(sd[f"{q}.res_layer.5.fc1.weight"])))
            se = torch.sigmoid(torch.nn.functional.conv2d(se, torch.from_numpy(sd[f"{q}.res_layer.5.fc2.weight"])))
            h = r * se + sc
            in_ch = depth
            bi += 1

    h = bn("output_layer.0", h)
    h = h.flatten(1)  # NCHW flatten
    h = torch.nn.functional.linear(h, torch.from_numpy(sd["output_layer.3.weight"]),
                                   torch.from_numpy(sd["output_layer.3.bias"]))
    h = bn("output_layer.4", h)
    return h / h.norm(dim=-1, keepdim=True)


def test_arcface_matches_torch_oracle(rng):
    cfg = tiny_arcface_config()
    sd = _arcface_torch_sd(rng, cfg)
    model = ArcFaceBackbone(cfg)
    params = convert_arcface(sd, cfg)
    x = rng.uniform(-1, 1, size=(2, cfg.input_size, cfg.input_size, 3)).astype(np.float32)
    mine = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = _arcface_torch_forward(sd, cfg, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Augmentations
# ---------------------------------------------------------------------------


def test_projective_warp_identity(rng):
    img = jnp.asarray(rng.uniform(size=(12, 12, 3)), jnp.float32)
    out = projective_warp(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_image_augmentations_layout(rng):
    imgs = jnp.asarray(rng.uniform(size=(2, 24, 24, 3)), jnp.float32)
    out = image_augmentations(jax.random.PRNGKey(0), imgs, output_size=16, augmentations_number=3)
    assert out.shape == (6, 16, 16, 3)
    # first B tiles are the un-augmented resizes
    resized = jax.image.resize(imgs, (2, 16, 16, 3), method="bilinear")
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(resized), atol=1e-6)
    # augmented tiles differ from the plain resize
    assert np.abs(np.asarray(out[2:4]) - np.asarray(resized)).max() > 1e-3
    # deterministic per key
    out2 = image_augmentations(jax.random.PRNGKey(0), imgs, output_size=16, augmentations_number=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=0)


# ---------------------------------------------------------------------------
# Loss wiring (injected tiny weights / fns)
# ---------------------------------------------------------------------------


def _tiny_clip_params(rng):
    from instantir_tpu.models.clip_text import CLIPTextModel, tiny_clip_text_config
    from instantir_tpu.models.clip_vision import CLIPVisionModel

    vcfg = tiny_clip_vision_config()
    tcfg = tiny_clip_text_config(projection_dim=vcfg.projection_dim)  # shared CLIP embedding space
    vision = CLIPVisionModel(vcfg)
    text = CLIPTextModel(tcfg)
    vp = vision.init(jax.random.PRNGKey(0), jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))
    tp = text.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return vcfg, tcfg, vp, tp


def test_clip_loss_finite_and_differentiable(rng):
    vcfg, tcfg, vp, tp = _tiny_clip_params(rng)
    loss = CLIPLoss(params=(vp, tp, 100.0), augmentations_number=2, vision_config=vcfg, text_config=tcfg)
    img = jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(2, 900, size=(2, 8)), jnp.int32)

    def f(x):
        return loss(DiffusionLossInputs(predicted=x, target=x, pred_image=x, prompt_ids=ids,
                                        key=jax.random.PRNGKey(3)))

    val, g = jax.value_and_grad(f)(img)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_id_loss_with_injected_detector(rng):
    cfg = tiny_arcface_config()
    sd = _arcface_torch_sd(rng, cfg)
    params = convert_arcface(sd, cfg)

    def detect(images):
        b = images.shape[0]
        s = images.shape[1]
        # fixed plausible 5-point landmarks; sample 1 "not found"
        base = np.asarray([[0.3, 0.4], [0.7, 0.4], [0.5, 0.6], [0.35, 0.8], [0.65, 0.8]]) * s
        return np.tile(base[None], (b, 1, 1)).astype(np.float32), ([1] if b > 1 else [])

    loss = IDLoss(params=params, detect_fn=detect, config=cfg)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 32, 3)), jnp.float32)
    val = loss(DiffusionLossInputs(predicted=x, target=y, pred_image=x, target_image=y))
    assert np.isfinite(float(val))
    # identical images → zero distance (cos = 1) on the valid subset
    same = loss(DiffusionLossInputs(predicted=x, target=x, pred_image=x, target_image=x))
    assert float(same) < 1e-5


def test_dreamsim_loss_with_injected_backbone(rng):
    from instantir_tpu.models.dinov2 import DINOv2Model, tiny_dinov2_config

    dcfg = tiny_dinov2_config()
    dino = DINOv2Model(dcfg)
    dparams = dino.init(jax.random.PRNGKey(0), jnp.zeros((1, dcfg.image_size, dcfg.image_size, 3)))

    def embed(images01):
        return dino.apply(dparams, images01)[:, 0]  # CLS token

    loss = DreamSIMLoss(embed_fns=[embed], resize_to=dcfg.image_size)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 24, 24, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, size=(2, 24, 24, 3)), jnp.float32)
    val = loss(DiffusionLossInputs(predicted=x, target=y, pred_image=x, target_image=y))
    assert np.isfinite(float(val)) and float(val) >= 0
    same = loss(DiffusionLossInputs(predicted=x, target=x, pred_image=x, target_image=x))
    assert float(same) < 1e-5
