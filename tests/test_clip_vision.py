"""CLIP vision tower + ``--use_clip_encoder`` path (ADVICE r3 medium).

Oracle is HF transformers' ``CLIPVisionModelWithProjection`` (the class the
reference loads for its CLIP branch, ``module/ip_adapter/utils.py:104-111``)
at a tiny random-init config:

  * full-tower parity (tokens / pooled projection / every hidden state);
  * ``CLIPImageEncoder`` == ``hidden_states[-2]`` including the
    ImageNet→CLIP renormalization the wrapper performs;
  * ``clip_vision_config_from_json`` field mapping (flat + nested);
  * ``load_instantir_pipeline(use_clip_encoder=True)`` end-to-end from an
    on-disk HF-format checkpoint, through image-embed encode + ip projection.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantir_tpu.models.clip_vision import (
    CLIP_MEAN,
    CLIP_STD,
    CLIPImageEncoder,
    CLIPVisionConfig,
    CLIPVisionModel,
    convert_clip_image_encoder,
    convert_clip_vision,
)
from instantir_tpu.models.dinov2 import DINOV2_MEAN, DINOV2_STD
from instantir_tpu.pipeline.load import clip_vision_config_from_json

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_cli_e2e import checkpoint_tree  # noqa: E402,F401  (fixture)

HF_KW = dict(
    hidden_size=16,
    num_hidden_layers=3,
    num_attention_heads=2,
    intermediate_size=32,
    image_size=32,
    patch_size=8,
    projection_dim=8,
    hidden_act="quick_gelu",
)


@pytest.fixture(scope="module")
def hf_clip():
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(transformers.CLIPVisionConfig(**HF_KW)).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = CLIPVisionConfig(
        hidden_size=16, num_layers=3, num_heads=2, intermediate_size=32,
        image_size=32, patch_size=8, projection_dim=8,
    )
    return hf, sd, cfg


def test_clip_vision_matches_transformers(hf_clip, rng):
    hf, sd, cfg = hf_clip
    model = CLIPVisionModel(cfg)
    params = convert_clip_vision(sd, cfg)

    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    tokens, proj = model.apply(params, jnp.asarray(pixels))
    with torch.no_grad():
        out = hf(torch.from_numpy(pixels.transpose(0, 3, 1, 2)), output_hidden_states=True)
    # HF's last_hidden_state is pre-post-LN; image_embeds = proj(post-LN CLS)
    np.testing.assert_allclose(np.asarray(tokens), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(proj), out.image_embeds.numpy(), rtol=1e-4, atol=1e-5)


def test_clip_image_encoder_penultimate_hidden_states(hf_clip, rng):
    """The wrapper must equal hidden_states[-2] (the reference's live CLIP
    selection, sdxl_instantir.py:643,698) on the SAME source image, fed to
    the wrapper in the framework's ImageNet-normalized form."""
    hf, sd, cfg = hf_clip
    enc = CLIPImageEncoder(cfg)
    params = convert_clip_image_encoder(sd, cfg)

    x01 = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    imagenet = (x01 - np.asarray(DINOV2_MEAN, np.float32)) / np.asarray(DINOV2_STD, np.float32)
    tokens = enc.apply(params, jnp.asarray(imagenet))

    clip_in = (x01 - CLIP_MEAN) / CLIP_STD
    with torch.no_grad():
        out = hf(torch.from_numpy(clip_in.transpose(0, 3, 1, 2)), output_hidden_states=True)
    ref = out.hidden_states[-2].numpy()
    assert tokens.shape == ref.shape
    np.testing.assert_allclose(np.asarray(tokens), ref, rtol=1e-4, atol=1e-5)


def test_clip_image_encoder_ignores_unused_tail(hf_clip, rng):
    """Zeroing the last layer / post-norm / projection leaves in the torch
    state dict must not change the wrapper's output — proof the converted
    tree genuinely skips them (hidden_states[-2] semantics)."""
    hf, sd, cfg = hf_clip
    enc = CLIPImageEncoder(cfg)
    mutated = dict(sd)
    last = cfg.num_layers - 1
    for k in sd:
        if f"encoder.layers.{last}." in k or "post_layernorm" in k or k == "visual_projection.weight":
            mutated[k] = np.zeros_like(sd[k])
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    a = enc.apply(convert_clip_image_encoder(sd, cfg), x)
    b = enc.apply(convert_clip_image_encoder(mutated, cfg), x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clip_vision_config_from_json():
    flat = dict(HF_KW)
    flat["num_hidden_layers"] = flat.pop("num_hidden_layers", 3)
    d = {
        "hidden_size": 16, "num_hidden_layers": 3, "num_attention_heads": 2,
        "intermediate_size": 32, "image_size": 32, "patch_size": 8,
        "projection_dim": 8, "hidden_act": "quick_gelu", "layer_norm_eps": 1e-6,
    }
    for payload in (d, {"vision_config": d}):  # CLIPVisionModel vs full CLIPModel config.json
        cfg = clip_vision_config_from_json(payload)
        assert cfg == CLIPVisionConfig(
            hidden_size=16, num_layers=3, num_heads=2, intermediate_size=32,
            image_size=32, patch_size=8, projection_dim=8, eps=1e-6,
        )


def test_load_pipeline_with_clip_encoder(hf_clip, checkpoint_tree, tmp_path, rng):  # noqa: F811
    """use_clip_encoder=True end-to-end: HF-format CLIP checkpoint on disk →
    loader branch → image-embed encode at the CLIP grid → Resampler tokens.
    The tiny CLIP's hidden_size (16) matches the tree's resampler
    embedding_dim, exactly like the real pairing the reference relies on
    (Resampler embedding_dim = image_encoder.config.hidden_size)."""
    from instantir_tpu.pipeline.load import load_instantir_pipeline

    hf, sd, cfg = hf_clip
    clip_dir = tmp_path / "clip"
    clip_dir.mkdir()
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               clip_dir / "pytorch_model.bin")
    with open(clip_dir / "config.json", "w") as f:
        json.dump({"architectures": ["CLIPVisionModelWithProjection"],
                   "layer_norm_eps": 1e-5, **HF_KW}, f)

    pipe = load_instantir_pipeline(
        sdxl_path=str(checkpoint_tree / "sdxl"),
        instantir_path=str(checkpoint_tree / "instantir"),
        vision_encoder_path=str(clip_dir),
        adapter_path=str(checkpoint_tree / "instantir" / "adapter.pt"),
        previewer_lora_path=str(checkpoint_tree / "instantir" / "previewer_lora_weights.bin"),
        dtype=jnp.float32,
        use_flash=False,
        use_clip_encoder=True,
    )
    assert isinstance(pipe.image_encoder, CLIPImageEncoder)
    assert pipe.image_encoder.config.image_size == cfg.image_size

    lq = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    cond, uncond = pipe.encode_image_embeds(pipe.params, lq)
    n_tokens = (cfg.image_size // cfg.patch_size) ** 2 + 1
    assert cond.shape == (1, n_tokens, cfg.hidden_size) == uncond.shape
    assert np.isfinite(np.asarray(cond)).all()

    ip = pipe.project_ip_tokens(pipe.params, cond)
    assert np.isfinite(np.asarray(ip)).all()
