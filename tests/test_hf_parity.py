"""Cross-implementation parity vs HuggingFace transformers (random weights).

These tests instantiate *real* HF torch models (tiny configs, random init),
export their state dicts through ``convert/torch_to_flax``, and compare
outputs — validating both the converters and this framework's CLIP/DINOv2
math against the reference implementations the torch pipeline uses
(``pipelines/sdxl_instantir.py:264-272`` CLIP towers;
``module/ip_adapter/utils.py:181-199`` DINOv2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantir_tpu.convert.torch_to_flax import convert_clip_text, convert_dinov2
from instantir_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from instantir_tpu.models.dinov2 import DINOv2Config, DINOv2Model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_clip_text_matches_transformers(rng):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        eos_token_id=999,  # non-legacy id: HF pools at the first-EOS position (eos=2 triggers
        # its legacy argmax-of-token-ids hack, only valid for the real CLIP vocab)
        bos_token_id=1,
        pad_token_id=0,
    )
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=3, num_heads=4, intermediate_size=64,
        hidden_act="quick_gelu", projection_dim=hf_cfg.projection_dim, eos_token_id=999,
    )
    model = CLIPTextModel(cfg)
    params = convert_clip_text(sd, cfg)

    ids = rng.integers(3, 990, size=(2, 12)).astype(np.int64)
    ids[:, -1] = 999  # EOS
    last, penult, pooled = model.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(last), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(penult), out.hidden_states[-2].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), out.text_embeds.numpy(), rtol=1e-4, atol=1e-5)


def test_dinov2_matches_transformers(rng):
    hf_cfg = transformers.Dinov2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        patch_size=14,
        image_size=28,
        layerscale_value=1e-2,
    )
    hf = transformers.Dinov2Model(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = DINOv2Config(
        hidden_size=32, num_layers=2, num_heads=4, mlp_ratio=4, patch_size=14, image_size=28,
        layerscale_init=1e-2,
    )
    model = DINOv2Model(cfg)
    params = convert_dinov2(sd, cfg)

    img = rng.uniform(size=(2, 28, 28, 3)).astype(np.float32)
    mine = model.apply(params, jnp.asarray(img))
    with torch.no_grad():
        ref = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(mine), ref, rtol=1e-4, atol=1e-5)
