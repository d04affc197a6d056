"""Assemble the full-scale InstantIR pipeline from released checkpoints.

Mirrors the reference loading sequence (``infer.py:114-144``):
  1. SDXL base (diffusers layout: unet/, vae/, text_encoder*/, tokenizer*/)
  2. ``adapter.pt``      → Resampler + ip-attention weights into the UNet
  3. ``previewer_lora_weights.bin`` → LoRA leaves in UNet + Resampler
  4. ``aggregator.pt``   → Aggregator
  5. DINOv2-large        → image encoder

All torch→flax conversion happens through ``instantir_tpu.convert``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from instantir_tpu.convert import torch_to_flax as t2f
from instantir_tpu.models.aggregator import Aggregator
from instantir_tpu.models.clip_text import (
    CLIPTextModel,
    clip_vit_l_text_config,
    open_clip_bigg_text_config,
)
from instantir_tpu.models.dinov2 import DINOv2Model, dinov2_large_config
from instantir_tpu.models.resampler import Resampler, instantir_resampler_config
from instantir_tpu.models.unet import UNet2DConditionModel, sdxl_base_config
from instantir_tpu.models.vae import AutoencoderKL, sdxl_vae_config
from instantir_tpu.pipeline.instantir import InstantIRPipeline
from instantir_tpu.schedulers.diffusion import sdxl_schedule


def _find_weights(folder: str) -> str:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "diffusion_pytorch_model.bin",
        "model.safetensors",
        "pytorch_model.bin",
    ):
        p = os.path.join(folder, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weights found under {folder}")


def jax_tree_cast(tree, dtype):
    import jax

    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def load_instantir_pipeline(
    sdxl_path: str,
    instantir_path: str,
    vision_encoder_path: Optional[str] = None,
    adapter_path: Optional[str] = None,
    previewer_lora_path: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
    use_flash: bool = True,
) -> InstantIRPipeline:
    """Build an InstantIRPipeline with converted released weights.

    ``dtype`` is the UNet/aggregator param+compute dtype (bf16 by default —
    the TPU analogue of the reference's fp16); the VAE stays fp32
    (``force_upcast``).
    """
    unet_cfg = sdxl_base_config(with_ip=True, lora_rank=64)
    vae_cfg = sdxl_vae_config()
    res_cfg = instantir_resampler_config(lora_rank=64)
    dino_cfg = dinov2_large_config()

    # UNet + adapter + LoRA
    unet_sd = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "unet")))
    unet_tree = t2f.convert_unet(unet_sd, unet_cfg)

    adapter_file = adapter_path or os.path.join(instantir_path, "adapter.pt")
    adapter_sd = t2f.load_torch_state_dict(adapter_file)
    image_proj_sd = {k[len("image_proj."):]: v for k, v in adapter_sd.items() if k.startswith("image_proj.")}
    ip_sd = {k[len("ip_adapter."):]: v for k, v in adapter_sd.items() if k.startswith("ip_adapter.")}
    unet_tree = t2f.merge_ip_adapter(unet_tree, ip_sd, unet_cfg)
    resampler_tree = t2f.convert_resampler(image_proj_sd, res_cfg)

    lora_file = previewer_lora_path or os.path.join(instantir_path, "previewer_lora_weights.bin")
    if os.path.exists(lora_file):
        lora_sd = t2f.load_torch_state_dict(lora_file)
        unet_tree, n = t2f.merge_previewer_lora(unet_tree, lora_sd, unet_cfg)
        print(f"[load] merged {n} previewer-LoRA tensors")

    # Aggregator
    agg_sd = t2f.load_torch_state_dict(os.path.join(instantir_path, "aggregator.pt"))
    agg_tree = t2f.convert_aggregator(agg_sd, unet_cfg)

    # VAE (fp32)
    vae_sd = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "vae")))
    vae_tree = t2f.convert_vae(vae_sd, vae_cfg)

    # DINOv2
    dino_tree = None
    if vision_encoder_path:
        dino_sd = t2f.load_torch_state_dict(_find_weights(vision_encoder_path))
        dino_tree = t2f.convert_dinov2(dino_sd, dino_cfg)

    # fill missing LoRA leaves with zeros by initializing and overlaying
    import jax

    unet = UNet2DConditionModel(unet_cfg, use_flash=use_flash, dtype=dtype, param_dtype=dtype)
    aggregator = Aggregator(unet_cfg, use_flash=use_flash, dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.float32)
    resampler = Resampler(res_cfg, dtype=dtype, param_dtype=dtype)
    dino = DINOv2Model(dino_cfg, dtype=dtype, param_dtype=dtype)

    params = {
        "unet": jax_tree_cast(unet_tree, dtype),
        "aggregator": jax_tree_cast(agg_tree, dtype),
        "vae": jax_tree_cast(vae_tree, jnp.float32),
        "resampler": jax_tree_cast(resampler_tree, dtype),
        "image_encoder": jax_tree_cast(dino_tree, dtype) if dino_tree else None,
    }
    return InstantIRPipeline(unet, aggregator, vae, resampler, dino, sdxl_schedule(), params)


def load_text_encoders(sdxl_path: str, dtype: Any = jnp.bfloat16):
    """Both CLIP text towers + tokenizers from a diffusers SDXL layout."""
    from transformers import CLIPTokenizer

    cfg1 = clip_vit_l_text_config()
    cfg2 = open_clip_bigg_text_config()
    enc1 = CLIPTextModel(cfg1, dtype=dtype, param_dtype=dtype)
    enc2 = CLIPTextModel(cfg2, dtype=dtype, param_dtype=dtype)
    sd1 = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "text_encoder")))
    sd2 = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "text_encoder_2")))
    p1 = jax_tree_cast(t2f.convert_clip_text(sd1, cfg1), dtype)
    p2 = jax_tree_cast(t2f.convert_clip_text(sd2, cfg2), dtype)
    tok1 = CLIPTokenizer.from_pretrained(os.path.join(sdxl_path, "tokenizer"))
    tok2 = CLIPTokenizer.from_pretrained(os.path.join(sdxl_path, "tokenizer_2"))
    return (enc1, p1, tok1), (enc2, p2, tok2)
