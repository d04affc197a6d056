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


def fill_missing_leaves(tree: Dict, shapes: Dict, rng: np.random.Generator) -> Dict:
    """Complete a converted tree against an eval_shape template: leaves absent
    from the checkpoint are created — zero-init for LoRA B / zero-convs /
    biases, lecun-normal for everything else (fresh adapter/LoRA training
    starts from these)."""

    def walk(dst, tmpl, path):
        for key, tval in tmpl.items():
            if isinstance(tval, dict):
                walk(dst.setdefault(key, {}), tval, path + (key,))
            elif key not in dst:
                shape, jdtype = tval.shape, tval.dtype
                name = str(key)
                if name == "bias" or "lora_b" in path or "zero_conv" in path:
                    dst[key] = np.zeros(shape, np.float32)
                elif name == "scale":
                    dst[key] = np.ones(shape, np.float32)
                else:
                    fan_in = int(np.prod(shape[:-1])) if len(shape) >= 2 else int(shape[0])
                    dst[key] = rng.normal(scale=1.0 / np.sqrt(max(fan_in, 1)), size=shape).astype(np.float32)

    walk(tree["params"], shapes["params"], ())
    return tree


def build_aggregator_tree(unet_tree: Dict, shapes: Dict, rng: np.random.Generator) -> Dict:
    """Fresh Aggregator from UNet weights (``Aggregator.from_unet`` semantics,
    reference ``module/aggregator.py:563-578``): conv_in/ref_conv_in/time
    embeds/down/mid copied from the UNet; SFT heads random, zero-convs zero."""
    from instantir_tpu.pipeline.factory import init_aggregator_from_unet

    tree = fill_missing_leaves({"params": {}}, shapes, rng)
    return init_aggregator_from_unet(unet_tree, tree)


def load_instantir_pipeline(
    sdxl_path: str,
    instantir_path: Optional[str] = None,
    vision_encoder_path: Optional[str] = None,
    adapter_path: Optional[str] = None,
    previewer_lora_path: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
    use_flash: bool = True,
) -> InstantIRPipeline:
    """Build an InstantIRPipeline with converted released weights.

    ``dtype`` is the UNet/aggregator param+compute dtype (bf16 by default —
    the TPU analogue of the reference's fp16); the VAE stays fp32
    (``force_upcast``). InstantIR artifacts (adapter.pt, previewer LoRA,
    aggregator.pt) are each optional — missing pieces are freshly initialized
    so the stage-1/stage-2 trainers can bootstrap from plain SDXL weights.
    """
    import jax

    unet_cfg = sdxl_base_config(with_ip=True, lora_rank=64)
    vae_cfg = sdxl_vae_config()
    res_cfg = instantir_resampler_config(lora_rank=64)
    dino_cfg = dinov2_large_config()
    host_rng = np.random.default_rng(0)

    unet = UNet2DConditionModel(unet_cfg, use_flash=use_flash, dtype=dtype, param_dtype=dtype)
    aggregator = Aggregator(unet_cfg, use_flash=use_flash, dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.float32)
    resampler = Resampler(res_cfg, dtype=dtype, param_dtype=dtype)
    dino = DINOv2Model(dino_cfg, dtype=dtype, param_dtype=dtype)

    # shape templates (abstract — no compute)
    key = jax.random.PRNGKey(0)
    lat = 128
    unet_shapes = jax.eval_shape(
        lambda k: unet.init(
            k, jnp.zeros((1, lat, lat, 4), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 2048), dtype), jnp.zeros((1, 1280), dtype), jnp.zeros((1, 6), dtype),
            ip_hidden_states=jnp.zeros((1, 64, 2048), dtype),
        ),
        key,
    )
    agg_shapes = jax.eval_shape(
        lambda k: aggregator.init(
            k, jnp.zeros((1, lat, lat, 4), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, lat, lat, 4), dtype),
            added_text_embeds=jnp.zeros((1, 1280), dtype), added_time_ids=jnp.zeros((1, 6), dtype),
        ),
        key,
    )
    res_shapes = jax.eval_shape(
        lambda k: resampler.init(k, jnp.zeros((1, 257, res_cfg.embedding_dim), dtype)), key
    )

    # UNet base weights
    unet_sd = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "unet")))
    unet_tree = t2f.convert_unet(unet_sd, unet_cfg)

    # adapter.pt (optional): ip attention + resampler weights
    adapter_file = adapter_path or (instantir_path and os.path.join(instantir_path, "adapter.pt"))
    if adapter_file and os.path.exists(adapter_file):
        adapter_sd = t2f.load_torch_state_dict(adapter_file)
        image_proj_sd = {k[len("image_proj."):]: v for k, v in adapter_sd.items() if k.startswith("image_proj.")}
        ip_sd = {k[len("ip_adapter."):]: v for k, v in adapter_sd.items() if k.startswith("ip_adapter.")}
        unet_tree = t2f.merge_ip_adapter(unet_tree, ip_sd, unet_cfg)
        resampler_tree = t2f.convert_resampler(image_proj_sd, res_cfg)
    else:
        print("[load] no adapter.pt — ip attention + resampler freshly initialized")
        resampler_tree = {"params": {}}
    resampler_tree = fill_missing_leaves(resampler_tree, res_shapes, host_rng)
    # fill any missing UNet leaves (ip params without adapter.pt, LoRA leaves
    # always — real checkpoints carry no flax lora_a/lora_b until merged)
    unet_tree = fill_missing_leaves(unet_tree, unet_shapes, host_rng)

    # previewer LoRA (optional) — UNet part + the resampler part that lives
    # under unet.encoder_hid_proj in the torch module tree
    lora_file = previewer_lora_path or (
        instantir_path and os.path.join(instantir_path, "previewer_lora_weights.bin")
    )
    if lora_file and os.path.exists(lora_file):
        lora_sd = t2f.load_torch_state_dict(lora_file)
        unet_tree, n = t2f.merge_previewer_lora(unet_tree, lora_sd, unet_cfg)
        resampler_tree, n_res = t2f.merge_resampler_lora(resampler_tree, lora_sd)
        print(f"[load] merged {n} UNet + {n_res} resampler previewer-LoRA tensors")

    # Aggregator (optional — fresh from_unet init when absent)
    agg_file = instantir_path and os.path.join(instantir_path, "aggregator.pt")
    if agg_file and os.path.exists(agg_file):
        agg_sd = t2f.load_torch_state_dict(agg_file)
        agg_tree = t2f.convert_aggregator(agg_sd, unet_cfg)
        agg_tree = fill_missing_leaves(agg_tree, agg_shapes, host_rng)
    else:
        print("[load] no aggregator.pt — initialized from the UNet (from_unet)")
        agg_tree = build_aggregator_tree(unet_tree, agg_shapes, host_rng)

    # VAE (fp32)
    vae_sd = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "vae")))
    vae_tree = t2f.convert_vae(vae_sd, vae_cfg)

    # DINOv2
    dino_tree = None
    if vision_encoder_path:
        dino_sd = t2f.load_torch_state_dict(_find_weights(vision_encoder_path))
        dino_tree = t2f.convert_dinov2(dino_sd, dino_cfg)

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
