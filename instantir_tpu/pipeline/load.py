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


def _read_config(folder: str) -> Optional[Dict[str, Any]]:
    p = os.path.join(folder, "config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def unet_config_from_json(d: Dict[str, Any], **overrides):
    """diffusers ``UNet2DConditionModel`` config.json → UNetConfig (the
    from_pretrained behavior the reference relies on at ``infer.py:117``)."""
    from instantir_tpu.models.unet import UNetConfig

    heads = d.get("num_attention_heads") or d["attention_head_dim"]  # diffusers SDXL quirk
    tl = d.get("transformer_layers_per_block", 1)
    fields = dict(
        sample_size=d.get("sample_size", 128),
        in_channels=d.get("in_channels", 4),
        out_channels=d.get("out_channels", 4),
        down_block_types=tuple(d["down_block_types"]),
        up_block_types=tuple(d["up_block_types"]),
        block_out_channels=tuple(d["block_out_channels"]),
        layers_per_block=d.get("layers_per_block", 2),
        transformer_layers_per_block=tuple(tl) if isinstance(tl, (list, tuple)) else (tl,) * len(d["down_block_types"]),
        num_attention_heads=tuple(heads) if isinstance(heads, (list, tuple)) else (heads,) * len(d["down_block_types"]),
        cross_attention_dim=d.get("cross_attention_dim", 2048),
        addition_time_embed_dim=d.get("addition_time_embed_dim", 256),
        projection_class_embeddings_input_dim=d.get("projection_class_embeddings_input_dim", 2816),
        norm_num_groups=d.get("norm_num_groups", 32),
        time_cond_proj_dim=d.get("time_cond_proj_dim"),
        flip_sin_to_cos=d.get("flip_sin_to_cos", True),
        freq_shift=float(d.get("freq_shift", 0)),
    )
    fields.update(overrides)
    return UNetConfig(**fields)


def vae_config_from_json(d: Dict[str, Any]):
    from instantir_tpu.models.vae import VAEConfig

    return VAEConfig(
        in_channels=d.get("in_channels", 3),
        out_channels=d.get("out_channels", 3),
        latent_channels=d.get("latent_channels", 4),
        block_out_channels=tuple(d["block_out_channels"]),
        layers_per_block=d.get("layers_per_block", 2),
        norm_num_groups=d.get("norm_num_groups", 32),
        scaling_factor=d.get("scaling_factor", 0.13025),
        latents_mean=tuple(d["latents_mean"]) if d.get("latents_mean") else None,
        latents_std=tuple(d["latents_std"]) if d.get("latents_std") else None,
        force_upcast=d.get("force_upcast", True),
    )


def clip_config_from_json(d: Dict[str, Any]):
    from instantir_tpu.models.clip_text import CLIPTextConfig

    with_proj = "CLIPTextModelWithProjection" in (d.get("architectures") or [])
    return CLIPTextConfig(
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        num_layers=d["num_hidden_layers"],
        num_heads=d["num_attention_heads"],
        intermediate_size=d["intermediate_size"],
        max_length=d.get("max_position_embeddings", 77),
        hidden_act=d.get("hidden_act", "quick_gelu"),
        projection_dim=d.get("projection_dim") if with_proj else None,
        eos_token_id=d.get("eos_token_id", 49407),
    )


def dinov2_config_from_json(d: Dict[str, Any]):
    from instantir_tpu.models.dinov2 import DINOv2Config

    return DINOv2Config(
        hidden_size=d["hidden_size"],
        num_layers=d["num_hidden_layers"],
        num_heads=d["num_attention_heads"],
        mlp_ratio=d.get("mlp_ratio", 4),
        patch_size=d.get("patch_size", 14),
        image_size=d.get("image_size", 224),
        layerscale_init=d.get("layerscale_value", 1e-5),
    )


def clip_vision_config_from_json(d: Dict[str, Any]):
    """HF CLIP vision config (``config.json``, optionally nested under
    ``vision_config``) → ``CLIPVisionConfig``."""
    from instantir_tpu.models.clip_vision import CLIPVisionConfig

    d = d.get("vision_config", d)
    return CLIPVisionConfig(
        hidden_size=d["hidden_size"],
        num_layers=d["num_hidden_layers"],
        num_heads=d["num_attention_heads"],
        intermediate_size=d["intermediate_size"],
        image_size=d.get("image_size", 224),
        patch_size=d.get("patch_size", 16),
        projection_dim=d.get("projection_dim", 512),
        hidden_act=d.get("hidden_act", "quick_gelu"),
        eps=d.get("layer_norm_eps", 1e-5),
    )


def instantir_config_from_json(path: Optional[str]):
    """Optional ``instantir_config.json`` next to the InstantIR artifacts:
    {"lora_rank": ..., "resampler": {ResamplerConfig fields}} — the reference
    hardcodes these (``infer.py:269-273``); artifacts exported by this
    framework may carry them explicitly."""
    if not path or not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


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
                if (
                    name == "bias" or "lora_b" in path or "zero_conv" in path
                    # AdaLayerNorm modulation linears are zero-init (identity
                    # modulation) in the module and the reference processors
                    or any(str(p).startswith("ln_") for p in path)
                ):
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
    strict: bool = True,
    use_clip_encoder: bool = False,
) -> InstantIRPipeline:
    """Build an InstantIRPipeline with converted released weights.

    ``dtype`` is the UNet/aggregator param+compute dtype (bf16 by default —
    the TPU analogue of the reference's fp16); the VAE stays fp32
    (``force_upcast``). InstantIR artifacts (adapter.pt, previewer LoRA,
    aggregator.pt) are each optional — missing pieces are freshly initialized
    so the stage-1/stage-2 trainers can bootstrap from plain SDXL weights.

    ``strict`` (default): abort when a present checkpoint only partially maps
    onto the model — a renamed LoRA/adapter key must fail loudly, like the
    reference's strict state-dict loads (``sdxl_instantir.py:386-394``,
    ``module/ip_adapter/utils.py:56-59``). ``strict=False`` downgrades the
    shortfall to a warning (deliberate partial loads).

    ``use_clip_encoder`` swaps the DINOv2 image-prompt encoder for a CLIP
    vision tower (the reference's ``--use_clip_encoder``, ``infer.py:275-279``):
    ``vision_encoder_path`` is then read as an HF
    ``CLIPVisionModelWithProjection`` checkpoint and the Resampler consumes
    the penultimate-layer hidden states (``hidden_size``-dim tokens — the
    reference's live CLIP branch, ``pipelines/sdxl_instantir.py:643,698``).
    """
    import dataclasses

    import jax

    # configs come from each checkpoint's config.json when present (the
    # from_pretrained behavior); SDXL/DINOv2-large defaults otherwise
    icfg = instantir_config_from_json(
        instantir_path and os.path.join(instantir_path, "instantir_config.json")
    ) or {}
    lora_rank = int(icfg.get("lora_rank", 64))
    d = _read_config(os.path.join(sdxl_path, "unet"))
    unet_cfg = (
        unet_config_from_json(d, with_ip=True, lora_rank=lora_rank)
        if d
        else sdxl_base_config(with_ip=True, lora_rank=lora_rank)
    )
    d = _read_config(os.path.join(sdxl_path, "vae"))
    vae_cfg = vae_config_from_json(d) if d else sdxl_vae_config()
    d = vision_encoder_path and _read_config(vision_encoder_path)
    if use_clip_encoder:
        from instantir_tpu.models.clip_vision import clip_vit_b16_config

        dino_cfg = clip_vision_config_from_json(d) if d else clip_vit_b16_config()
    else:
        dino_cfg = dinov2_config_from_json(d) if d else dinov2_large_config()
    if "resampler" in icfg:
        from instantir_tpu.models.resampler import ResamplerConfig

        # an explicit resampler lora_rank wins over the UNet-level default
        res_cfg = ResamplerConfig(**{"lora_rank": lora_rank, **icfg["resampler"]})
    else:
        res_cfg = instantir_resampler_config(
            lora_rank=lora_rank,
            embedding_dim=dino_cfg.hidden_size,
            output_dim=unet_cfg.cross_attention_dim,
        )
    host_rng = np.random.default_rng(0)

    unet = UNet2DConditionModel(unet_cfg, use_flash=use_flash, dtype=dtype, param_dtype=dtype)
    aggregator = Aggregator(unet_cfg, use_flash=use_flash, dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.float32)
    resampler = Resampler(res_cfg, dtype=dtype, param_dtype=dtype)
    if use_clip_encoder:
        from instantir_tpu.models.clip_vision import CLIPImageEncoder

        dino = CLIPImageEncoder(dino_cfg, dtype=dtype, param_dtype=dtype)
    else:
        dino = DINOv2Model(dino_cfg, dtype=dtype, param_dtype=dtype)

    # shape templates (abstract — no compute); dims all derived from configs
    key = jax.random.PRNGKey(0)
    lat = unet_cfg.sample_size
    cross = unet_cfg.cross_attention_dim
    pooled_dim = unet_cfg.projection_class_embeddings_input_dim - 6 * unet_cfg.addition_time_embed_dim
    unet_shapes = jax.eval_shape(
        lambda k: unet.init(
            k, jnp.zeros((1, lat, lat, unet_cfg.in_channels), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, cross), dtype), jnp.zeros((1, pooled_dim), dtype), jnp.zeros((1, 6), dtype),
            ip_hidden_states=jnp.zeros((1, res_cfg.num_queries, cross), dtype),
        ),
        key,
    )
    agg_shapes = jax.eval_shape(
        lambda k: aggregator.init(
            k, jnp.zeros((1, lat, lat, unet_cfg.in_channels), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, lat, lat, unet_cfg.in_channels), dtype),
            added_text_embeds=jnp.zeros((1, pooled_dim), dtype), added_time_ids=jnp.zeros((1, 6), dtype),
        ),
        key,
    )
    n_tokens = (dino_cfg.image_size // dino_cfg.patch_size) ** 2 + 1
    res_shapes = jax.eval_shape(
        lambda k: resampler.init(k, jnp.zeros((1, n_tokens, res_cfg.embedding_dim), dtype)), key
    )

    # UNet base weights
    unet_sd = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "unet")))
    unet_tree = t2f.convert_unet(unet_sd, unet_cfg)

    # adapter.pt (optional): ip attention + resampler weights
    adapter_file = adapter_path or (instantir_path and os.path.join(instantir_path, "adapter.pt"))
    if adapter_file and os.path.exists(adapter_file):
        adapter_sd = t2f.load_torch_state_dict(adapter_file)
        if any(k.startswith(("image_proj_model.", "adapter_modules.")) for k in adapter_sd):
            # legacy flat IP-Adapter checkpoints (the reference's
            # revise_state_dict, module/ip_adapter/utils.py:164-178)
            adapter_sd = {
                (
                    "image_proj." + k[len("image_proj_model."):]
                    if k.startswith("image_proj_model.")
                    else "ip_adapter." + k[len("adapter_modules."):]
                ): v
                for k, v in adapter_sd.items()
                if k.startswith(("image_proj_model.", "adapter_modules."))
            }
        image_proj_sd = {k[len("image_proj."):]: v for k, v in adapter_sd.items() if k.startswith("image_proj.")}
        ip_sd = {k[len("ip_adapter."):]: v for k, v in adapter_sd.items() if k.startswith("ip_adapter.")}
        unet_tree = t2f.merge_ip_adapter(unet_tree, ip_sd, unet_cfg, strict=strict)
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
        unet_tree, n, unet_unmatched = t2f.merge_previewer_lora(unet_tree, lora_sd, unet_cfg)
        resampler_tree, n_res, res_merged = t2f.merge_resampler_lora(resampler_tree, lora_sd)
        # full accounting: every LoRA tensor in the file must land in the
        # UNet or the resampler (unet.encoder_hid_proj in the torch tree)
        leftover = [k for k in unet_unmatched if k not in res_merged]
        if leftover:
            msg = (
                f"{len(leftover)}/{n + n_res + len(leftover)} previewer-LoRA tensors "
                f"did not merge (first: {leftover[:5]})"
            )
            if strict:
                raise ValueError(f"[load] {msg} — pass strict=False to allow a partial load")
            print(f"[load] WARNING: {msg}")
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

    # image-prompt encoder: DINOv2 (the live config) or a CLIP vision tower
    dino_tree = None
    if vision_encoder_path:
        dino_sd = t2f.load_torch_state_dict(_find_weights(vision_encoder_path))
        if use_clip_encoder:
            from instantir_tpu.models.clip_vision import convert_clip_image_encoder

            dino_tree = convert_clip_image_encoder(dino_sd, dino_cfg)
        else:
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
    """Both CLIP text towers + tokenizers from a diffusers SDXL layout
    (tower configs read from each text_encoder*/config.json when present)."""
    from transformers import CLIPTokenizer

    d1 = _read_config(os.path.join(sdxl_path, "text_encoder"))
    d2 = _read_config(os.path.join(sdxl_path, "text_encoder_2"))
    cfg1 = clip_config_from_json(d1) if d1 else clip_vit_l_text_config()
    cfg2 = clip_config_from_json(d2) if d2 else open_clip_bigg_text_config()
    enc1 = CLIPTextModel(cfg1, dtype=dtype, param_dtype=dtype)
    enc2 = CLIPTextModel(cfg2, dtype=dtype, param_dtype=dtype)
    sd1 = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "text_encoder")))
    sd2 = t2f.load_torch_state_dict(_find_weights(os.path.join(sdxl_path, "text_encoder_2")))
    p1 = jax_tree_cast(t2f.convert_clip_text(sd1, cfg1), dtype)
    p2 = jax_tree_cast(t2f.convert_clip_text(sd2, cfg2), dtype)
    tok1 = CLIPTokenizer.from_pretrained(os.path.join(sdxl_path, "tokenizer"))
    tok2 = CLIPTokenizer.from_pretrained(os.path.join(sdxl_path, "tokenizer_2"))
    return (enc1, p1, tok1), (enc2, p2, tok2)
