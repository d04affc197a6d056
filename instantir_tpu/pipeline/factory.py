"""Pipeline assembly: build model bundle + params (random init or loaded).

Random init mirrors the reference's construction order (``infer.py:114-144``):
UNet → Aggregator (from_unet: shares config; here params are separately
initialized and can be copied via ``init_aggregator_from_unet``) → adapter
(resampler + ip attention params already live inside the UNet tree) →
previewer LoRA (inline lora_a/lora_b params, zero-init B).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.models.aggregator import Aggregator
from instantir_tpu.models.dinov2 import DINOv2Config, DINOv2Model
from instantir_tpu.models.resampler import Resampler, ResamplerConfig
from instantir_tpu.models.unet import UNet2DConditionModel, UNetConfig
from instantir_tpu.models.vae import AutoencoderKL, VAEConfig
from instantir_tpu.pipeline.instantir import InstantIRPipeline
from instantir_tpu.schedulers.diffusion import sdxl_schedule


def build_pipeline(
    unet_config: UNetConfig,
    vae_config: VAEConfig,
    resampler_config: ResamplerConfig,
    dino_config: DINOv2Config,
    rng: jax.Array,
    dtype: Any = jnp.float32,
    image_size: int = 64,
    copy_unet_into_aggregator: bool = True,
) -> InstantIRPipeline:
    unet = UNet2DConditionModel(unet_config, dtype=dtype)
    aggregator = Aggregator(unet_config, dtype=dtype)
    vae = AutoencoderKL(vae_config, dtype=jnp.float32)  # fp32 VAE (force_upcast)
    resampler = Resampler(resampler_config, dtype=dtype)
    dino = DINOv2Model(dino_config, dtype=dtype)

    k = jax.random.split(rng, 5)
    b, hw = 1, image_size
    lat = hw // 2 ** (len(vae_config.block_out_channels) - 1)
    pooled_dim = unet_config.projection_class_embeddings_input_dim - unet_config.addition_time_embed_dim * 6

    sample = jnp.zeros((b, lat, lat, unet_config.in_channels), dtype)
    text = jnp.zeros((b, 7, unet_config.cross_attention_dim), dtype)
    pooled = jnp.zeros((b, pooled_dim), dtype)
    tids = jnp.zeros((b, 6), dtype)
    ip = jnp.zeros((b, resampler_config.num_queries, unet_config.cross_attention_dim), dtype)

    unet_params = unet.init(
        k[0], sample, jnp.zeros((b,), jnp.int32), text, pooled, tids,
        ip_hidden_states=ip if unet_config.with_ip else None,
    )
    agg_params = aggregator.init(
        k[1], sample, jnp.zeros((b,), jnp.int32), sample, added_text_embeds=pooled, added_time_ids=tids
    )
    if copy_unet_into_aggregator:
        agg_params = init_aggregator_from_unet(unet_params, agg_params)
    vae_params = vae.init(k[2], jnp.zeros((b, hw, hw, 3), jnp.float32))
    res_params = resampler.init(k[3], jnp.zeros((b, 5, resampler_config.embedding_dim), dtype))
    dino_params = dino.init(
        k[4], jnp.zeros((b, dino_config.image_size, dino_config.image_size, 3), dtype)
    )

    params = {
        "unet": unet_params,
        "aggregator": agg_params,
        "vae": vae_params,
        "resampler": res_params,
        "image_encoder": dino_params,
    }
    return InstantIRPipeline(unet, aggregator, vae, resampler, dino, sdxl_schedule(), params)


def init_aggregator_from_unet(unet_params: Dict, agg_params: Dict) -> Dict:
    """Copy shared-topology weights UNet → Aggregator (``from_unet``,
    reference ``module/aggregator.py:563-578``): conv_in (also into
    ref_conv_in), time/add embeddings, down_blocks, mid_block. The
    Aggregator's blocks lack attn2/norm2 (removed) and its SFT heads have no
    UNet counterpart — both stay at their own init."""
    import flax.core

    up = flax.core.unfreeze(unet_params)["params"]
    ap = flax.core.unfreeze(agg_params)
    a = ap["params"]

    def copy_matching(dst, src):
        for key, sval in src.items():
            if key not in dst:
                continue
            if isinstance(sval, dict) and isinstance(dst[key], dict):
                copy_matching(dst[key], sval)
            elif hasattr(sval, "shape") and hasattr(dst[key], "shape") and dst[key].shape == sval.shape:
                dst[key] = sval

    for name in list(a.keys()):
        if name.startswith("down_blocks") or name in ("mid_block", "time_embedding", "add_embedding", "conv_in"):
            if name in up:
                copy_matching(a[name], up[name])
    if "conv_in" in up and "ref_conv_in" in a:
        copy_matching(a["ref_conv_in"], up["conv_in"])
    return ap
