"""Perceiver Resampler — projects DINOv2 tokens to 64 image-prompt tokens.

Faithful to reference ``module/ip_adapter/resampler.py:34-147`` semantics:
learned latent queries attend over [image tokens ++ latents] with a
double-sqrt scale and fp32 softmax; pre-LN FF with no biases; final
projection + LayerNorm to the UNet cross-attention dim (2048).

The previewer LoRA targets the resampler's ``to_q``/``to_kv``/``to_out``
(``PREVIEWER_LORA_MODULES`` entries "to_q", "to_kv", "0.to_out" —
``pipelines/sdxl_instantir.py:141-144`` — matched against the torch module
tree where the resampler lives under ``unet.encoder_hid_proj``), so those
three are LoRA-capable here.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.layers import LoRADense

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 1280
    depth: int = 4
    head_dim: int = 64
    heads: int = 20
    num_queries: int = 64
    embedding_dim: int = 1024  # DINOv2-large hidden size
    output_dim: int = 2048  # SDXL cross-attention dim
    ff_mult: int = 4
    lora_rank: int = 0
    lora_alpha: float = 1.0


def instantir_resampler_config(**overrides) -> ResamplerConfig:
    """The config instantiated at ``infer.py:269-273`` / trainers."""
    return dataclasses.replace(ResamplerConfig(), **overrides)


def tiny_resampler_config(**overrides) -> ResamplerConfig:
    base = ResamplerConfig(dim=32, depth=2, head_dim=8, heads=4, num_queries=8, embedding_dim=16, output_dim=32)
    return dataclasses.replace(base, **overrides)


class PerceiverAttention(nn.Module):
    dim: int
    head_dim: int
    heads: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        inner = self.head_dim * self.heads
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        ln = dict(dtype=jnp.float32, param_dtype=jnp.float32)

        x = nn.LayerNorm(name="norm1", **ln)(x.astype(jnp.float32)).astype(self.dtype)
        latents = nn.LayerNorm(name="norm2", **ln)(latents.astype(jnp.float32)).astype(self.dtype)
        b, l, _ = latents.shape

        q = LoRADense(inner, use_bias=False, name="to_q", **lora, **common)(latents, lora_scale)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = LoRADense(inner * 2, use_bias=False, name="to_kv", **lora, **common)(kv_input, lora_scale)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, -1, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        # double-sqrt scaling + fp32 softmax (reference resampler.py:71-74)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(self.head_dim, jnp.float32)))
        weight = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32) * scale,
            preferred_element_type=jnp.float32,
        )
        weight = nn.softmax(weight, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weight, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return LoRADense(self.dim, use_bias=False, name="to_out", **lora, **common)(out, lora_scale)


class Resampler(nn.Module):
    config: ResamplerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(dtype=jnp.float32, param_dtype=jnp.float32)

        latents = self.param(
            "latents",
            nn.initializers.normal(stddev=cfg.dim**-0.5),
            (1, cfg.num_queries, cfg.dim),
            self.param_dtype,
        )
        latents = jnp.broadcast_to(latents, (x.shape[0],) + latents.shape[1:]).astype(self.dtype)

        x = nn.Dense(cfg.dim, name="proj_in", **common)(x)

        for i in range(cfg.depth):
            latents = latents + PerceiverAttention(
                dim=cfg.dim,
                head_dim=cfg.head_dim,
                heads=cfg.heads,
                lora_rank=cfg.lora_rank,
                lora_alpha=cfg.lora_alpha,
                name=f"layers_{i}_attn",
                **common,
            )(x, latents, lora_scale)
            # FF: LN → Dense(4d, no bias) → GELU → Dense(d, no bias)
            h = nn.LayerNorm(name=f"layers_{i}_ff_norm", **ln)(latents.astype(jnp.float32)).astype(self.dtype)
            h = nn.Dense(cfg.dim * cfg.ff_mult, use_bias=False, name=f"layers_{i}_ff_in", **common)(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.dim, use_bias=False, name=f"layers_{i}_ff_out", **common)(h)
            latents = latents + h

        out = nn.Dense(cfg.output_dim, name="proj_out", **common)(latents)
        return nn.LayerNorm(name="norm_out", **ln)(out.astype(jnp.float32)).astype(self.dtype)
