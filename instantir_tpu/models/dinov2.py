"""DINOv2 vision transformer (Flax) — the LQ-image encoder of the adapter.

Replaces the reference's ``transformers.AutoModel`` DINOv2-large
(``module/ip_adapter/utils.py:181-199``, using ``last_hidden_state``:
CLS + patch tokens, hidden 1024). Architecture per facebook/dinov2-large:
patch-14 conv embed, CLS token, learned position embeddings (bicubically
interpolated for non-224 inputs), 24 pre-LN blocks with LayerScale, standard
GELU MLP, final LayerNorm.

TPU notes: runs once per pipeline call (not in the denoise loop), bf16-safe;
attention uses the XLA path (257 tokens — too short for flash to matter).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.ops.attention import attention_xla

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 14
    image_size: int = 224  # position-embedding native grid
    layerscale_init: float = 1e-5
    eps: float = 1e-6


def dinov2_large_config(**overrides) -> DINOv2Config:
    return dataclasses.replace(DINOv2Config(), **overrides)


def tiny_dinov2_config(**overrides) -> DINOv2Config:
    base = DINOv2Config(hidden_size=16, num_layers=2, num_heads=2, patch_size=14, image_size=28)
    return dataclasses.replace(base, **overrides)


class DINOv2Block(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, n, c = x.shape
        head_dim = cfg.hidden_size // cfg.num_heads
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(epsilon=cfg.eps, dtype=jnp.float32, param_dtype=jnp.float32)

        h = nn.LayerNorm(name="norm1", **ln)(x.astype(jnp.float32)).astype(self.dtype)
        q = nn.Dense(cfg.hidden_size, name="q", **common)(h).reshape(b, n, cfg.num_heads, head_dim)
        k = nn.Dense(cfg.hidden_size, name="k", **common)(h).reshape(b, n, cfg.num_heads, head_dim)
        v = nn.Dense(cfg.hidden_size, name="v", **common)(h).reshape(b, n, cfg.num_heads, head_dim)
        attn = attention_xla(q, k, v).reshape(b, n, c)
        attn = nn.Dense(cfg.hidden_size, name="proj", **common)(attn)
        gamma1 = self.param("layerscale1", nn.initializers.constant(cfg.layerscale_init), (c,), self.param_dtype)
        x = x + gamma1.astype(self.dtype) * attn

        h = nn.LayerNorm(name="norm2", **ln)(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.hidden_size * cfg.mlp_ratio, name="fc1", **common)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="fc2", **common)(h)
        gamma2 = self.param("layerscale2", nn.initializers.constant(cfg.layerscale_init), (c,), self.param_dtype)
        return x + gamma2.astype(self.dtype) * h


class DINOv2Model(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: [B, H, W, 3] (normalized) → last_hidden_state [B, 1+N, C]."""
        cfg = self.config
        b, h, w, _ = pixel_values.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed",
            **common,
        )(pixel_values)
        x = x.reshape(b, gh * gw, cfg.hidden_size)

        cls = self.param("cls_token", nn.initializers.zeros_init(), (1, 1, cfg.hidden_size), self.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), x], axis=1)

        native = cfg.image_size // cfg.patch_size
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, 1 + native * native, cfg.hidden_size),
            self.param_dtype,
        ).astype(jnp.float32)
        if (gh, gw) != (native, native):
            cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
            patch_pos = patch_pos.reshape(1, native, native, cfg.hidden_size)
            patch_pos = jax.image.resize(patch_pos, (1, gh, gw, cfg.hidden_size), method="cubic")
            pos = jnp.concatenate([cls_pos, patch_pos.reshape(1, gh * gw, cfg.hidden_size)], axis=1)
        x = x + pos.astype(self.dtype)

        for i in range(cfg.num_layers):
            x = DINOv2Block(cfg, name=f"blocks_{i}", **common)(x)

        x = nn.LayerNorm(epsilon=cfg.eps, dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )
        return x.astype(self.dtype)


# ImageNet normalization used by the DINOv2 processor.
DINOV2_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
DINOV2_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)


def preprocess_dinov2(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] → resized ``size``² and ImageNet-normalized.

    ``size`` is the encoder's native grid (224 for DINOv2-large; a CLIP tower
    may want 336) — resizing once from the source resolution keeps detail a
    224² round-trip would destroy."""
    b, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (b, size, size, c), method="bilinear")
    mean = jnp.asarray(DINOV2_MEAN, images.dtype)
    std = jnp.asarray(DINOV2_STD, images.dtype)
    return (images - mean) / std
