"""ResNet blocks and up/down sampling for the SDXL UNet/VAE (NHWC)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.layers import GroupNorm32, LoRAConv, LoRADense

Dtype = Any


class ResnetBlock2D(nn.Module):
    """GN→SiLU→conv ×2 with additive time-embedding injection and shortcut.

    Matches diffusers ``ResnetBlock2D`` with ``time_embedding_norm=default``.
    conv1/conv2/conv_shortcut/time_emb_proj are previewer-LoRA targets
    (``pipelines/sdxl_instantir.py:156-161``).
    """

    out_channels: int
    temb_channels: Optional[int] = None
    norm_num_groups: int = 32
    eps: float = 1e-5
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None, lora_scale=0.0) -> jnp.ndarray:
        in_channels = x.shape[-1]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = GroupNorm32(num_groups=self.norm_num_groups, epsilon=self.eps, dtype=self.dtype, fuse_silu=True, name="norm1")(x)
        h = LoRAConv(self.out_channels, (3, 3), padding=1, name="conv1", **lora, **common)(h, lora_scale)

        if temb is not None:
            t = LoRADense(self.out_channels, name="time_emb_proj", **lora, **common)(nn.silu(temb), lora_scale)
            h = h + t[:, None, None, :]

        h = GroupNorm32(num_groups=self.norm_num_groups, epsilon=self.eps, dtype=self.dtype, fuse_silu=True, name="norm2")(h)
        h = LoRAConv(self.out_channels, (3, 3), padding=1, name="conv2", **lora, **common)(h, lora_scale)

        if in_channels != self.out_channels:
            x = LoRAConv(self.out_channels, (1, 1), padding=0, name="conv_shortcut", **lora, **common)(
                x, lora_scale
            )
        return x + h


class Downsample2D(nn.Module):
    """3×3 stride-2 conv (padding 1), a previewer-LoRA target."""

    out_channels: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        return LoRAConv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding=1,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x, lora_scale)


class Upsample2D(nn.Module):
    """Nearest ×2 then 3×3 conv, a previewer-LoRA target."""

    out_channels: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return LoRAConv(
            self.out_channels,
            (3, 3),
            padding=1,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x, lora_scale)
