"""SDXL UNet down/mid/up blocks (NHWC, functional LoRA, optional IP branch)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.resnet import Downsample2D, ResnetBlock2D, Upsample2D
from instantir_tpu.models.transformer import Transformer2DModel
from instantir_tpu.models.zero_sft import ZeroSFT

Dtype = Any


class DownBlock2D(nn.Module):
    out_channels: int
    temb_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    norm_num_groups: int = 32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, lora_scale=0.0):
        res = []
        common = dict(
            norm_num_groups=self.norm_num_groups,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, self.temb_channels, name=f"resnets_{i}", **common)(
                x, temb, lora_scale
            )
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="downsamplers_0",
            )(x, lora_scale)
            res.append(x)
        return x, tuple(res)


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    temb_channels: int
    heads: int
    head_dim: int
    transformer_layers: int = 1
    num_layers: int = 2
    cross_attention_dim: int = 2048
    has_cross_attention: bool = True
    with_ip: bool = False
    time_aware_ip: bool = True
    attn1_with_ip: bool = False  # aggregator_adapter: TA-IP branch on attn1
    attn1_mode: str = "plain"
    add_downsample: bool = True
    norm_num_groups: int = 32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        temb,
        encoder_hidden_states=None,
        ip_hidden_states=None,
        attn_temb=None,
        lora_scale=0.0,
        ip_scale=None,
        ref_scale=1.0,
    ):
        res = []
        rn = dict(
            norm_num_groups=self.norm_num_groups,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        tr = dict(
            heads=self.heads,
            head_dim=self.head_dim,
            num_layers=self.transformer_layers,
            cross_attention_dim=self.cross_attention_dim,
            has_cross_attention=self.has_cross_attention,
            with_ip=self.with_ip,
            time_aware_ip=self.time_aware_ip,
            attn1_with_ip=self.attn1_with_ip,
            attn1_mode=self.attn1_mode,
            norm_num_groups=self.norm_num_groups,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            use_flash=self.use_flash,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, self.temb_channels, name=f"resnets_{i}", **rn)(
                x, temb, lora_scale
            )
            x = Transformer2DModel(in_channels=self.out_channels, name=f"attentions_{i}", **tr)(
                x,
                encoder_hidden_states=encoder_hidden_states,
                ip_hidden_states=ip_hidden_states,
                temb=attn_temb,
                lora_scale=lora_scale,
                ip_scale=ip_scale,
                ref_scale=ref_scale,
            )
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="downsamplers_0",
            )(x, lora_scale)
            res.append(x)
        return x, tuple(res)


class UNetMidBlock2DCrossAttn(nn.Module):
    in_channels: int
    temb_channels: int
    heads: int
    head_dim: int
    transformer_layers: int = 1
    cross_attention_dim: int = 2048
    has_cross_attention: bool = True
    with_ip: bool = False
    time_aware_ip: bool = True
    attn1_with_ip: bool = False  # aggregator_adapter: TA-IP branch on attn1
    attn1_mode: str = "plain"
    norm_num_groups: int = 32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        temb,
        encoder_hidden_states=None,
        ip_hidden_states=None,
        attn_temb=None,
        lora_scale=0.0,
        ip_scale=None,
        ref_scale=1.0,
    ):
        rn = dict(
            norm_num_groups=self.norm_num_groups,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = ResnetBlock2D(self.in_channels, self.temb_channels, name="resnets_0", **rn)(x, temb, lora_scale)
        x = Transformer2DModel(
            in_channels=self.in_channels,
            heads=self.heads,
            head_dim=self.head_dim,
            num_layers=self.transformer_layers,
            cross_attention_dim=self.cross_attention_dim,
            has_cross_attention=self.has_cross_attention,
            with_ip=self.with_ip,
            time_aware_ip=self.time_aware_ip,
            attn1_with_ip=self.attn1_with_ip,
            attn1_mode=self.attn1_mode,
            norm_num_groups=self.norm_num_groups,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            use_flash=self.use_flash,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attentions_0",
        )(
            x,
            encoder_hidden_states=encoder_hidden_states,
            ip_hidden_states=ip_hidden_states,
            temb=attn_temb,
            lora_scale=lora_scale,
            ip_scale=ip_scale,
            ref_scale=ref_scale,
        )
        x = ResnetBlock2D(self.in_channels, self.temb_channels, name="resnets_1", **rn)(x, temb, lora_scale)
        return x


class UpBlock2D(nn.Module):
    out_channels: int
    temb_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    norm_num_groups: int = 32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples: Tuple[jnp.ndarray, ...], temb, lora_scale=0.0):
        common = dict(
            norm_num_groups=self.norm_num_groups,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        for i in range(self.num_layers):
            skip = res_samples[-1 - i]
            if isinstance(skip, tuple):
                # ZeroSFT residual fusion: (controlnet residual, skip) pair
                # (reference unet_2d_ZeroSFT_blocks.py:2755-2762)
                control, skip_h = skip
                x = ZeroSFT(norm_num_groups=self.norm_num_groups, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=f"zero_sfts_{i}")(control, skip_h, h_ori=x)
            else:
                x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(self.out_channels, self.temb_channels, name=f"resnets_{i}", **common)(
                x, temb, lora_scale
            )
        if self.add_upsample:
            x = Upsample2D(
                self.out_channels,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="upsamplers_0",
            )(x, lora_scale)
        return x


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    temb_channels: int
    heads: int
    head_dim: int
    transformer_layers: int = 1
    num_layers: int = 3
    cross_attention_dim: int = 2048
    has_cross_attention: bool = True
    with_ip: bool = False
    time_aware_ip: bool = True
    add_upsample: bool = True
    norm_num_groups: int = 32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        res_samples: Tuple[jnp.ndarray, ...],
        temb,
        encoder_hidden_states=None,
        ip_hidden_states=None,
        attn_temb=None,
        lora_scale=0.0,
        ip_scale=None,
    ):
        rn = dict(
            norm_num_groups=self.norm_num_groups,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        tr = dict(
            heads=self.heads,
            head_dim=self.head_dim,
            num_layers=self.transformer_layers,
            cross_attention_dim=self.cross_attention_dim,
            has_cross_attention=self.has_cross_attention,
            with_ip=self.with_ip,
            time_aware_ip=self.time_aware_ip,
            norm_num_groups=self.norm_num_groups,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            use_flash=self.use_flash,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        for i in range(self.num_layers):
            skip = res_samples[-1 - i]
            if isinstance(skip, tuple):
                # ZeroSFT residual fusion (reference unet_2d_ZeroSFT_blocks.py:2607-2614)
                control, skip_h = skip
                x = ZeroSFT(norm_num_groups=self.norm_num_groups, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=f"zero_sfts_{i}")(control, skip_h, h_ori=x)
            else:
                x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(self.out_channels, self.temb_channels, name=f"resnets_{i}", **rn)(
                x, temb, lora_scale
            )
            x = Transformer2DModel(in_channels=self.out_channels, name=f"attentions_{i}", **tr)(
                x,
                encoder_hidden_states=encoder_hidden_states,
                ip_hidden_states=ip_hidden_states,
                temb=attn_temb,
                lora_scale=lora_scale,
                ip_scale=ip_scale,
            )
        if self.add_upsample:
            x = Upsample2D(
                self.out_channels,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="upsamplers_0",
            )(x, lora_scale)
        return x
