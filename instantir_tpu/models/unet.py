"""SDXL UNet2DConditionModel in Flax (NHWC, functional LoRA, fused IP branch).

Config mirrors stabilityai/stable-diffusion-xl-base-1.0's UNet (the model the
reference loads at ``infer.py:117``): blocks [320, 640, 1280], transformer
depths [-, 2, 10], heads [5, 10, 20] (head_dim 64), cross-attention dim 2048,
text_time additional embeddings (2816 = 1280 pooled + 6×256 time ids).

Differences from the reference's runtime (by design, TPU-first):
  * previewer-LoRA on/off is a forward arg (``lora_scale``), not module state;
  * the image-prompt tokens are an explicit input (``ip_hidden_states``), the
    projection (Resampler) lives outside the UNet;
  * the time embedding used by time-aware IP attention (AdaLN) is the UNet's
    own internal ``emb`` — the reference recomputes it outside and threads it
    through ``cross_attention_kwargs["temb"]`` (``sdxl_instantir.py:1516-1535``)
    only because torch processors cannot see module internals.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.layers import (
    GroupNorm32,
    LoRAConv,
    TimestepEmbedding,
    get_timestep_embedding,
)
from instantir_tpu.models.unet_blocks import (
    CrossAttnDownBlock2D,
    CrossAttnUpBlock2D,
    DownBlock2D,
    UNetMidBlock2DCrossAttn,
    UpBlock2D,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 128
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = ("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D")
    up_block_types: Tuple[str, ...] = ("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D")
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 2, 10)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20)
    cross_attention_dim: int = 2048
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    norm_num_groups: int = 32
    time_cond_proj_dim: Optional[int] = None
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # framework extensions
    with_ip: bool = False  # decoupled image-prompt branch in every cross-attn
    time_aware_ip: bool = True
    lora_rank: int = 0  # previewer LoRA rank (0 = no LoRA params)
    lora_alpha: float = 1.0
    # how controlnet residuals enter: "add" (stock SDXL/InstantIR) or
    # "zero_sft" (the reference's dormant UNet2DZeroSFTModel variant —
    # GroupNorm-SFT modulation with zero-init convs at every skip + mid,
    # module/unet/unet_2d_ZeroSFT.py:81-136,486,1351)
    residual_fusion: str = "add"
    # rematerialize each down/mid/up block in the backward pass instead of
    # storing its activations (the reference's --gradient_checkpointing →
    # unet.enable_gradient_checkpointing(), train_stage1_adapter.py:808-810,
    # train_stage2_aggregator.py:1066-1068); jax.checkpoint per block
    gradient_checkpointing: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def sdxl_base_config(**overrides) -> UNetConfig:
    return dataclasses.replace(UNetConfig(), **overrides)


def tiny_unet_config(**overrides) -> UNetConfig:
    """A shape-faithful miniature for CPU tests (same topology, tiny dims)."""
    base = UNetConfig(
        sample_size=16,
        block_out_channels=(32, 64, 64),
        transformer_layers_per_block=(1, 1, 2),
        num_attention_heads=(2, 4, 4),
        cross_attention_dim=32,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=8 * 6 + 16,
        norm_num_groups=8,
    )
    return dataclasses.replace(base, **overrides)


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    use_flash: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def time_embedding_params(self):
        cfg = self.config
        return TimestepEmbedding(
            cfg.time_embed_dim,
            cond_proj_dim=cfg.time_cond_proj_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="time_embedding",
        )

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C] latents (NHWC)
        timesteps: jnp.ndarray,  # [B] or scalar
        encoder_hidden_states: jnp.ndarray,  # [B, 77·k, cross_dim] text tokens
        added_text_embeds: jnp.ndarray,  # [B, pooled_dim] pooled text
        added_time_ids: jnp.ndarray,  # [B, 6] SDXL micro-conditioning
        ip_hidden_states: Optional[jnp.ndarray] = None,  # [B, 64, cross_dim]
        timestep_cond: Optional[jnp.ndarray] = None,
        down_block_additional_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        lora_scale=0.0,
        ip_scale=None,
        cached_deep: Optional[jnp.ndarray] = None,
        return_deep: bool = False,
        cache_depth: int = 1,
    ) -> jnp.ndarray:
        """DeepCache-style split execution (block caching for diffusion
        sampling, arXiv 2312.03209; opt-in, see ``RestoreConfig.deepcache_*``):

        * ``return_deep=True`` — full forward that ALSO returns the feature
          entering up block ``n_up - cache_depth`` (the "deep trunk" output).
        * ``cached_deep=<that feature>`` — shallow forward: run only the first
          ``cache_depth`` down blocks (for fresh skip connections) and the last
          ``cache_depth`` up blocks on top of the cached trunk.

        Exactness property (tested): for the same inputs,
        ``shallow(x, cached_deep=deep(x)) == full(x)`` bit-for-bit — the split
        only becomes an approximation when the cached trunk is reused across
        timesteps. In shallow mode ``down_block_additional_residuals`` must be
        the shallow skip slice (first ``3·cache_depth`` entries at
        layers_per_block=2) and ``mid_block_additional_residual`` is unused.
        """
        cfg = self.config
        b = sample.shape[0]
        timesteps = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(timesteps)), (b,))

        # 1. time + added embeddings (all fp32 through the sinusoids)
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        emb = self.time_embedding_params()(t_emb, timestep_cond)

        time_embeds = get_timestep_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift
        )
        time_embeds = time_embeds.reshape(b, -1)
        add_embeds = jnp.concatenate([added_text_embeds.astype(jnp.float32), time_embeds], axis=-1)
        aug_emb = TimestepEmbedding(
            cfg.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="add_embedding"
        )(add_embeds.astype(self.dtype))
        emb = emb + aug_emb
        # `emb` is also the AdaLN conditioning for time-aware IP attention.

        lora = dict(lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # activation rematerialization: nn.remat preserves module naming, so
        # the param tree is identical with the flag on or off
        remat = nn.remat if cfg.gradient_checkpointing else (lambda c: c)
        _CrossDown, _Down = remat(CrossAttnDownBlock2D), remat(DownBlock2D)
        _Mid = remat(UNetMidBlock2DCrossAttn)
        _CrossUp, _Up = remat(CrossAttnUpBlock2D), remat(UpBlock2D)

        shallow = cached_deep is not None
        n_blocks = len(cfg.down_block_types)
        if shallow or return_deep:
            if not (1 <= cache_depth < n_blocks):
                raise ValueError(f"cache_depth must be in [1, {n_blocks - 1}], got {cache_depth}")
            if shallow and cfg.residual_fusion != "add":
                raise ValueError("cached_deep requires residual_fusion='add'")

        # 2. conv_in (never LoRA'd — not in PREVIEWER_LORA_MODULES)
        sample = LoRAConv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **common)(sample)

        # 3. down (shallow mode: only the first cache_depth levels, for the
        # fresh skip connections the shallow up blocks consume)
        down_res_samples = (sample,)
        for i, block_type in enumerate(cfg.down_block_types):
            if shallow and i >= cache_depth:
                break
            is_final = i == len(cfg.down_block_types) - 1
            out_ch = cfg.block_out_channels[i]
            if block_type == "CrossAttnDownBlock2D":
                heads = cfg.num_attention_heads[i]
                sample, res = _CrossDown(
                    out_channels=out_ch,
                    temb_channels=cfg.time_embed_dim,
                    heads=heads,
                    head_dim=out_ch // heads,
                    transformer_layers=cfg.transformer_layers_per_block[i],
                    num_layers=cfg.layers_per_block,
                    cross_attention_dim=cfg.cross_attention_dim,
                    with_ip=cfg.with_ip,
                    time_aware_ip=cfg.time_aware_ip,
                    add_downsample=not is_final,
                    norm_num_groups=cfg.norm_num_groups,
                    use_flash=self.use_flash,
                    name=f"down_blocks_{i}",
                    **lora,
                    **common,
                )(
                    sample,
                    emb,
                    encoder_hidden_states=encoder_hidden_states,
                    ip_hidden_states=ip_hidden_states,
                    attn_temb=emb,
                    lora_scale=lora_scale,
                    ip_scale=ip_scale,
                )
            else:
                sample, res = _Down(
                    out_channels=out_ch,
                    temb_channels=cfg.time_embed_dim,
                    num_layers=cfg.layers_per_block,
                    add_downsample=not is_final,
                    norm_num_groups=cfg.norm_num_groups,
                    name=f"down_blocks_{i}",
                    **lora,
                    **common,
                )(sample, emb, lora_scale)
            down_res_samples = down_res_samples + res

        if shallow:
            # the boundary level's downsample output feeds a deep up block
            # that will not run — drop it so the list holds exactly the skips
            # the shallow up blocks pop
            down_res_samples = down_res_samples[:-1]
            if down_block_additional_residuals is not None and len(
                down_block_additional_residuals
            ) != len(down_res_samples):
                raise ValueError(
                    f"shallow mode expects {len(down_res_samples)} residuals "
                    f"(the shallow skip slice), got {len(down_block_additional_residuals)}"
                )

        if down_block_additional_residuals is not None:
            if cfg.residual_fusion == "zero_sft":
                # pair (control, skip); each up-block resnet fuses via ZeroSFT
                down_res_samples = tuple(
                    (r.astype(s.dtype), s)
                    for s, r in zip(down_res_samples, down_block_additional_residuals)
                )
            else:
                down_res_samples = tuple(
                    s + r.astype(s.dtype) for s, r in zip(down_res_samples, down_block_additional_residuals)
                )
        elif cfg.residual_fusion == "zero_sft":
            raise ValueError(
                "residual_fusion='zero_sft' is a controlnet-fusion variant; it requires "
                "down_block_additional_residuals/mid_block_additional_residual (also at init, "
                "so the ZeroSFT parameters materialize)"
            )

        # 4. mid (skipped in shallow mode — it lives in the cached trunk)
        heads = cfg.num_attention_heads[-1]
        mid_ch = cfg.block_out_channels[-1]
        sample = sample if shallow else _Mid(
            in_channels=mid_ch,
            temb_channels=cfg.time_embed_dim,
            heads=heads,
            head_dim=mid_ch // heads,
            transformer_layers=cfg.transformer_layers_per_block[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            with_ip=cfg.with_ip,
            time_aware_ip=cfg.time_aware_ip,
            norm_num_groups=cfg.norm_num_groups,
            use_flash=self.use_flash,
            name="mid_block",
            **lora,
            **common,
        )(
            sample,
            emb,
            encoder_hidden_states=encoder_hidden_states,
            ip_hidden_states=ip_hidden_states,
            attn_temb=emb,
            lora_scale=lora_scale,
            ip_scale=ip_scale,
        )
        if mid_block_additional_residual is not None and not shallow:
            if cfg.residual_fusion == "zero_sft":
                from instantir_tpu.models.zero_sft import ZeroSFT

                sample = ZeroSFT(
                    norm_num_groups=cfg.norm_num_groups, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="mid_zero_sft",
                )(mid_block_additional_residual.astype(sample.dtype), sample)
            else:
                sample = sample + mid_block_additional_residual.astype(sample.dtype)

        # 5. up (shallow mode: only the last cache_depth blocks, on top of the
        # cached trunk; return_deep: capture the trunk output at the boundary)
        deep_out = None
        n_up = len(cfg.up_block_types)
        if shallow:
            sample = cached_deep.astype(self.dtype)
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            if shallow and i < n_up - cache_depth:
                continue
            if return_deep and i == n_up - cache_depth:
                deep_out = sample
            is_final = i == len(cfg.up_block_types) - 1
            out_ch = reversed_channels[i]
            num_res = cfg.layers_per_block + 1
            res = down_res_samples[-num_res:]
            down_res_samples = down_res_samples[:-num_res]
            if block_type == "CrossAttnUpBlock2D":
                heads = tuple(reversed(cfg.num_attention_heads))[i]
                sample = _CrossUp(
                    out_channels=out_ch,
                    temb_channels=cfg.time_embed_dim,
                    heads=heads,
                    head_dim=out_ch // heads,
                    transformer_layers=tuple(reversed(cfg.transformer_layers_per_block))[i],
                    num_layers=num_res,
                    cross_attention_dim=cfg.cross_attention_dim,
                    with_ip=cfg.with_ip,
                    time_aware_ip=cfg.time_aware_ip,
                    add_upsample=not is_final,
                    norm_num_groups=cfg.norm_num_groups,
                    use_flash=self.use_flash,
                    name=f"up_blocks_{i}",
                    **lora,
                    **common,
                )(
                    sample,
                    res,
                    emb,
                    encoder_hidden_states=encoder_hidden_states,
                    ip_hidden_states=ip_hidden_states,
                    attn_temb=emb,
                    lora_scale=lora_scale,
                    ip_scale=ip_scale,
                )
            else:
                sample = _Up(
                    out_channels=out_ch,
                    temb_channels=cfg.time_embed_dim,
                    num_layers=num_res,
                    add_upsample=not is_final,
                    norm_num_groups=cfg.norm_num_groups,
                    name=f"up_blocks_{i}",
                    **lora,
                    **common,
                )(sample, res, emb, lora_scale)

        # 6. out
        sample = GroupNorm32(num_groups=cfg.norm_num_groups, dtype=self.dtype, fuse_silu=True, name="conv_norm_out")(sample)
        sample = LoRAConv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **common)(sample)
        if return_deep:
            return sample, deep_out
        return sample
