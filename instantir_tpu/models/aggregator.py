"""Aggregator — ControlNet-variant that fuses the LQ latent with the
previewer's clean reference latent into per-resolution UNet residuals.

Reference: ``module/aggregator.py``. Semantics preserved:
  * two conv stems — ``conv_in`` (LQ latent, "sample") and ``ref_conv_in``
    (preview latent, "controlnet_cond"), both initialized from the UNet's
    conv_in (``from_unet``, ``module/aggregator.py:563-578``);
  * the two streams are **concatenated along H** (cat_dim=-2 NCHW ≡ axis 1
    NHWC, ``:888-902``), doubling the self-attention sequence;
  * SDXL down+mid blocks with cross-attention removed (``remove_attn2``,
    ``pipelines/sdxl_instantir.py:165-177`` → transformer blocks here are
    built with ``has_cross_attention=False``), so text embeds only feed the
    time-embedding path (text_time added embeds);
  * each of the 9 skip activations + the mid activation is split back into
    (cond, ref) halves and passed through an SFT head (3×3 conv → SiLU →
    γ/β convs modulating the *ref* half, ``module/aggregator.py:51-90``)
    followed by a zero-init 1×1 conv (``:414-471``).

Output: tuple of 9 down residuals + 1 mid residual at the *original*
(un-concatenated) spatial resolution.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.layers import LoRAConv, TimestepEmbedding, get_timestep_embedding
from instantir_tpu.models.unet import UNetConfig
from instantir_tpu.models.unet_blocks import CrossAttnDownBlock2D, DownBlock2D, UNetMidBlock2DCrossAttn

Dtype = Any


class SFTHead(nn.Module):
    """SFT modulation of the ref stream by the cond stream + zero 1×1 conv."""

    channels: int
    hidden: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        actv = nn.Conv(self.hidden, (3, 3), padding=1, name="mlp_shared", **common)(cond)
        actv = nn.silu(actv)
        gamma = nn.Conv(self.channels, (3, 3), padding=1, name="mul", **common)(actv)
        beta = nn.Conv(self.channels, (3, 3), padding=1, name="add", **common)(actv)
        h = ref * (gamma + 1.0) + beta
        return nn.Conv(
            self.channels,
            (1, 1),
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            name="zero_conv",
            **common,
        )(h)


class ConditioningEmbedding(nn.Module):
    """ControlNet-style pixel-space condition encoder (dormant in the live
    config, reference ``module/aggregator.py:113-155``): conv_in → SiLU →
    [conv3x3 → SiLU → conv3x3/s2 → SiLU]×(len-1) → zero-init conv_out.
    Converts an image-space condition to the /8 latent feature grid; the live
    aggregator instead feeds VAE latents through ``ref_conv_in``."""

    embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, conditioning: jnp.ndarray) -> jnp.ndarray:  # [B,H,W,C] NHWC
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, name="conv_in", **common)(conditioning)
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            x = nn.Conv(self.block_out_channels[i], (3, 3), padding=1, name=f"blocks_{2*i}", **common)(x)
            x = nn.silu(x)
            x = nn.Conv(
                self.block_out_channels[i + 1], (3, 3), strides=(2, 2), padding=1,
                name=f"blocks_{2*i+1}", **common,
            )(x)
            x = nn.silu(x)
        return nn.Conv(
            self.embedding_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros_init(), bias_init=nn.initializers.zeros_init(),
            name="conv_out", **common,
        )(x)


class Aggregator(nn.Module):
    """SDXL down+mid trunk on the H-concatenated (LQ, preview) pair.

    ``pad_concat`` and ``attn1_mode`` expose the reference's dormant ablation
    surface (``module/aggregator.py:269-280, 892-928`` and
    ``init_aggregator_attn_proc``, ``attention_processor.py:1418-1467``):

    * ``pad_concat=True`` inserts a zero row between the two streams at the
      stem concat, and rebuilds the (re-zeroed) pad row after every down
      block (``:914-928``, which also replaces the block's last res sample
      with the rebuilt map);
    * ``attn1_mode`` = "plain" (default: joint self-attention over the whole
      concatenated map), "split" (``split_AttnProcessor2_0``: pad row dropped
      from the joint attention), or "sep_split"
      (``sep_split_AttnProcessor2_0``: separate per-stream self-attention +
      AdaLN'd bidirectional cross-attention, ``ref_scale`` asymmetry).
    """

    config: UNetConfig
    use_flash: bool = True
    pad_concat: bool = False
    attn1_mode: str = "plain"  # "plain" | "split" | "sep_split"
    # Working rebuild of the reference's --aggregator_adapter with INTENDED
    # semantics (the in-tree path is broken twice over:
    # train_stage2_aggregator.py:846 removes attn2 BEFORE :929 installs IP
    # processors that only target attn2, so the projected image tokens have
    # no consumer; and :1581 inserts image_embeds into added_cond_kwargs only
    # AFTER the aggregator call, so module/aggregator.py:745-748 raises).
    # Here: attn2 stays removed (the live aggregator design) and each attn1
    # gains the decoupled TA-IP second-softmax branch over the projected
    # image-prompt tokens with AdaLN(temb) K/V modulation — the exact ip-half
    # of TA_IPAttnProcessor2_0 (attention_processor.py:1063-1207) that
    # init_adapter_in_unet would have installed. The caller projects encoder
    # tokens through the aggregator's own Resampler BEFORE this call (the
    # ordering fix), see train/stage2_aggregator.py.
    aggregator_adapter: bool = False
    global_pool_conditions: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, 4] LQ latent
        timesteps: jnp.ndarray,  # [B] or scalar
        controlnet_cond: jnp.ndarray,  # [B, H, W, 4] preview latent
        encoder_hidden_states: Optional[jnp.ndarray] = None,  # unused by blocks (attn2 removed)
        added_text_embeds: jnp.ndarray = None,
        added_time_ids: jnp.ndarray = None,
        ip_hidden_states: Optional[jnp.ndarray] = None,  # aggregator_adapter tokens
        ip_scale=None,
        conditioning_scale: float = 1.0,
        ref_scale: float = 1.0,  # sep_split cross-attention strength
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        cfg = self.config
        if cfg.lora_rank:
            # the Aggregator never carries LoRA (only the previewer UNet does,
            # reference prepare_previewers targets the UNet alone) — drop it
            # even when sharing the UNet's config, saving ~0.7 GB HBM at SDXL
            # scale.
            import dataclasses as _dc

            cfg = _dc.replace(cfg, lora_rank=0)
        b = sample.shape[0]
        timesteps = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(timesteps)), (b,))
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # per-block activation remat (the reference's --gradient_checkpointing
        # -> aggregator.enable_gradient_checkpointing(),
        # train_stage2_aggregator.py:1066-1068); param tree unchanged
        remat = nn.remat if cfg.gradient_checkpointing else (lambda c: c)
        _CrossDown, _Down, _Mid = (
            remat(CrossAttnDownBlock2D), remat(DownBlock2D), remat(UNetMidBlock2DCrossAttn)
        )

        # 1. time + added embeddings (same text_time scheme as the UNet)
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, name="time_embedding", **common)(t_emb)
        time_embeds = get_timestep_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift
        ).reshape(b, -1)
        add_embeds = jnp.concatenate([added_text_embeds.astype(jnp.float32), time_embeds], axis=-1)
        emb = emb + TimestepEmbedding(cfg.time_embed_dim, name="add_embedding", **common)(
            add_embeds.astype(self.dtype)
        )

        # 2. dual stems, spatial concat along H (optional zero pad row between)
        cond_latent = LoRAConv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **common)(sample)
        ref_latent = LoRAConv(cfg.block_out_channels[0], (3, 3), padding=1, name="ref_conv_in", **common)(
            controlnet_cond
        )

        def pad_row(c, r):
            zeros = jnp.zeros((c.shape[0], 1) + c.shape[2:], c.dtype)
            return jnp.concatenate([c, zeros, r], axis=1)

        def rebuild_pad(t):
            # re-zero the middle row after a block (reference :914-928)
            hh = t.shape[1] // 2
            return pad_row(t[:, :hh], t[:, t.shape[1] - hh :])

        if self.pad_concat:
            x = pad_row(cond_latent, ref_latent)
        else:
            x = jnp.concatenate([cond_latent, ref_latent], axis=1)

        # sep_split's AdaLN conditions on the combined time embedding (the
        # reference routes `temb` via cross_attention_kwargs; time_embedding_dim
        # =1280 = time_embed_dim, attention_processor.py:1444); the
        # aggregator_adapter's TA-IP AdaLN uses the same embedding
        attn_temb = emb if (self.attn1_mode == "sep_split" or self.aggregator_adapter) else None
        if self.aggregator_adapter and ip_hidden_states is None:
            raise ValueError("aggregator_adapter=True requires ip_hidden_states (project the "
                             "image-encoder tokens through the aggregator's Resampler first)")
        if self.aggregator_adapter and self.attn1_mode != "plain":
            raise ValueError("aggregator_adapter requires attn1_mode='plain' (the split-attention "
                             "ablations replace attn1 with SplitAttention, which has no ip branch)")

        # 3. down blocks (cross-attention removed)
        res_samples = (x,)
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == len(cfg.down_block_types) - 1
            out_ch = cfg.block_out_channels[i]
            if block_type == "CrossAttnDownBlock2D":
                heads = cfg.num_attention_heads[i]
                x, res = _CrossDown(
                    out_channels=out_ch,
                    temb_channels=cfg.time_embed_dim,
                    heads=heads,
                    head_dim=out_ch // heads,
                    transformer_layers=cfg.transformer_layers_per_block[i],
                    num_layers=cfg.layers_per_block,
                    cross_attention_dim=cfg.cross_attention_dim,
                    has_cross_attention=False,
                    attn1_with_ip=self.aggregator_adapter,
                    attn1_mode=self.attn1_mode,
                    add_downsample=not is_final,
                    norm_num_groups=cfg.norm_num_groups,
                    use_flash=self.use_flash,
                    name=f"down_blocks_{i}",
                    **common,
                )(x, emb, ip_hidden_states=ip_hidden_states, attn_temb=attn_temb,
                  ip_scale=ip_scale, ref_scale=ref_scale)
            else:
                x, res = _Down(
                    out_channels=out_ch,
                    temb_channels=cfg.time_embed_dim,
                    num_layers=cfg.layers_per_block,
                    add_downsample=not is_final,
                    norm_num_groups=cfg.norm_num_groups,
                    name=f"down_blocks_{i}",
                    **common,
                )(x, emb)
            if self.pad_concat:
                x = rebuild_pad(x)
                res = res[:-1] + (x,)
            res_samples = res_samples + res

        # 4. mid
        heads = cfg.num_attention_heads[-1]
        mid_ch = cfg.block_out_channels[-1]
        x = _Mid(
            in_channels=mid_ch,
            temb_channels=cfg.time_embed_dim,
            heads=heads,
            head_dim=mid_ch // heads,
            transformer_layers=cfg.transformer_layers_per_block[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            has_cross_attention=False,
            attn1_with_ip=self.aggregator_adapter,
            attn1_mode=self.attn1_mode,
            norm_num_groups=cfg.norm_num_groups,
            use_flash=self.use_flash,
            name="mid_block",
            **common,
        )(x, emb, ip_hidden_states=ip_hidden_states, attn_temb=attn_temb,
          ip_scale=ip_scale, ref_scale=ref_scale)

        # 5. split halves + SFT heads (cond modulates ref)
        def split_h(t):
            hh = t.shape[1]
            return t[:, : hh // 2], t[:, hh - hh // 2 :]

        down_residuals = []
        for idx, r in enumerate(res_samples):
            c, f = split_h(r)
            down_residuals.append(
                SFTHead(r.shape[-1], name=f"controlnet_down_blocks_{idx}", **common)(c, f) * conditioning_scale
            )
        c, f = split_h(x)
        mid_residual = SFTHead(x.shape[-1], name="controlnet_mid_block", **common)(c, f) * conditioning_scale

        if self.global_pool_conditions:
            # spatial mean-pool of every residual, keepdims so injection
            # broadcasts (reference ``module/aggregator.py:966-971``; dormant
            # ControlNet-inherited config flag, ``:221, :267``)
            down_residuals = [jnp.mean(r, axis=(1, 2), keepdims=True) for r in down_residuals]
            mid_residual = jnp.mean(mid_residual, axis=(1, 2), keepdims=True)
        return tuple(down_residuals), mid_residual
