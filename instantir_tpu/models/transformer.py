"""Transformer2D stack for SDXL blocks (use_linear_projection variant).

Mirrors diffusers ``BasicTransformerBlock``/``Transformer2DModel`` semantics
(the blocks instantiated by ``module/aggregator.py:425-487`` and the SDXL
UNet), with the IP branch folded into ``Attention`` and cross-attention
removable (``remove_attn2``, ``pipelines/sdxl_instantir.py:165-177`` sets
attn2/norm2 to None for the Aggregator).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.attention import Attention, SplitAttention
from instantir_tpu.models.layers import GroupNorm32, LoRADense

Dtype = Any


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward: proj to 2·4·dim, x·gelu(gate), project back."""

    dim: int
    mult: int = 4
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        inner = self.dim * self.mult
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = LoRADense(inner * 2, name="proj", **lora, **common)(x, lora_scale)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return LoRADense(self.dim, name="out", **lora, **common)(h, lora_scale)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    cross_attention_dim: int = 2048
    has_cross_attention: bool = True  # False after remove_attn2
    with_ip: bool = False
    time_aware_ip: bool = True
    # the aggregator_adapter rebuild: TA-IP decoupled branch on the SELF-
    # attention (attn2 stays removed). Intended semantics of the reference's
    # --aggregator_adapter, which is broken in-tree twice over
    # (train_stage2_aggregator.py:846 removes attn2 BEFORE :929 installs IP
    # processors that only target attn2; and :1581 inserts image_embeds into
    # added_cond_kwargs only AFTER the aggregator call → aggregator.py:745
    # raises). Only meaningful with attn1_mode="plain".
    attn1_with_ip: bool = False
    attn1_mode: str = "plain"  # "plain" | "split" | "sep_split" (aggregator ablations)
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_flash: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ip_hidden_states: Optional[jnp.ndarray] = None,
        temb: Optional[jnp.ndarray] = None,
        lora_scale=0.0,
        ip_scale=None,
        spatial=None,
        ref_scale=1.0,
    ) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        ln = dict(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)

        # 1. self-attention
        normed = nn.LayerNorm(name="norm1", **ln)(hidden_states.astype(jnp.float32)).astype(self.dtype)
        if self.attn1_mode == "plain":
            attn1_out = Attention(
                query_dim=self.dim,
                heads=self.heads,
                head_dim=self.head_dim,
                with_ip=self.attn1_with_ip,
                time_aware_ip=self.time_aware_ip,
                use_flash=self.use_flash,
                name="attn1",
                **lora,
                **common,
            )(
                normed,
                lora_scale=lora_scale,
                ip_hidden_states=ip_hidden_states if self.attn1_with_ip else None,
                temb=temb if self.attn1_with_ip else None,
                ip_scale=ip_scale if self.attn1_with_ip else None,
            )
        else:
            # aggregator split-attention ablations over the H-concatenated map
            # (reference init_aggregator_attn_proc, attention_processor.py:1418-1467)
            attn1_out = SplitAttention(
                query_dim=self.dim,
                heads=self.heads,
                head_dim=self.head_dim,
                mode="sep" if self.attn1_mode == "sep_split" else "joint",
                use_flash=self.use_flash,
                name="attn1",
                **common,
            )(normed, spatial, temb=temb, ref_scale=ref_scale)
        hidden_states = hidden_states + attn1_out

        # 2. cross-attention (absent in the Aggregator after remove_attn2)
        if self.has_cross_attention:
            normed = nn.LayerNorm(name="norm2", **ln)(hidden_states.astype(jnp.float32)).astype(self.dtype)
            hidden_states = hidden_states + Attention(
                query_dim=self.dim,
                heads=self.heads,
                head_dim=self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                with_ip=self.with_ip,
                time_aware_ip=self.time_aware_ip,
                use_flash=self.use_flash,
                name="attn2",
                **lora,
                **common,
            )(
                normed,
                encoder_hidden_states=encoder_hidden_states,
                ip_hidden_states=ip_hidden_states,
                temb=temb,
                lora_scale=lora_scale,
                ip_scale=ip_scale,
            )

        # 3. feed-forward
        normed = nn.LayerNorm(name="norm3", **ln)(hidden_states.astype(jnp.float32)).astype(self.dtype)
        hidden_states = hidden_states + GEGLUFeedForward(dim=self.dim, name="ff", **lora, **common)(
            normed, lora_scale
        )
        return hidden_states


class Transformer2DModel(nn.Module):
    """GroupNorm → linear proj_in → N transformer blocks → proj_out + residual.

    NHWC in/out; tokens are the flattened H·W axis.
    """

    in_channels: int
    heads: int
    head_dim: int
    num_layers: int = 1
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
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ip_hidden_states: Optional[jnp.ndarray] = None,
        temb: Optional[jnp.ndarray] = None,
        lora_scale=0.0,
        ip_scale=None,
        ref_scale=1.0,
    ) -> jnp.ndarray:
        b, h, w, c = hidden_states.shape
        residual = hidden_states
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        x = GroupNorm32(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(hidden_states)
        x = x.reshape(b, h * w, c)
        x = LoRADense(c, name="proj_in", **lora, **common)(x, lora_scale)

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=c,
                heads=self.heads,
                head_dim=self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                has_cross_attention=self.has_cross_attention,
                with_ip=self.with_ip,
                time_aware_ip=self.time_aware_ip,
                attn1_with_ip=self.attn1_with_ip,
                attn1_mode=self.attn1_mode,
                use_flash=self.use_flash,
                name=f"blocks_{i}",
                **lora,
                **common,
            )(
                x,
                encoder_hidden_states=encoder_hidden_states,
                ip_hidden_states=ip_hidden_states,
                temb=temb,
                lora_scale=lora_scale,
                ip_scale=ip_scale,
                spatial=(h, w),
                ref_scale=ref_scale,
            )

        x = LoRADense(c, name="proj_out", **lora, **common)(x, lora_scale)
        return x.reshape(b, h, w, c) + residual
