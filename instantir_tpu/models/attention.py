"""SDXL attention with the decoupled, time-aware image-prompt (IP) branch.

Functionally replaces the reference's attention-processor zoo
(``module/ip_adapter/attention_processor.py``): instead of swapping processor
objects into modules, the behaviors are forward-time arguments —

  * plain self/cross attention               (AttnProcessor2_0, ``:323``)
  * + decoupled IP branch with AdaLN(temb)   (TA_IPAttnProcessor2_0, ``:1063-1207``)

The IP branch is a *second softmax* over the 64 image tokens with the same
queries, added as ``out + ip_scale · ip_out`` — NOT a concatenated KV segment
(reference ``:1185-1192``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.layers import AdaLayerNorm, LoRADense
from instantir_tpu.ops.attention import dot_product_attention

Dtype = Any


class Attention(nn.Module):
    """Multi-head attention over NLC tokens.

    Args:
      query_dim: channel dim of queries (and output).
      heads / head_dim: attention geometry (inner dim = heads*head_dim).
      cross_attention_dim: K/V input dim (None → self-attention dims).
      with_ip: build the decoupled image-prompt K/V branch.
      time_aware_ip: apply AdaLayerNorm(temb) to projected ip K/V.
      lora_rank: rank for the previewer LoRA on to_q/to_out (+to_k/to_v when
        ``lora_kv``); ip projections are always LoRA'd when present.
    """

    query_dim: int
    heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    with_ip: bool = False
    time_aware_ip: bool = True
    ip_scale: float = 1.0
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_kv: bool = True
    out_bias: bool = True
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
        ip_scale: Optional[jnp.ndarray] = None,
        external_kv=None,
    ) -> jnp.ndarray:
        inner_dim = self.heads * self.head_dim
        kv_dim = self.cross_attention_dim or self.query_dim
        is_cross = encoder_hidden_states is not None
        context = encoder_hidden_states if is_cross else hidden_states
        b, n, _ = hidden_states.shape

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora_qo = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        # Previewer LoRA targets to_q universally but attn1.to_k/attn1.to_v
        # only on self-attention (pipelines/sdxl_instantir.py:141-162).
        lora_kv = dict(lora_rank=self.lora_rank if (self.lora_kv and not is_cross) else 0, lora_alpha=self.lora_alpha)

        q = LoRADense(inner_dim, use_bias=False, name="to_q", **lora_qo, **common)(hidden_states, lora_scale)
        k = LoRADense(inner_dim, use_bias=False, name="to_k", **lora_kv, **common)(context, lora_scale)
        v = LoRADense(inner_dim, use_bias=False, name="to_v", **lora_kv, **common)(context, lora_scale)

        if external_kv is not None:
            # reference-attention injection: extra K/V tokens appended to the
            # sequence (``attention_processor.py:380-382``; KVCopy caches from
            # ``module/attention.py:112-143`` → models/kv_cache.py here)
            k = jnp.concatenate([k, external_kv.k.astype(k.dtype)], axis=1)
            v = jnp.concatenate([v, external_kv.v.astype(v.dtype)], axis=1)

        q = q.reshape(b, n, self.heads, self.head_dim)
        k = k.reshape(b, -1, self.heads, self.head_dim)
        v = v.reshape(b, -1, self.heads, self.head_dim)
        out = dot_product_attention(q, k, v, use_flash=self.use_flash)
        out = out.reshape(b, n, inner_dim)

        if self.with_ip:
            if ip_hidden_states is None:
                raise ValueError("with_ip=True requires ip_hidden_states")
            ip_lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
            ip_k = LoRADense(inner_dim, use_bias=False, name="to_k_ip", **ip_lora, **common)(
                ip_hidden_states, lora_scale
            )
            ip_v = LoRADense(inner_dim, use_bias=False, name="to_v_ip", **ip_lora, **common)(
                ip_hidden_states, lora_scale
            )
            if self.time_aware_ip:
                if temb is None:
                    raise ValueError("time_aware_ip requires temb")
                ip_k = AdaLayerNorm(inner_dim, name="ln_k_ip", **ip_lora, **common)(ip_k, temb, lora_scale)
                ip_v = AdaLayerNorm(inner_dim, name="ln_v_ip", **ip_lora, **common)(ip_v, temb, lora_scale)
            ip_k = ip_k.reshape(b, -1, self.heads, self.head_dim)
            ip_v = ip_v.reshape(b, -1, self.heads, self.head_dim)
            ip_out = dot_product_attention(q, ip_k, ip_v, use_flash=self.use_flash)
            ip_out = ip_out.reshape(b, n, inner_dim)
            scale = self.ip_scale if ip_scale is None else ip_scale
            out = out + jnp.asarray(scale, out.dtype) * ip_out

        out = LoRADense(self.query_dim, use_bias=self.out_bias, name="to_out", **lora_qo, **common)(out, lora_scale)
        return out
