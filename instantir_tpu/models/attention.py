"""SDXL attention with the decoupled, time-aware image-prompt (IP) branch.

Functionally replaces the reference's attention-processor zoo
(``module/ip_adapter/attention_processor.py``): instead of swapping processor
objects into modules, the behaviors are forward-time arguments —

  * plain self/cross attention               (AttnProcessor2_0, ``:323``)
  * + decoupled IP branch with AdaLN(temb)   (TA_IPAttnProcessor2_0, ``:1063-1207``)
  * + external-KV injection, three modes     (concat ``:380-382``;
    AdditiveKV ``:703-813``; TA_AdditiveKV ``:813-928``)

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
      external_kv_mode: how ``external_kv`` tokens enter the attention —
        ``"concat"`` appends them to the K/V sequence (the plain processor's
        behavior, reference ``:380-382``); ``"additive"`` runs a *second*
        attention over them and adds ``additive_scale · out``
        (AdditiveKV_AttnProcessor2_0, ``:784-798``); ``"ta_additive"``
        additionally AdaLayerNorm(temb)-modulates the external K/V first
        (TA_AdditiveKV_AttnProcessor2_0, ``:903-907``).
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
    external_kv_mode: str = "concat"  # "concat" | "additive" | "ta_additive"
    additive_scale: float = 1.0
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

        if external_kv is not None and self.external_kv_mode == "concat":
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

        if external_kv is not None and self.external_kv_mode != "concat":
            # AdditiveKV: a second attention with the same queries over the
            # injected K/V, added as ``out + additive_scale · ext_out``
            # (attention_processor.py:784-798); the TA variant AdaLN(temb)'s
            # the external K/V first (:903-907).
            if self.external_kv_mode not in ("additive", "ta_additive"):
                raise ValueError(f"unknown external_kv_mode {self.external_kv_mode!r}")
            ext_k = external_kv.k.astype(self.dtype)
            ext_v = external_kv.v.astype(self.dtype)
            if self.external_kv_mode == "ta_additive":
                if temb is None:
                    raise ValueError("external_kv_mode='ta_additive' requires temb")
                ext_k = AdaLayerNorm(inner_dim, name="ln_k_ext", **common)(ext_k, temb)
                ext_v = AdaLayerNorm(inner_dim, name="ln_v_ext", **common)(ext_v, temb)
            ext_k = ext_k.reshape(b, -1, self.heads, self.head_dim)
            ext_v = ext_v.reshape(b, -1, self.heads, self.head_dim)
            ext_out = dot_product_attention(q, ext_k, ext_v, use_flash=self.use_flash)
            out = out + jnp.asarray(self.additive_scale, out.dtype) * ext_out.reshape(b, n, inner_dim)

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


class SplitAttention(nn.Module):
    """Aggregator self-attention ablations over the H-concatenated (cond|pad|ref) map.

    Rebuilds the dormant processors installed by ``init_aggregator_attn_proc``
    (reference ``module/ip_adapter/attention_processor.py:1418-1467``): the
    token sequence is the flattened concatenated feature map; the two streams
    are recovered (the zero pad row between them, if present, is dropped),
    attended, and reassembled with a fresh zero pad row — so the pad tokens
    pass through on the transformer residual unchanged, exactly like the
    reference's zero-output-pad + residual_connection.

    * ``mode="joint"`` — ``split_AttnProcessor2_0`` (``:417-538``): one joint
      self-attention over [cond; ref] with the pad row excluded. Without a pad
      row this is numerically identical to plain attention over the full map
      (the equivalence COMPONENTS.md argues for the default path).
    * ``mode="sep"`` — ``sep_split_AttnProcessor2_0`` (``:541-700``):
      per-stream self-attention with *shared* projections, AdaLN(temb) applied
      to the ref stream's K/V (``:629-631``), and bidirectional cross-attention
      added asymmetrically: ``cond += ref_scale·10·attn(q_cond, k_ref, v_ref)``
      (``:655``) and ``ref += ref_scale·attn(q_ref, k_cond, v_cond)``
      (``:661-665``), all before the shared ``to_out``.

    Projection names match :class:`Attention` (``to_q/to_k/to_v/to_out``), so
    ``from_unet`` weight copies into the aggregator trunk apply unchanged;
    ``mode="sep"`` adds ``ln_k_ref``/``ln_v_ref`` AdaLayerNorms.
    """

    query_dim: int
    heads: int
    head_dim: int
    mode: str = "joint"  # "joint" | "sep"
    use_flash: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, H·W, C] flattened concatenated map
        spatial: tuple,  # (H, W) of the concatenated map; H = 2·h (+1 if padded)
        temb: Optional[jnp.ndarray] = None,
        ref_scale=1.0,
        external_kv=None,
    ) -> jnp.ndarray:
        h, w = spatial
        inner = self.heads * self.head_dim
        b, n, _ = hidden_states.shape
        if n != h * w:
            raise ValueError(f"sequence {n} does not match spatial {h}x{w}")
        n0 = (h // 2) * w
        pad = n - 2 * n0  # 0, or one w-token zero row between the streams
        x0 = hidden_states[:, :n0]
        x1 = hidden_states[:, n - n0 :]

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        to_q = LoRADense(inner, use_bias=False, name="to_q", **common)
        to_k = LoRADense(inner, use_bias=False, name="to_k", **common)
        to_v = LoRADense(inner, use_bias=False, name="to_v", **common)
        to_out = LoRADense(self.query_dim, use_bias=True, name="to_out", **common)

        def split_heads(t):
            return t.reshape(b, -1, self.heads, self.head_dim)

        def attend(q, k, v):
            o = dot_product_attention(split_heads(q), split_heads(k), split_heads(v), use_flash=self.use_flash)
            return o.reshape(b, -1, inner)

        if self.mode == "joint":
            x = jnp.concatenate([x0, x1], axis=1)
            k, v = to_k(x), to_v(x)
            if external_kv is not None:
                k = jnp.concatenate([k, external_kv.k.astype(k.dtype)], axis=1)
                v = jnp.concatenate([v, external_kv.v.astype(v.dtype)], axis=1)
            out = to_out(attend(to_q(x), k, v))
            o0, o1 = out[:, :n0], out[:, n0:]
        elif self.mode == "sep":
            if temb is None:
                raise ValueError("mode='sep' requires temb (AdaLN on the ref K/V)")
            q0, k0, v0 = to_q(x0), to_k(x0), to_v(x0)
            q1, k1, v1 = to_q(x1), to_k(x1), to_v(x1)
            k1 = AdaLayerNorm(inner, name="ln_k_ref", **common)(k1, temb)
            v1 = AdaLayerNorm(inner, name="ln_v_ref", **common)(v1, temb)
            if external_kv is not None:  # appended to the ref K/V (:632-634)
                k1 = jnp.concatenate([k1, external_kv.k.astype(k1.dtype)], axis=1)
                v1 = jnp.concatenate([v1, external_kv.v.astype(v1.dtype)], axis=1)
            rs = jnp.asarray(ref_scale, hidden_states.dtype)
            o0 = attend(q0, k0, v0) + rs * 10.0 * attend(q0, k1, v1)
            o1 = attend(q1, k1, v1) + rs * attend(q1, k0, v0)
            o0, o1 = to_out(o0), to_out(o1)
        else:
            raise ValueError(f"unknown SplitAttention mode {self.mode!r}")

        if pad:
            zeros = jnp.zeros((b, pad, o0.shape[-1]), o0.dtype)
            return jnp.concatenate([o0, zeros, o1], axis=1)
        return jnp.concatenate([o0, o1], axis=1)
