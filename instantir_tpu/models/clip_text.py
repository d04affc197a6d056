"""CLIP text encoders (Flax) for SDXL prompt conditioning.

SDXL uses two encoders (reference pipeline ``sdxl_instantir.py:264-272``):
  * text_encoder   — CLIP ViT-L/14 text tower: 12 layers, width 768,
    quick_gelu, penultimate hidden state used;
  * text_encoder_2 — OpenCLIP bigG text tower: 32 layers, width 1280, gelu,
    penultimate hidden state + projected pooled EOS embedding (dim 1280).

Prompt embeds = concat(enc1_h[-2], enc2_h[-2]) → [B, 77, 2048];
pooled = enc2 projected EOS. Causal masking throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.ops.attention import attention_xla

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_length: int = 77
    hidden_act: str = "quick_gelu"
    projection_dim: Optional[int] = None  # set → CLIPTextModelWithProjection
    eos_token_id: int = 49407
    eps: float = 1e-5


def clip_vit_l_text_config(**overrides) -> CLIPTextConfig:
    return dataclasses.replace(CLIPTextConfig(), **overrides)


def open_clip_bigg_text_config(**overrides) -> CLIPTextConfig:
    base = CLIPTextConfig(
        hidden_size=1280,
        num_layers=32,
        num_heads=20,
        intermediate_size=5120,
        hidden_act="gelu",
        projection_dim=1280,
    )
    return dataclasses.replace(base, **overrides)


def tiny_clip_text_config(**overrides) -> CLIPTextConfig:
    base = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32, projection_dim=16
    )
    return dataclasses.replace(base, **overrides)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_bias: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, n, c = x.shape
        head_dim = cfg.hidden_size // cfg.num_heads
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(epsilon=cfg.eps, dtype=jnp.float32, param_dtype=jnp.float32)

        h = nn.LayerNorm(name="norm1", **ln)(x.astype(jnp.float32)).astype(self.dtype)
        q = nn.Dense(cfg.hidden_size, name="q", **common)(h).reshape(b, n, cfg.num_heads, head_dim)
        k = nn.Dense(cfg.hidden_size, name="k", **common)(h).reshape(b, n, cfg.num_heads, head_dim)
        v = nn.Dense(cfg.hidden_size, name="v", **common)(h).reshape(b, n, cfg.num_heads, head_dim)
        attn = attention_xla(q, k, v, bias=causal_bias).reshape(b, n, c)
        x = x + nn.Dense(cfg.hidden_size, name="proj", **common)(attn)

        h = nn.LayerNorm(name="norm2", **ln)(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, name="fc1", **common)(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, name="fc2", **common)(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden, penultimate_hidden, pooled_or_None)."""

    config: CLIPTextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.config
        b, n = input_ids.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=self.param_dtype, name="token_embedding")(
            input_ids
        ).astype(self.dtype)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (cfg.max_length, cfg.hidden_size), self.param_dtype
        )
        x = tok + pos[None, :n].astype(self.dtype)

        causal = jnp.triu(jnp.full((n, n), -1e9, jnp.float32), k=1)[None, None]
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}", **common)(x, causal)

        last = nn.LayerNorm(epsilon=cfg.eps, dtype=jnp.float32, param_dtype=jnp.float32, name="final_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)

        pooled = None
        if cfg.projection_dim is not None:
            # pooled = final-LN hidden at the EOS position, projected.
            eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
            pooled = last[jnp.arange(b), eos_pos]
            pooled = nn.Dense(cfg.projection_dim, use_bias=False, name="text_projection", **common)(pooled)
        return last, penultimate, pooled


def encode_sdxl_prompt(
    enc1: CLIPTextModel,
    params1,
    enc2: CLIPTextModel,
    params2,
    ids1: jnp.ndarray,
    ids2: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SDXL dual-encoder prompt embedding: ([B,77,d1+d2], pooled [B,proj])."""
    _, h1, _ = enc1.apply(params1, ids1)
    _, h2, pooled = enc2.apply(params2, ids2)
    return jnp.concatenate([h1, h2], axis=-1), pooled
