"""CLIP vision tower (ViT) in Flax — the image half of CLIPLoss.

The reference loads OpenAI ``clip.load("ViT-B/16")`` (``losses/losses.py:339``)
and scores images against prompt tokens with the contrastive logit. This
module implements the HF ``CLIPVisionModelWithProjection`` architecture
(identical math to the OpenAI checkpoint after HF's conversion): conv patch
embedding, class token, learned positions, pre-LN, quick-gelu transformer,
post-LN on the class token, visual projection. ``convert_clip_vision`` maps
the HF state-dict naming.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from instantir_tpu.ops.attention import attention_xla

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 16
    projection_dim: Optional[int] = 512
    hidden_act: str = "quick_gelu"
    eps: float = 1e-5


def clip_vit_b16_config(**overrides) -> CLIPVisionConfig:
    return dataclasses.replace(CLIPVisionConfig(), **overrides)


def tiny_clip_vision_config(**overrides) -> CLIPVisionConfig:
    base = CLIPVisionConfig(
        hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32, image_size=32, patch_size=8,
        projection_dim=8,
    )
    return dataclasses.replace(base, **overrides)


# OpenAI CLIP normalization (the reference's clip_normalize,
# losses/losses.py:352-354); inputs in [0, 1]
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_clip(images01: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] → resized + normalized (bicubic like CLIP's)."""
    b, h, w, c = images01.shape
    if (h, w) != (size, size):
        images01 = jax.image.resize(images01, (b, size, size, c), method="bicubic")
        images01 = jnp.clip(images01, 0.0, 1.0)
    return (images01 - CLIP_MEAN) / CLIP_STD


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPVisionLayer(nn.Module):
    config: CLIPVisionConfig
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
        x = x + nn.Dense(cfg.hidden_size, name="proj", **common)(attn)

        h = nn.LayerNorm(name="norm2", **ln)(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, name="fc1", **common)(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, name="fc2", **common)(h)
        return x + h


class CLIPVisionModel(nn.Module):
    """[B, S, S, 3] normalized images → (tokens [B, N+1, d], projected CLS [B, proj])."""

    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.config
        b = pixels.shape[0]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size), strides=cfg.patch_size, use_bias=False,
            padding=0, name="patch_embed", **common,
        )(pixels.astype(self.dtype))
        patches = patches.reshape(b, n_patches, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (cfg.hidden_size,), self.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (n_patches + 1, cfg.hidden_size), self.param_dtype
        )
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.eps, dtype=jnp.float32, param_dtype=jnp.float32, name="pre_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)

        for i in range(cfg.num_layers):
            x = CLIPVisionLayer(cfg, name=f"layers_{i}", **common)(x)

        pooled = nn.LayerNorm(epsilon=cfg.eps, dtype=jnp.float32, param_dtype=jnp.float32, name="post_norm")(
            x[:, 0].astype(jnp.float32)
        ).astype(self.dtype)
        proj = None
        if cfg.projection_dim is not None:
            proj = nn.Dense(cfg.projection_dim, use_bias=False, name="visual_projection", **common)(pooled)
        return x, proj


class CLIPImageEncoder(nn.Module):
    """CLIP vision tower as the pipeline's *image-prompt encoder* — the
    reference's ``--use_clip_encoder`` branch (``infer.py:275-279``,
    ``module/ip_adapter/utils.py:104-111``).

    Drop-in for ``DINOv2Model`` behind the framework-wide encoder contract
    (``preprocess_dinov2(pixels01)`` → ``encoder.apply(params, pixels)`` →
    token sequence): the call re-normalizes from the ImageNet statistics the
    shared preprocess applied to CLIP's own statistics (exact — per-channel
    affine maps commute with the bilinear resize), resizes again if the CLIP
    config wants a non-224 grid, and returns the **penultimate-layer hidden
    states** ``[B, N+1, hidden_size]``. That matches the reference's live
    CLIP semantics: with a Resampler projector the pipeline passes
    ``output_hidden_states=True`` and feeds ``hidden_states[-2]``
    (``pipelines/sdxl_instantir.py:643``, selection at ``:698``) — the
    IP-Adapter-Plus convention — and builds the Resampler with
    ``embedding_dim = image_encoder.config.hidden_size``
    (``module/ip_adapter/utils.py:138-142``). The pooled
    ``image_embeds`` branch (``:654-656``) is live only for plain
    ``ImageProjection`` projectors, which InstantIR never installs.

    Deviation (documented): the resize uses bilinear interpolation (the
    shared preprocess) where HF's ``CLIPImageProcessor`` defaults to bicubic.

    The pipeline preprocesses at THIS config's ``image_size`` grid directly
    (``preprocess_dinov2(..., size=cfg.image_size)``), so a non-224 CLIP
    tower (e.g. 336px) gets a single direct resize from the source image;
    the internal resize below is a shape-safety fallback only.
    """

    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        from instantir_tpu.models.dinov2 import DINOV2_MEAN, DINOV2_STD

        cfg = self.config
        imagenet_mean = jnp.asarray(DINOV2_MEAN, pixels.dtype)
        imagenet_std = jnp.asarray(DINOV2_STD, pixels.dtype)
        x01 = pixels * imagenet_std + imagenet_mean
        b, h, w, c = x01.shape
        if (h, w) != (cfg.image_size, cfg.image_size):
            x01 = jax.image.resize(x01, (b, cfg.image_size, cfg.image_size, c), method="bilinear")
        x = (x01 - jnp.asarray(CLIP_MEAN, x01.dtype)) / jnp.asarray(CLIP_STD, x01.dtype)
        # hidden_states[-2] = output of layer n-2 — run n-1 of the n layers,
        # no post-LN, no projection (HF indexing: hidden_states[i] is the
        # embedding output for i=0, layer i-1's output otherwise)
        sub_cfg = dataclasses.replace(cfg, num_layers=cfg.num_layers - 1, projection_dim=None)
        tokens, _ = CLIPVisionModel(sub_cfg, name="clip", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return tokens


def convert_clip_image_encoder(sd: Dict[str, np.ndarray], config: CLIPVisionConfig) -> Dict[str, Any]:
    """HF ``CLIPVisionModelWithProjection`` state dict → ``CLIPImageEncoder``
    tree. The full tower converts; the wrapper's sub-module simply does not
    read the last layer / post-norm / projection leaves (flax ignores unused
    subtrees), mirroring ``hidden_states[-2]`` never touching them."""
    return {"params": {"clip": convert_clip_vision(sd, config)["params"]}}


def convert_clip_vision(sd: Dict[str, np.ndarray], config: CLIPVisionConfig) -> Dict[str, Any]:
    """HF ``CLIPVisionModelWithProjection`` state dict → flax tree."""
    p0 = "vision_model."

    def lin(prefix):
        return {
            "kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"], np.float32).T),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        }

    def norm(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
                "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}

    params: Dict[str, Any] = {
        "cls_token": np.asarray(sd[f"{p0}embeddings.class_embedding"], np.float32),
        "pos_embed": np.asarray(sd[f"{p0}embeddings.position_embedding.weight"], np.float32),
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                np.transpose(np.asarray(sd[f"{p0}embeddings.patch_embedding.weight"], np.float32), (2, 3, 1, 0))
            )
        },
        "pre_norm": norm(f"{p0}pre_layrnorm"),  # HF's typo is canonical
        "post_norm": norm(f"{p0}post_layernorm"),
    }
    for i in range(config.num_layers):
        q = f"{p0}encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "norm1": norm(f"{q}.layer_norm1"),
            "q": lin(f"{q}.self_attn.q_proj"),
            "k": lin(f"{q}.self_attn.k_proj"),
            "v": lin(f"{q}.self_attn.v_proj"),
            "proj": lin(f"{q}.self_attn.out_proj"),
            "norm2": norm(f"{q}.layer_norm2"),
            "fc1": lin(f"{q}.mlp.fc1"),
            "fc2": lin(f"{q}.mlp.fc2"),
        }
    if config.projection_dim is not None and "visual_projection.weight" in sd:
        params["visual_projection"] = {
            "kernel": np.ascontiguousarray(np.asarray(sd["visual_projection.weight"], np.float32).T)
        }
    return {"params": params}
