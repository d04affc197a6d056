"""Image-projection containers (reference ``module/ip_adapter/ip_adapter.py``).

The live InstantIR config uses a single Perceiver ``Resampler``; diffusers'
``MultiIPAdapterImageProjection`` wraps a *list* of projectors (one per
IP-adapter) and the legacy containers project CLIP embeddings with simpler
heads. Provided for multi-adapter parity:

  * ``ImageProjModel``  — linear → reshape to N tokens (+LN), the original
    IP-adapter head (reference ``ip_adapter.py:26-44``);
  * ``MLPProjModel``    — GELU MLP head (``:46-61``);
  * ``MultiImageProjection`` — applies a list of projection modules to a list
    of image-embedding tensors (``:63-90``).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ImageProjModel(nn.Module):
    cross_attention_dim: int = 2048
    clip_embeddings_dim: int = 1024
    clip_extra_context_tokens: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = nn.Dense(
            self.cross_attention_dim * self.clip_extra_context_tokens,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(image_embeds)
        x = x.reshape(b, self.clip_extra_context_tokens, self.cross_attention_dim)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)


class MLPProjModel(nn.Module):
    cross_attention_dim: int = 2048
    clip_embeddings_dim: int = 1024
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.clip_embeddings_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(
            image_embeds
        )
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.cross_attention_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(x)
        if x.ndim == 2:
            x = x[:, None, :]
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)


class MultiImageProjection:
    """Container applying one projector per IP-adapter; concatenates tokens.

    Functional (not a linen module): holds (module, params) pairs so each
    projector keeps its own parameter tree, mirroring
    ``MultiIPAdapterImageProjection.image_projection_layers``.
    """

    def __init__(self, projectors: Sequence[Tuple[Any, Any]]):
        self.projectors = list(projectors)

    def __len__(self):
        return len(self.projectors)

    def __call__(self, image_embeds_list: Sequence[jnp.ndarray], **kwargs) -> jnp.ndarray:
        if len(image_embeds_list) != len(self.projectors):
            raise ValueError(
                f"got {len(image_embeds_list)} image-embedding tensors for {len(self.projectors)} projectors"
            )
        tokens = [mod.apply(params, emb, **kwargs) for (mod, params), emb in zip(self.projectors, image_embeds_list)]
        return jnp.concatenate(tokens, axis=1)
