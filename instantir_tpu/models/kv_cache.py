"""Reference-attention KV caching (the KVCopy experiments).

TPU-native counterpart of the reference's dormant ``module/attention.py``
(``KVCache``/``AttentionCache``/``KVCopy``/``drop_kvs``/``clone_kvs``,
``:87-143``): K/V token caches extracted from an encoder pass over a
reference image and injected into another forward as extra attention tokens
(``Attention(..., external_kv=...)`` here; processor ``external_kv`` concat at
``module/ip_adapter/attention_processor.py:380-382``).

Functional-JAX differences from the torch module:

* Caches are immutable NamedTuple pytrees — ``clone_kvs`` is the identity and
  is intentionally not provided (the torch version exists only because its
  caches are mutated in place).
* ``drop_kvs`` keeps a *static* fraction of tokens (count fixed at trace
  time, positions PRNG-sampled) so the program stays fixed-shape under jit —
  the reference's boolean masking draws a dynamic count, which would force a
  recompile per step on TPU.
* ``init_kv_copy`` is parameter surgery (returns a new param tree) instead of
  in-place ``weight.copy_``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.layers import LoRADense

Dtype = Any


class KVCache(NamedTuple):
    k: jnp.ndarray  # [B, S, inner_dim]
    v: jnp.ndarray


class AttentionCache(NamedTuple):
    self_attention: KVCache
    cross_attention: KVCache


class KVCopy(nn.Module):
    """Standalone to_k/to_v pair producing a KVCache from hidden states
    (reference ``KVCopy``, ``module/attention.py:123-143``). Initialized from
    a source attention's projections via ``init_kv_copy``; optional LoRA on
    both projections (``init_lora_in_attn(..., is_kvcopy=True)``, ``:58-72``)."""

    inner_dim: int
    cross_attention_dim: Optional[int] = None
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, lora_scale=0.0) -> KVCache:
        common = dict(
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        k = LoRADense(self.inner_dim, use_bias=False, name="to_k", **common)(hidden_states, lora_scale)
        v = LoRADense(self.inner_dim, use_bias=False, name="to_v", **common)(hidden_states, lora_scale)
        return KVCache(k=k, v=v)


def init_kv_copy(kvcopy_params: Dict, attn_params: Dict) -> Dict:
    """Copy a source attention's to_k/to_v base kernels into a KVCopy tree
    (reference ``init_kv_copy``, ``module/attention.py:139-143``)."""
    out = jax.tree_util.tree_map(lambda x: x, kvcopy_params)  # structural copy
    for name in ("to_k", "to_v"):
        out["params"][name]["base"]["kernel"] = attn_params["params"][name]["base"]["kernel"]
    return out


def drop_kvs(caches: Dict[str, AttentionCache], drop_chance: float, key) -> Dict[str, AttentionCache]:
    """Randomly drop a fraction of each layer's *self-attention* tokens
    (reference ``drop_kvs``, ``module/attention.py:87-96`` — it thins only the
    self-attention cache). Static keep-count per layer; see module docstring."""
    out = {}
    for name, cache in caches.items():
        key, sub = jax.random.split(key)
        s = cache.self_attention.k.shape[1]
        keep = max(1, int(round(s * (1.0 - drop_chance))))
        idx = jax.random.choice(sub, s, shape=(keep,), replace=False)
        idx = jnp.sort(idx)
        out[name] = AttentionCache(
            self_attention=KVCache(
                k=jnp.take(cache.self_attention.k, idx, axis=1),
                v=jnp.take(cache.self_attention.v, idx, axis=1),
            ),
            cross_attention=cache.cross_attention,
        )
    return out
