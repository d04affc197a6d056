"""Prompt tokenization/encoding helpers + new-token embedding patching.

TPU-native counterpart of the reference's dormant ``utils/text_utils.py``:
``tokenize_prompt``/``encode_prompt`` (``:3-42``, the SDXL dual-tower
embedding used by the consistency-encoder lineage) and
``add_tokens``/``patch_embedding_forward`` (``:45-77``, placeholder-token
injection). The torch version resizes module state and monkey-patches the
embedding forward; here both are pure parameter surgery — new rows are
appended to (or written into) the token-embedding table and updated configs
are returned alongside.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tokenize_prompt(tokenizer, prompt: Sequence[str], max_length: Optional[int] = None) -> jnp.ndarray:
    """Batch-tokenize with max-length padding + truncation
    (reference ``tokenize_prompt``, ``utils/text_utils.py:3-13``)."""
    out = tokenizer(
        list(prompt),
        padding="max_length",
        max_length=max_length or tokenizer.model_max_length,
        truncation=True,
    )
    return jnp.asarray(out["input_ids"], jnp.int32)


def encode_prompt(encoders, params_list, ids_list) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-tower prompt embedding (reference ``encode_prompt``,
    ``utils/text_utils.py:16-42``): per-tower penultimate hidden states
    concatenated on channels; pooled projection from the LAST tower.

    Each encoder is a ``CLIPTextModel`` whose apply returns
    (last, penultimate, pooled)."""
    embeds, pooled = [], None
    for enc, params, ids in zip(encoders, params_list, ids_list):
        _, h, p = enc.apply(params, ids)
        embeds.append(h)
        if p is not None:
            pooled = p
    if pooled is None:
        raise ValueError("the final text encoder must have a projection head (pooled output)")
    return jnp.concatenate(embeds, axis=-1), pooled


def add_tokens(params, config, num_new: int, pad_to_multiple_of: int = 128, key=None):
    """Append rows for new placeholder tokens to a CLIPTextModel's embedding
    table (reference ``add_tokens``, ``utils/text_utils.py:45-60``, which
    resizes the torch embedding padded to a multiple of 128).

    Returns (new_params, new_config, first_new_index): token ``i`` of the
    ``num_new`` added tokens has id ``first_new_index + i``."""
    table = params["params"]["token_embedding"]["embedding"]
    vocab, dim = table.shape
    first_new = vocab
    new_vocab = vocab + num_new
    padded = -(-new_vocab // pad_to_multiple_of) * pad_to_multiple_of
    if key is None:
        key = jax.random.PRNGKey(0)
    extra = jax.random.normal(key, (padded - vocab, dim), table.dtype) * 0.01
    new_table = jnp.concatenate([jnp.asarray(table), extra], axis=0)
    new_params = jax.tree_util.tree_map(lambda x: x, params)
    new_params["params"]["token_embedding"]["embedding"] = new_table
    new_config = dataclasses.replace(config, vocab_size=padded)
    return new_params, new_config, first_new


def patch_token_embeddings(params, token_ids: Sequence[int], embeddings: jnp.ndarray):
    """Write learned embeddings into specific token rows — the functional
    analogue of the reference's ``patch_embedding_forward``
    (``utils/text_utils.py:63-77``), which substitutes ``new_embeddings`` at
    ``input == new_tokens`` positions at forward time. Writing the rows once
    is equivalent for frozen tables and keeps the forward jit-pure."""
    table = jnp.asarray(params["params"]["token_embedding"]["embedding"])
    ids = jnp.asarray(list(token_ids), jnp.int32)
    emb = jnp.asarray(embeddings, table.dtype).reshape(len(token_ids), table.shape[-1])
    new_params = jax.tree_util.tree_map(lambda x: x, params)
    new_params["params"]["token_embedding"]["embedding"] = table.at[ids].set(emb)
    return new_params
