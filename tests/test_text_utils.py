"""Prompt-encoding helpers and new-token embedding surgery (dormant reference
component ``utils/text_utils.py``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.clip_text import CLIPTextModel, encode_sdxl_prompt, tiny_clip_text_config
from instantir_tpu.utils.text import add_tokens, encode_prompt, patch_token_embeddings


@pytest.fixture(scope="module")
def towers():
    c1 = tiny_clip_text_config(projection_dim=None)
    c2 = tiny_clip_text_config(hidden_size=24, num_heads=2, projection_dim=16)
    e1, e2 = CLIPTextModel(c1), CLIPTextModel(c2)
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 900, size=(2, 8)), jnp.int32)
    p1 = e1.init(jax.random.PRNGKey(0), ids)
    p2 = e2.init(jax.random.PRNGKey(1), ids)
    return (c1, c2), (e1, e2), (p1, p2), ids


def test_encode_prompt_matches_sdxl_helper(towers):
    _, (e1, e2), (p1, p2), ids = towers
    emb, pooled = encode_prompt([e1, e2], [p1, p2], [ids, ids])
    emb2, pooled2 = encode_sdxl_prompt(e1, p1, e2, p2, ids, ids)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=0)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled2), atol=0)
    assert emb.shape == (2, 8, 16 + 24)


def test_encode_prompt_requires_projection_tower(towers):
    _, (e1, _), (p1, _), ids = towers
    with pytest.raises(ValueError, match="projection"):
        encode_prompt([e1], [p1], [ids])


def test_add_tokens_and_patch(towers):
    (c1, _), (e1, _), (p1, _), ids = towers
    new_p, new_c, first = add_tokens(p1, c1, num_new=2, pad_to_multiple_of=128,
                                     key=jax.random.PRNGKey(3))
    assert first == c1.vocab_size
    assert new_c.vocab_size % 128 == 0 and new_c.vocab_size >= c1.vocab_size + 2
    # old rows intact
    np.testing.assert_array_equal(
        np.asarray(new_p["params"]["token_embedding"]["embedding"][: c1.vocab_size]),
        np.asarray(p1["params"]["token_embedding"]["embedding"]),
    )
    # write learned embeddings into the two new slots and use them in a prompt
    learned = np.random.default_rng(1).normal(size=(2, c1.hidden_size)).astype(np.float32)
    new_p = patch_token_embeddings(new_p, [first, first + 1], learned)
    np.testing.assert_allclose(
        np.asarray(new_p["params"]["token_embedding"]["embedding"][first]), learned[0], atol=1e-6
    )
    ids2 = ids.at[0, 2].set(first)
    last, _, _ = CLIPTextModel(new_c).apply(new_p, ids2)
    assert np.isfinite(np.asarray(last)).all()
    # the patched token changes the sequence embedding, other rows' tokens don't move
    base_last, _, _ = CLIPTextModel(new_c).apply(new_p, ids)
    assert not np.allclose(np.asarray(last[0]), np.asarray(base_last[0]))
    np.testing.assert_allclose(np.asarray(last[1]), np.asarray(base_last[1]), atol=0)
