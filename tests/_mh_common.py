"""Shared fixtures for the multi-process multihost tests (parent + worker)."""

import numpy as np

RES = 32
GLOBAL_BATCH = 8


def make_cond(ucfg):
    """Deterministic global conditioning batch (same on every process)."""
    rng = np.random.default_rng(5)
    cross = ucfg.cross_attention_dim
    pooled_dim = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    return {
        "prompt_embeds": rng.normal(size=(GLOBAL_BATCH, 7, cross)).astype(np.float32),
        "uncond_prompt_embeds": np.zeros((GLOBAL_BATCH, 7, cross), np.float32),
        "pooled_embeds": rng.normal(size=(GLOBAL_BATCH, pooled_dim)).astype(np.float32),
        "uncond_pooled_embeds": np.zeros((GLOBAL_BATCH, pooled_dim), np.float32),
        "time_ids": np.tile(
            np.asarray([[RES, RES, 0, 0, RES, RES]], np.float32), (GLOBAL_BATCH, 1)
        ),
    }
