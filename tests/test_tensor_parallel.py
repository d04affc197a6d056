"""Tensor-parallel sharding: parity with replicated execution on a 4×2 mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.unet import UNet2DConditionModel, sdxl_base_config, tiny_unet_config
from instantir_tpu.parallel import make_mesh, shard_batch
from instantir_tpu.parallel.tp import tp_shard_params, tp_sharded_bytes


def test_tp_sharded_unet_matches_replicated(rng):
    mesh = make_mesh(model_parallel=2)  # 4 data × 2 model over 8 CPU devices
    cfg = tiny_unet_config(with_ip=True)
    unet = UNet2DConditionModel(cfg, use_flash=False)
    b = 4
    inputs = dict(
        sample=jnp.asarray(rng.normal(size=(b, 16, 16, 4)), jnp.float32),
        timesteps=jnp.zeros((b,), jnp.int32),
        encoder_hidden_states=jnp.asarray(rng.normal(size=(b, 7, 32)), jnp.float32),
        added_text_embeds=jnp.asarray(rng.normal(size=(b, 16)), jnp.float32),
        added_time_ids=jnp.zeros((b, 6), jnp.float32),
        ip_hidden_states=jnp.asarray(rng.normal(size=(b, 4, 32)), jnp.float32),
    )
    params = unet.init(jax.random.PRNGKey(0), **inputs)
    ref = unet.apply(params, **inputs)

    tp_params = tp_shard_params(params, mesh)
    # at least some kernels actually got split over 'model'
    split = [
        x for x in jax.tree_util.tree_leaves(tp_params)
        if hasattr(x, "sharding") and "model" in str(x.sharding.spec)
    ]
    assert len(split) > 10

    sharded_inputs = shard_batch(inputs, mesh)
    out = jax.jit(lambda p, kw: unet.apply(p, **kw))(tp_params, sharded_inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tp_shards_majority_of_sdxl_unet_bytes():
    """SURVEY §2.3's TP plan covers 'UNet conv channels / attention heads';
    round 2 sharded only attention/MLP kernels (convs — the majority of SDXL
    UNet parameters — stayed replicated). The conv column/row rules must keep
    the majority of parameter BYTES sharded at model=2. Pure metadata walk
    (eval_shape), no SDXL-scale weights materialized."""
    ucfg = sdxl_base_config(with_ip=True, lora_rank=64)
    unet = UNet2DConditionModel(ucfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 4), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 2048), jnp.bfloat16),
        jnp.zeros((1, 1280), jnp.bfloat16), jnp.zeros((1, 6), jnp.bfloat16),
        ip_hidden_states=jnp.zeros((1, 64, 2048), jnp.bfloat16)))
    sharded, total = tp_sharded_bytes(shapes, model_size=2)
    assert sharded / total > 0.75, f"only {sharded / total:.1%} of UNet bytes TP-sharded"
