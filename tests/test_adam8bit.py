"""8-bit AdamW: quantization round-trip, near-fp32 trajectories, memory."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from instantir_tpu.train import common
from instantir_tpu.train.adam8bit import (
    BLOCK,
    _dequantize,
    _quantize,
    adamw8bit,
    scale_by_adam8bit,
)


def test_quantize_roundtrip(rng):
    for size in (7, BLOCK, BLOCK * 3 + 5):
        x = jnp.asarray(rng.normal(size=(size,)) * rng.uniform(0.01, 10), jnp.float32)
        q, s = _quantize(x)
        assert q.dtype == jnp.int8
        back = _dequantize(q, s, x.shape)
        # blockwise absmax int8: error bounded by scale/2 = absmax/254 per block
        err = np.abs(np.asarray(back - x))
        assert err.max() <= float(jnp.abs(x).max()) / 254 + 1e-7
    # zeros stay exactly zero
    q, s = _quantize(jnp.zeros((10,)))
    np.testing.assert_array_equal(np.asarray(_dequantize(q, s, (10,))), 0)


def test_adam8bit_tracks_fp32_adam(rng):
    """On a quadratic bowl, the 8-bit trajectory stays close to fp32 Adam and
    reaches a comparable loss."""
    A = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    def loss(p):
        return jnp.sum((A @ p["w"] - target) ** 2) + jnp.sum((p["b"] - 1.0) ** 2)

    p0 = {"w": jnp.zeros((8,)), "b": jnp.zeros((300,))}  # b spans >1 block

    def run(tx, steps=200):
        p, st = p0, tx.init(p0)
        step = jax.jit(lambda p, st: (lambda g: tx.update(g, st, p))(jax.grad(loss)(p)))
        for _ in range(steps):
            up, st = step(p, st)
            p = optax.apply_updates(p, up)
        return p, float(loss(p))

    p8, l8 = run(adamw8bit(1e-2, weight_decay=0.0))
    pf, lf = run(optax.adamw(1e-2, weight_decay=0.0))
    assert l8 < 0.05 * float(loss(p0)), l8  # converges
    assert l8 < max(2.0 * lf, 1e-2), (l8, lf)  # comparable optimum
    # trajectories agree to (accumulated) quantization tolerance
    np.testing.assert_allclose(np.asarray(p8["w"]), np.asarray(pf["w"]), atol=0.1)
    np.testing.assert_allclose(np.asarray(p8["b"]), np.asarray(pf["b"]), atol=0.1)


def test_state_is_int8_and_smaller():
    p = {"k": jnp.zeros((1024, 64))}
    st = scale_by_adam8bit().init(p)
    assert st.mu_q["k"].dtype == jnp.int8 and st.nu_q["k"].dtype == jnp.int8
    fp32_bytes = 2 * 1024 * 64 * 4
    q_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves((st.mu_q, st.mu_scale, st.nu_q, st.nu_scale))
    )
    assert q_bytes < fp32_bytes / 3.8  # ~1.02 bytes/param vs 8


def test_composes_with_trainer_chain(rng):
    """make_adamw(use_8bit=True) + clip + MultiSteps runs and updates."""
    tx = common.make_adamw(1e-3, use_8bit=True, max_grad_norm=1.0)
    tx = optax.MultiSteps(tx, every_k_schedule=2)
    p = {"w": jnp.asarray(rng.normal(size=(33,)), jnp.float32)}
    st = tx.init(p)
    g = {"w": jnp.ones((33,))}
    up1, st = tx.update(g, st, p)
    assert float(jnp.abs(up1["w"]).max()) == 0.0  # accumulating micro-step
    up2, st = tx.update(g, st, p)
    assert float(jnp.abs(up2["w"]).max()) > 0.0  # applied on the k-th


def test_stage1_trainer_with_8bit_adam(tmp_path):
    """End-to-end: a stage-1 step with use_8bit_adam=True updates params and
    carries int8 moment state through checkpointing-compatible pytrees."""
    import jax.numpy as jnp
    from instantir_tpu.data.dataset import SyntheticImageDataset
    from instantir_tpu.models.dinov2 import tiny_dinov2_config
    from instantir_tpu.models.resampler import tiny_resampler_config
    from instantir_tpu.models.unet import tiny_unet_config
    from instantir_tpu.models.vae import tiny_vae_config
    from instantir_tpu.pipeline.factory import build_pipeline
    from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer

    res = 32
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    pipe = build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=res
    )
    cfg = Stage1Config(
        output_dir=str(tmp_path / "s18"), max_train_steps=1, train_batch_size=2,
        resolution=res, lr_warmup_steps=0, learning_rate=1e-3, use_8bit_adam=True,
    )
    tr = Stage1Trainer(pipe.unet, pipe.resampler, pipe.vae, pipe.image_encoder, pipe.params, cfg)
    leaves = jax.tree_util.tree_leaves(tr.opt_state)
    assert any(getattr(x, "dtype", None) == jnp.int8 for x in leaves)

    rng = np.random.default_rng(5)
    cross = ucfg.cross_attention_dim
    pooled_dim = ucfg.projection_class_embeddings_input_dim - ucfg.addition_time_embed_dim * 6
    cond = {
        "prompt_embeds": jnp.asarray(rng.normal(size=(2, 7, cross)), jnp.float32),
        "uncond_prompt_embeds": jnp.zeros((2, 7, cross), jnp.float32),
        "pooled_embeds": jnp.asarray(rng.normal(size=(2, pooled_dim)), jnp.float32),
        "uncond_pooled_embeds": jnp.zeros((2, pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32), (2, 1)),
    }
    data = SyntheticImageDataset(seed=0).batches(batch_size=2, gt_size=res * 4)
    key = jax.random.PRNGKey(0)
    before = jax.tree_util.tree_map(np.asarray, tr.trainable)
    metrics = tr.train_step(tr.prepare_batch(next(data), cond, key), key)
    assert np.isfinite(float(metrics["loss"]))
    moved = max(
        float(np.abs(a - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(tr.trainable))
    )
    assert moved > 0
