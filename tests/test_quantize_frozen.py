"""QLoRA storage mode: weight-only int8 frozen UNet during training
(``common.quantize_frozen_unet`` / ``--quantize_frozen_unet``).

The reference trains stage 2 on 80 GB A100s with a full-precision frozen
UNet; on a 16 GB v5e the exact-bf16 single-chip step misses HBM by ~0.5 GB
(docs/perf.md round 4). This mode stores the frozen LoRA-base kernels int8
(arXiv 2305.14314's recipe: quantized frozen base, fp adapters), dequantized
to the compute dtype at use — an ordinary differentiable op, so gradients
still flow through the frozen UNet to the trainable aggregator.

Pinned here: (1) the weight-only ops match fp to int8-rounding tolerance for
outputs AND input-gradients; (2) ``quantize_tree(weight_only=..., exclude=...)``
moves exactly the intended kernels; (3) the stage-2/stage-1 trainer flag
path — trained/EMA params stay fp, a real train step runs, and the loss
stays close to the exact trainer's on the same batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import instantir_tpu.ops.quant as quant_mod
from instantir_tpu.data.dataset import SyntheticImageDataset
from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.ops.quant import dequantize_weight, quantize_tree, quantize_weight
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer, stage1_trainable_pred
from instantir_tpu.train.stage2_aggregator import Stage2Config, Stage2Trainer

RES = 32
BATCH = 2


@pytest.fixture(scope="module")
def bundle():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    return build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES
    )


def _cond(pipe, b):
    rng = np.random.default_rng(5)
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = (
        pipe.unet.config.projection_class_embeddings_input_dim
        - pipe.unet.config.addition_time_embed_dim * 6
    )
    return {
        "prompt_embeds": jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32),
        "uncond_prompt_embeds": jnp.zeros((b, 7, cross), jnp.float32),
        "pooled_embeds": jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32),
        "uncond_pooled_embeds": jnp.zeros((b, pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32), (b, 1)),
    }


def test_weight_only_dense_matches_fp_and_is_differentiable():
    """Dequantize-at-use: output ≈ fp matmul with the per-channel int8
    rounding error, and d/dx equals the matmul against the SAME dequantized
    kernel (exactly — the kernel is a constant)."""
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(64, 32)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    kq, ks = quantize_weight(k)
    kd = dequantize_weight(kq, ks, jnp.float32)
    # per-channel absmax/127 rounding bound
    assert float(jnp.max(jnp.abs(kd - k))) <= float(jnp.max(jnp.abs(k))) / 127.0 + 1e-7

    f = lambda x_: (x_ @ kd).sum()  # noqa: E731
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(jnp.ones((4, 32)) @ kd.T), rtol=1e-6)


def test_quantize_tree_weight_only_and_exclude():
    params = {
        "params": {
            "blk": {
                "attn": {"base": {"kernel": jnp.ones((32, 32), jnp.float32)}},
                "to_k_ip": {"base": {"kernel": jnp.ones((32, 32), jnp.float32)}},
            }
        }
    }
    out = quantize_tree(
        params, min_size=1, weight_only=True,
        exclude=lambda path: "to_k_ip" in path,
    )
    q = out["quant"]["blk"]
    assert "kernel_qw" in q["attn"]["base"] and "kernel_q" not in q["attn"]["base"]
    assert "to_k_ip" not in q  # excluded path stays fp
    # pruned: the kernel leaf is gone (a now-empty parent dict is dropped too)
    assert "kernel" not in out["params"]["blk"].get("attn", {}).get("base", {})
    assert "kernel" in out["params"]["blk"]["to_k_ip"]["base"]


def _run_stage2(bundle, quantized: bool, monkeypatch):
    if quantized:
        monkeypatch.setattr(quant_mod, "DEFAULT_MIN_SIZE", 1)
    cfg = Stage2Config(
        output_dir="", max_train_steps=1, train_batch_size=BATCH, resolution=RES,
        use_ema_adapter=True, lr_warmup_steps=0, learning_rate=1e-3,
        resume_from_checkpoint=None, quantize_frozen_unet=quantized,
    )
    trainer = Stage2Trainer(
        bundle.unet, bundle.aggregator, bundle.resampler, bundle.vae, bundle.image_encoder,
        bundle.params, cfg, mesh=None,
    )
    host = next(SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES * 4))
    batch = trainer.prepare_batch(host, _cond(bundle, BATCH), jax.random.PRNGKey(2))
    before = jax.tree_util.tree_map(np.asarray, trainer.trainable)
    metrics = trainer.train_step(batch, jax.random.PRNGKey(3))
    return trainer, float(metrics["loss"]), before


def test_stage2_trainer_quantized_frozen_unet(bundle, monkeypatch):
    trainer, loss_q, before = _run_stage2(bundle, quantized=True, monkeypatch=monkeypatch)
    assert np.isfinite(loss_q)

    # the int8 side tree exists and holds ONLY weight-only entries
    qpaths = [k for k in trainer.frozen if "quant" in k]
    assert qpaths and all(k[0] == "unet" for k in qpaths)
    assert any(k[-1] == "kernel_qw" for k in qpaths)
    assert not any(k[-1] == "kernel_q" for k in qpaths)
    # trained/EMA-tracked adapter (ip) kernels stay fp — none in the quant tree
    assert not any(any("_ip" in str(p) for p in k) for k in qpaths)
    # the EMA partition therefore carries no int8 leaf
    assert all(v.dtype != jnp.int8 for v in trainer.ema_adapter.values())

    # gradients flowed THROUGH the quantized frozen UNet into the aggregator
    changed = [
        float(np.max(np.abs(np.asarray(after) - before[k])))
        for k, after in trainer.trainable.items()
        if k[0] == "aggregator"
    ]
    assert max(changed) > 0

    # loss on the identical batch stays close to the exact-bf16 trainer's
    _, loss_fp, _ = _run_stage2(bundle, quantized=False, monkeypatch=monkeypatch)
    assert abs(loss_q - loss_fp) < 0.05 * max(1.0, abs(loss_fp))


def test_stage1_trainer_quantized_keeps_ip_fp(bundle, monkeypatch):
    monkeypatch.setattr(quant_mod, "DEFAULT_MIN_SIZE", 1)
    cfg = Stage1Config(
        output_dir="", max_train_steps=1, train_batch_size=BATCH, resolution=RES,
        lr_warmup_steps=0, learning_rate=1e-3, resume_from_checkpoint=None,
        quantize_frozen_unet=True,
    )
    trainer = Stage1Trainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg,
        mesh=None,
    )
    # every trainable leaf is fp and the trainable set is exactly stage-1's
    assert all(v.dtype != jnp.int8 for v in trainer.trainable.values())
    assert all(stage1_trainable_pred(tuple(str(p) for p in k)) for k in trainer.trainable)
    host = next(SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES * 4))
    batch = trainer.prepare_batch(host, _cond(bundle, BATCH), jax.random.PRNGKey(2))
    metrics = trainer.train_step(batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
