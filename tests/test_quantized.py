"""W8A8 quantized inference (ops/quant.py + QuantizableDense/Conv + pipeline).

The quantized path is an opt-in TPU-native extension (the reference has no
quantized inference); these tests pin:

  * weight/activation quantization numerics (error ≤ the 8-bit bound);
  * LoRADense/LoRAConv int8 routing via the ``quant`` collection, including
    the dynamic LoRA branch adding fp deltas on an int8 base;
  * ``quantize_tree`` structure: prune + side tree, size threshold, bias and
    LoRA leaves untouched;
  * a full tiny-pipeline restore after ``pipe.quantize()`` — runs, finite,
    and close to the exact restore;
  * the guards (freeze_previewer / fuse_previewer_lora incompatibility).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.layers import LoRAConv, LoRADense
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.ops.quant import (
    quantize_tree,
    quantize_weight,
    quantized_bytes,
    w8a8_conv,
    w8a8_dense,
)
from instantir_tpu.pipeline import RestoreConfig
from instantir_tpu.pipeline.factory import build_pipeline


def test_quantize_weight_roundtrip(rng):
    k = jnp.asarray(rng.normal(size=(64, 32)) * np.exp(rng.normal(size=(1, 32))), jnp.float32)
    kq, ks = quantize_weight(k)
    assert kq.dtype == jnp.int8 and ks.shape == (32,)
    deq = kq.astype(jnp.float32) * ks
    # symmetric per-channel: error ≤ scale/2 per element
    err = np.abs(np.asarray(deq - k))
    assert (err <= np.asarray(ks) / 2 + 1e-7).all()


def test_w8a8_dense_close_to_fp(rng):
    x = jnp.asarray(rng.normal(size=(3, 17, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)
    kq, ks = quantize_weight(k)
    ref = x @ k
    out = w8a8_dense(x, kq, ks)
    # 8-bit W+A over a 64-deep contraction: RMS error a few % of signal RMS
    rms = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert rms < 0.05, rms


def test_w8a8_conv_close_to_fp(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 16, 24)) * 0.1, jnp.float32)
    kq, ks = quantize_weight(k)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = w8a8_conv(x, kq, ks, (1, 1), [(1, 1), (1, 1)])
    rms = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert rms < 0.06, rms


@pytest.mark.parametrize("layer", ["dense", "conv"])
def test_lora_layer_int8_routing(rng, layer):
    if layer == "dense":
        mod = LoRADense(24, lora_rank=4)
        x = jnp.asarray(rng.normal(size=(2, 9, 16)), jnp.float32)
    else:
        mod = LoRAConv(24, (3, 3), padding=1, lora_rank=4)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    # give lora_b real weights so the adapter branch is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.random.default_rng(1).normal(size=a.shape) * 0.1, a.dtype), variables)
    qvars = quantize_tree(variables, min_size=64)
    assert "quant" in qvars and "kernel" not in qvars["params"]["base"]
    assert "bias" in qvars["params"]["base"]          # bias stays fp
    assert "kernel" in qvars["params"]["lora_a"]      # LoRA stays fp

    for scale in (0.0, 1.0):
        ref = mod.apply(variables, x, scale)
        out = mod.apply(qvars, x, scale)
        rms = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
        assert rms < 0.06, (scale, rms)
    # the LoRA branch really contributes on the int8 base
    assert np.abs(np.asarray(mod.apply(qvars, x, 1.0) - mod.apply(qvars, x, 0.0))).max() > 1e-6


def test_quantize_tree_threshold(rng):
    mod = LoRADense(8)
    x = jnp.asarray(rng.normal(size=(1, 4)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)  # 4×8 = 32 params
    qvars = quantize_tree(variables, min_size=64)
    assert "quant" not in qvars  # below threshold → untouched
    np.testing.assert_array_equal(
        np.asarray(mod.apply(qvars, x)), np.asarray(mod.apply(variables, x)))


@pytest.fixture(scope="module")
def pipelines():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)

    def build():
        return build_pipeline(
            ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(),
            jax.random.PRNGKey(0), image_size=32,
        )

    exact = build()
    quant = build().quantize(min_size=256)
    return exact, quant


def test_pipeline_quantize_structure(pipelines):
    exact, quant = pipelines
    for name in ("unet", "aggregator"):
        assert "quant" in quant.params[name]
        q_leaves = jax.tree_util.tree_leaves(quant.params[name]["quant"])
        assert any(x.dtype == jnp.int8 for x in q_leaves)
    qb, _ = quantized_bytes(quant.params["unet"])
    assert qb > 0
    # untouched collections
    assert "quant" not in quant.params["vae"]
    assert "quant" not in quant.params["image_encoder"]
    # quantize is idempotent
    before = quant.params
    assert quant.quantize(min_size=256).params is before


def test_quantized_restore_close_to_exact(pipelines, rng):
    exact, quant = pipelines
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, 32, 32, 3)), jnp.float32)
    cross = exact.unet.config.cross_attention_dim
    pooled_dim = (exact.unet.config.projection_class_embeddings_input_dim
                  - exact.unet.config.addition_time_embed_dim * 6)
    pe = jnp.asarray(rng.normal(size=(1, 7, cross)), jnp.float32)
    pp = jnp.asarray(rng.normal(size=(1, pooled_dim)), jnp.float32)
    cfg = RestoreConfig(num_inference_steps=4, guidance_scale=7.0,
                        preview_start=0.25, control_guidance_end=0.75)
    key = jax.random.PRNGKey(3)
    ref, _ = exact.restore(lq, pe, pp, cfg=cfg, key=key, output_type="latent")
    out, _ = quant.restore(lq, pe, pp, cfg=cfg, key=key, output_type="latent")
    ref, out = np.asarray(ref), np.asarray(out)
    assert np.isfinite(out).all()
    # random-weight tiny nets amplify 8-bit error through 4 steps; require
    # the trajectories to stay strongly aligned rather than bit-close
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    assert corr > 0.95, corr
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.5, rel


def test_quantized_guards(pipelines):
    _, quant = pipelines
    with pytest.raises(ValueError, match="freeze_previewer"):
        quant.freeze_previewer()
    lq = jnp.zeros((1, 32, 32, 3), jnp.float32)
    cross = quant.unet.config.cross_attention_dim
    pooled_dim = (quant.unet.config.projection_class_embeddings_input_dim
                  - quant.unet.config.addition_time_embed_dim * 6)
    pe = jnp.zeros((1, 7, cross), jnp.float32)
    pp = jnp.zeros((1, pooled_dim), jnp.float32)
    cfg = RestoreConfig(num_inference_steps=2, fuse_previewer_lora=True)
    with pytest.raises(ValueError, match="int8 base kernels"):
        quant.restore(lq, pe, pp, cfg=cfg)


def test_weight_only_restore_closer_than_w8a8(pipelines, rng):
    """``pipe.quantize(weight_only=True)`` (W8, CLI ``--quantized w8``): the
    kernels are stored int8 but the op runs in fp on the dequantized kernel —
    no activation rounding, so the restore should track the exact trajectory
    at least as closely as W8A8's. This is the batch-2 throughput mode
    (half the weight HBM at exact-quality-class — docs/perf.md round 4)."""
    from instantir_tpu.pipeline.factory import build_pipeline as _bp

    exact, quant = pipelines
    w8 = _bp(
        exact.unet.config, tiny_vae_config(),
        tiny_resampler_config(output_dim=exact.unet.config.cross_attention_dim, lora_rank=2),
        tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=32,
    ).quantize(min_size=256, weight_only=True)
    # structure: only kernel_qw entries, never kernel_q
    leaves = [k for k, _ in jax.tree_util.tree_flatten_with_path(w8.params["unet"]["quant"])[0]]
    names = {p[-1].key for p in leaves}
    assert "kernel_qw" in names and "kernel_q" not in names

    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, 32, 32, 3)), jnp.float32)
    cross = exact.unet.config.cross_attention_dim
    pooled_dim = (exact.unet.config.projection_class_embeddings_input_dim
                  - exact.unet.config.addition_time_embed_dim * 6)
    pe = jnp.asarray(rng.normal(size=(1, 7, cross)), jnp.float32)
    pp = jnp.asarray(rng.normal(size=(1, pooled_dim)), jnp.float32)
    cfg = RestoreConfig(num_inference_steps=4, guidance_scale=7.0,
                        preview_start=0.25, control_guidance_end=0.75)
    key = jax.random.PRNGKey(3)
    ref, _ = exact.restore(lq, pe, pp, cfg=cfg, key=key, output_type="latent")
    outw, _ = w8.restore(lq, pe, pp, cfg=cfg, key=key, output_type="latent")
    outa, _ = quant.restore(lq, pe, pp, cfg=cfg, key=key, output_type="latent")
    ref, outw, outa = np.asarray(ref), np.asarray(outw), np.asarray(outa)
    assert np.isfinite(outw).all()
    corr_w8 = np.corrcoef(ref.ravel(), outw.ravel())[0, 1]
    corr_a8 = np.corrcoef(ref.ravel(), outa.ravel())[0, 1]
    assert corr_w8 > 0.95, corr_w8
    assert corr_w8 >= corr_a8 - 0.01, (corr_w8, corr_a8)
