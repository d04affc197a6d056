"""VAE, Resampler, DINOv2, CLIP text, Aggregator: shapes + invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.aggregator import Aggregator
from instantir_tpu.models.clip_text import CLIPTextModel, encode_sdxl_prompt, tiny_clip_text_config
from instantir_tpu.models.dinov2 import DINOv2Model, preprocess_dinov2, tiny_dinov2_config
from instantir_tpu.models.resampler import Resampler, tiny_resampler_config
from instantir_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from instantir_tpu.models.vae import AutoencoderKL, scale_latents, tiny_vae_config, unscale_latents


def test_vae_roundtrip_shapes(rng):
    cfg = tiny_vae_config()
    model = AutoencoderKL(cfg)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    mean, logvar = model.apply(params, x, method=model.encode_moments)
    assert mean.shape == (1, 16, 16, 4) and logvar.shape == mean.shape  # /2 per downsample
    z = model.apply(params, x, rng=jax.random.PRNGKey(1), sample=True, method=model.encode)
    out = model.apply(params, z, method=model.decode)
    assert out.shape == x.shape
    # scaling roundtrip
    zs = scale_latents(cfg, z)
    np.testing.assert_allclose(np.asarray(unscale_latents(cfg, zs)), np.asarray(z), rtol=1e-5, atol=1e-6)


def test_vae_encode_mode_deterministic(rng):
    cfg = tiny_vae_config()
    model = AutoencoderKL(cfg)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    z1 = model.apply(params, x, sample=False, method=model.encode)
    z2 = model.apply(params, x, sample=False, method=model.encode)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_resampler_output_shape_and_lora(rng):
    cfg = tiny_resampler_config(lora_rank=2)
    model = Resampler(cfg)
    x = jnp.asarray(rng.normal(size=(2, 10, cfg.embedding_dim)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, cfg.num_queries, cfg.output_dim)
    # zero-init LoRA identity
    out1 = model.apply(params, x, lora_scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out1), atol=1e-6)


def test_dinov2_tokens(rng):
    cfg = tiny_dinov2_config()
    model = DINOv2Model(cfg)
    img = jnp.asarray(rng.uniform(size=(1, 28, 28, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out.shape == (1, 1 + 4, cfg.hidden_size)  # 2×2 patches + CLS
    # pos-embed interpolation path: 56² input → 4×4 grid
    img2 = jnp.asarray(rng.uniform(size=(1, 56, 56, 3)), jnp.float32)
    out2 = model.apply(params, img2)
    assert out2.shape == (1, 1 + 16, cfg.hidden_size)


def test_dinov2_preprocess():
    img = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    out = preprocess_dinov2(img)
    assert out.shape == (1, 224, 224, 3)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]), rtol=1e-5)


def test_clip_dual_encoder(rng):
    cfg1 = tiny_clip_text_config(projection_dim=None)
    cfg2 = tiny_clip_text_config()
    enc1, enc2 = CLIPTextModel(cfg1), CLIPTextModel(cfg2)
    ids = jnp.asarray(rng.integers(1, 999, size=(2, 77)), jnp.int32)
    ids = ids.at[:, -1].set(cfg2.eos_token_id)
    p1 = enc1.init(jax.random.PRNGKey(0), ids)
    p2 = enc2.init(jax.random.PRNGKey(1), ids)
    embeds, pooled = encode_sdxl_prompt(enc1, p1, enc2, p2, ids, ids)
    assert embeds.shape == (2, 77, cfg1.hidden_size + cfg2.hidden_size)
    assert pooled.shape == (2, cfg2.projection_dim)


def test_clip_causality(rng):
    # Changing a later token must not affect earlier positions.
    cfg = tiny_clip_text_config()
    enc = CLIPTextModel(cfg)
    ids = jnp.asarray(rng.integers(1, 999, size=(1, 10)), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids)
    last1, _, _ = enc.apply(params, ids)
    ids2 = ids.at[0, 7].set(3)
    last2, _, _ = enc.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(last1[0, :7]), np.asarray(last2[0, :7]), atol=1e-5)
    assert np.abs(np.asarray(last1[0, 7:]) - np.asarray(last2[0, 7:])).max() > 1e-6


@pytest.fixture(scope="module")
def aggregator_setup():
    cfg = tiny_unet_config()
    model = Aggregator(cfg, use_flash=False)
    rng = np.random.default_rng(0)
    inputs = dict(
        sample=jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32),
        timesteps=jnp.asarray([500, 10]),
        controlnet_cond=jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32),
        added_text_embeds=jnp.asarray(rng.normal(size=(2, 16)), jnp.float32),
        added_time_ids=jnp.asarray(np.tile([64, 64, 0, 0, 64, 64], (2, 1)), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **inputs)
    return model, params, inputs


def test_aggregator_residual_shapes(aggregator_setup):
    model, params, inputs = aggregator_setup
    down, mid = model.apply(params, **inputs)
    assert len(down) == 9  # 1 stem + (2+1) + (2+1) + 2
    # residuals live at the original (un-concatenated) resolution
    assert down[0].shape == (2, 16, 16, 32)
    assert down[3].shape == (2, 8, 8, 32)
    assert down[6].shape == (2, 4, 4, 64)
    assert mid.shape == (2, 4, 4, 64)


def test_aggregator_zero_init_heads(aggregator_setup):
    # zero-conv heads → residuals are exactly zero at init (ControlNet property)
    model, params, inputs = aggregator_setup
    down, mid = model.apply(params, **inputs)
    for r in list(down) + [mid]:
        assert float(jnp.abs(r).max()) == 0.0


def test_aggregator_feeds_unet(aggregator_setup):
    # plumb aggregator residuals into the UNet (the InstantIR wiring)
    model, params, inputs = aggregator_setup
    down, mid = model.apply(params, **inputs)
    ucfg = tiny_unet_config()
    unet = UNet2DConditionModel(ucfg, use_flash=False)
    rng = np.random.default_rng(1)
    uin = dict(
        sample=inputs["sample"],
        timesteps=inputs["timesteps"],
        encoder_hidden_states=jnp.asarray(rng.normal(size=(2, 7, 32)), jnp.float32),
        added_text_embeds=inputs["added_text_embeds"],
        added_time_ids=inputs["added_time_ids"],
    )
    uparams = unet.init(jax.random.PRNGKey(2), **uin)
    out = unet.apply(uparams, **uin, down_block_additional_residuals=down, mid_block_additional_residual=mid)
    assert out.shape == (2, 16, 16, 4)


def test_aggregator_global_pool_conditions(aggregator_setup):
    """global_pool_conditions spatially mean-pools every residual, keepdims
    (reference module/aggregator.py:966-971, dormant config flag :221,:267)."""
    model, params, inputs = aggregator_setup
    # zero-conv heads give all-zero residuals at init; perturb every param so
    # the pooled branch is exercised on non-trivial values (flag adds no params,
    # so the same perturbed tree drives both variants)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(7)
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.normal(size=l.shape) * 0.05, l.dtype) for l in leaves]
    )
    pooled_model = Aggregator(model.config, use_flash=False, global_pool_conditions=True)
    down, mid = model.apply(params, **inputs)
    pdown, pmid = pooled_model.apply(params, **inputs)
    for base, pooled in list(zip(down, pdown)) + [(mid, pmid)]:
        assert pooled.shape == (base.shape[0], 1, 1, base.shape[-1])
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(base.mean(axis=(1, 2), keepdims=True)), rtol=1e-5, atol=1e-6
        )


def test_bf16_vae_decode_close_to_fp32():
    """The bf16 decode fast path (RestoreConfig.decode_dtype) must stay within
    8-bit output rounding of the fp32 reference decode — bf16 keeps fp32's
    exponent so the fp16-overflow rationale for force_upcast doesn't apply."""
    import numpy as np

    from instantir_tpu.models.vae import AutoencoderKL, tiny_vae_config

    cfg = tiny_vae_config()
    vae32 = AutoencoderKL(cfg, dtype=jnp.float32)
    vae16 = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    params = vae32.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32)
    img32 = np.asarray(vae32.apply(params, z, method=vae32.decode))
    img16 = np.asarray(vae16.apply(params, z, method=vae16.decode), dtype=np.float32)
    mse = np.mean((img32 - img16) ** 2)
    span = img32.max() - img32.min()
    psnr = 10 * np.log10(span**2 / max(mse, 1e-12))
    assert psnr > 40, f"bf16 decode PSNR {psnr:.1f} dB"


def test_conditioning_embedding_matches_torch_oracle(rng):
    """Dormant ControlNet pixel-condition encoder (module/aggregator.py:113-155):
    conv/SiLU stack with /8 downsampling and a zero-init output conv."""
    torch = pytest.importorskip("torch")

    from instantir_tpu.models.aggregator import ConditioningEmbedding

    chans = (4, 6, 8)
    mod = ConditioningEmbedding(embedding_channels=5, block_out_channels=chans)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    # zero-init conv_out -> exactly zero output
    np.testing.assert_array_equal(np.asarray(mod.apply(params, x)), 0.0)
    assert mod.apply(params, x).shape == (2, 16 // 2 ** (len(chans) - 1), 4, 5)

    # randomize every leaf and compare against a torch replica
    nprng = np.random.default_rng(1)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(nprng.normal(scale=0.1, size=p.shape), p.dtype), params
    )
    p = params["params"]

    def tconv(name, h, stride=1):
        w = torch.from_numpy(np.asarray(p[name]["kernel"], np.float32)).permute(3, 2, 0, 1)
        b = torch.from_numpy(np.asarray(p[name]["bias"], np.float32))
        return torch.nn.functional.conv2d(h, w, b, stride=stride, padding=1)

    th = torch.from_numpy(np.asarray(x, np.float32)).permute(0, 3, 1, 2)
    th = torch.nn.functional.silu(tconv("conv_in", th))
    for i in range(len(chans) - 1):
        th = torch.nn.functional.silu(tconv(f"blocks_{2*i}", th))
        th = torch.nn.functional.silu(tconv(f"blocks_{2*i+1}", th, stride=2))
    th = tconv("conv_out", th).permute(0, 2, 3, 1)

    np.testing.assert_allclose(
        np.asarray(mod.apply(params, x)), th.numpy(), rtol=2e-4, atol=2e-5
    )
