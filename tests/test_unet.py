"""Tiny-config UNet: shapes, LoRA functional toggling, IP branch, residuals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.unet import UNet2DConditionModel, tiny_unet_config


def _inputs(rng, b=2, size=16, cross_dim=32, pooled=16, seq=7, ip_tokens=4):
    return dict(
        sample=jnp.asarray(rng.normal(size=(b, size, size, 4)), jnp.float32),
        timesteps=jnp.asarray([10, 900]),
        encoder_hidden_states=jnp.asarray(rng.normal(size=(b, seq, cross_dim)), jnp.float32),
        added_text_embeds=jnp.asarray(rng.normal(size=(b, pooled)), jnp.float32),
        added_time_ids=jnp.asarray(np.tile([64, 64, 0, 0, 64, 64], (b, 1)), jnp.float32),
        ip_hidden_states=jnp.asarray(rng.normal(size=(b, ip_tokens, cross_dim)), jnp.float32),
    )


@pytest.fixture(scope="module")
def unet_and_params():
    cfg = tiny_unet_config(with_ip=True, lora_rank=4)
    model = UNet2DConditionModel(cfg, use_flash=False)
    rng = np.random.default_rng(0)
    inputs = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    return model, params, inputs


def test_forward_shape_and_finite(unet_and_params):
    model, params, inputs = unet_and_params
    out = model.apply(params, **inputs)
    assert out.shape == inputs["sample"].shape
    assert np.isfinite(np.asarray(out)).all()


def test_lora_zero_init_is_identity(unet_and_params):
    # lora_b is zero-init, so even lora_scale=1 must match scale=0 at init.
    model, params, inputs = unet_and_params
    out0 = model.apply(params, **inputs, lora_scale=0.0)
    out1 = model.apply(params, **inputs, lora_scale=1.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


def test_lora_scale_changes_output_when_nonzero(unet_and_params):
    model, params, inputs = unet_and_params
    # Perturb every lora_b kernel away from zero.
    def bump(path, x):
        if any("lora_b" in str(p) for p in path):
            return x + 0.05
        return x

    params2 = jax.tree_util.tree_map_with_path(bump, params)
    out0 = model.apply(params2, **inputs, lora_scale=0.0)
    out1 = model.apply(params2, **inputs, lora_scale=1.0)
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-4
    # and scale=0 with bumped lora must equal the original no-lora output
    out_ref = model.apply(unet_and_params[1], **inputs, lora_scale=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_ref), atol=1e-6)


def test_ip_tokens_affect_output(unet_and_params):
    model, params, inputs = unet_and_params
    out0 = model.apply(params, **inputs)
    inputs2 = dict(inputs)
    inputs2["ip_hidden_states"] = inputs["ip_hidden_states"] + 1.0
    out1 = model.apply(params, **inputs2)
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-5


def test_ip_scale_zero_disables_branch(unet_and_params):
    model, params, inputs = unet_and_params
    inputs2 = dict(inputs)
    inputs2["ip_hidden_states"] = inputs["ip_hidden_states"] + 5.0
    out_a = model.apply(params, **inputs, ip_scale=0.0)
    out_b = model.apply(params, **inputs2, ip_scale=0.0)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_residual_injection(unet_and_params):
    model, params, inputs = unet_and_params
    # 3 blocks × (2 layers + downsample except final) → 1 + 3 + 3 + 2 = 9 skips
    cfg = model.config
    shapes = [(2, 16, 16, 32), (2, 16, 16, 32), (2, 16, 16, 32), (2, 8, 8, 32)]
    shapes += [(2, 8, 8, 64), (2, 8, 8, 64), (2, 4, 4, 64)]
    shapes += [(2, 4, 4, 64), (2, 4, 4, 64)]
    residuals = tuple(jnp.ones(s, jnp.float32) * 0.1 for s in shapes)
    mid = jnp.ones((2, 4, 4, 64), jnp.float32) * 0.1
    out0 = model.apply(params, **inputs)
    out1 = model.apply(
        params, **inputs, down_block_additional_residuals=residuals, mid_block_additional_residual=mid
    )
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-5
    # zero residuals are a no-op
    zeros = tuple(jnp.zeros(s, jnp.float32) for s in shapes)
    out2 = model.apply(
        params,
        **inputs,
        down_block_additional_residuals=zeros,
        mid_block_additional_residual=jnp.zeros_like(mid),
    )
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out2), atol=1e-6)


def test_bf16_forward(unet_and_params):
    _, params, inputs = unet_and_params
    cfg = tiny_unet_config(with_ip=True, lora_rank=4)
    model_bf16 = UNet2DConditionModel(cfg, use_flash=False, dtype=jnp.bfloat16)
    out = model_bf16.apply(params, **inputs)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def _residuals(scale=0.1):
    shapes = [(2, 16, 16, 32), (2, 16, 16, 32), (2, 16, 16, 32), (2, 8, 8, 32)]
    shapes += [(2, 8, 8, 64), (2, 8, 8, 64), (2, 4, 4, 64)]
    shapes += [(2, 4, 4, 64), (2, 4, 4, 64)]
    return tuple(jnp.full(s, scale, jnp.float32) for s in shapes)


@pytest.mark.parametrize("depth", [1, 2])
def test_deepcache_split_is_exact_same_step(unet_and_params, depth):
    """shallow(x, cached_deep=deep(x)) must equal full(x) bit-for-bit — the
    DeepCache split (arXiv 2312.03209) only approximates when the trunk is
    reused across timesteps."""
    model, params, inputs = unet_and_params
    full, deep = model.apply(params, **inputs, return_deep=True, cache_depth=depth)
    shallow = model.apply(params, **inputs, cached_deep=deep, cache_depth=depth)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(shallow))


@pytest.mark.parametrize("depth", [1, 2])
def test_deepcache_split_exact_with_residuals(unet_and_params, depth):
    """Same exactness with controlnet residuals: shallow gets the first
    3·depth entries (the shallow skip slice)."""
    model, params, inputs = unet_and_params
    res = _residuals()
    mid = jnp.full((2, 4, 4, 64), 0.1, jnp.float32)
    full, deep = model.apply(
        params, **inputs, down_block_additional_residuals=res,
        mid_block_additional_residual=mid, return_deep=True, cache_depth=depth,
    )
    shallow = model.apply(
        params, **inputs, down_block_additional_residuals=res[: 3 * depth],
        cached_deep=deep, cache_depth=depth,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(shallow))


def test_deepcache_shallow_rejects_wrong_residual_count(unet_and_params):
    model, params, inputs = unet_and_params
    _, deep = model.apply(params, **inputs, return_deep=True, cache_depth=1)
    with pytest.raises(ValueError, match="shallow mode expects"):
        model.apply(
            params, **inputs, down_block_additional_residuals=_residuals(),
            cached_deep=deep, cache_depth=1,
        )


def test_deepcache_cache_depth_bounds(unet_and_params):
    model, params, inputs = unet_and_params
    with pytest.raises(ValueError, match="cache_depth"):
        model.apply(params, **inputs, return_deep=True, cache_depth=3)


def test_param_count_tiny(unet_and_params):
    _, params, _ = unet_and_params
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert n > 1e5  # sanity: a real model, not a stub
