"""Traced (single-program) degradation chain: semantics + parity with eager.

The eager ``RealESRGANDegradation.__call__`` makes ~10² individually
dispatched device calls with fresh host randomness per step — fine locally,
a structural loss through a remote-relay TPU. ``traced_call`` folds every
random choice into one jitted program. These tests pin:

  * resize-on-canvas semantics (``_resize_valid`` == ``resize`` when the
    valid window fills the canvas, for every method branch);
  * shape/range/determinism of the full traced chain;
  * the no-degradation and NaN-guard branches;
  * aggregate LQ statistics vs the eager chain on identical inputs/kernels
    (the per-seed draws differ by construction; the distributions must not).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.data.degradation import (
    RealESRGANDegradation,
    _reflect_fill,
    _resize_valid,
    resize,
)
from instantir_tpu.train import common


def _toy_images(rng, b, size):
    """Smooth-ish random images in [0,1] (pure noise defeats JPEG/PSNR stats)."""
    base = rng.uniform(size=(b, size // 4, size // 4, 3)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (b, size, size, 3), method="cubic")
    return jnp.clip(img, 0.0, 1.0)


@pytest.mark.parametrize("method_idx,mode", [(0, "area"), (1, "bilinear"), (2, "bicubic")])
def test_resize_valid_matches_resize_full_canvas(rng, method_idx, mode):
    img = jnp.asarray(rng.uniform(size=(2, 32, 48, 3)), jnp.float32)
    out = _resize_valid(
        img,
        jnp.asarray([32, 48], jnp.int32),
        (16, 24),
        jnp.asarray([16, 24], jnp.int32),
        jnp.asarray(method_idx),
    )
    ref = resize(img, (16, 24), mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_resize_valid_partial_window_matches_cropped_resize(rng):
    """Resizing the [0,0]-anchored valid window on a larger canvas must agree
    (away from the boundary) with statically resizing the cropped window."""
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    crop = jnp.asarray(rng.uniform(size=(1, 40, 56, 3)), jnp.float32)
    img = img.at[:, :40, :56].set(crop)
    img = _reflect_fill(img, jnp.asarray(40), jnp.asarray(56))  # image-like garbage
    out = _resize_valid(
        img, jnp.asarray([40, 56], jnp.int32), (64, 64), jnp.asarray([20, 28], jnp.int32),
        jnp.asarray(1),
    )
    ref = resize(crop, (20, 28), "bilinear")
    # interior pixels see no canvas boundary effects at all
    np.testing.assert_allclose(np.asarray(out[:, :19, :27]), np.asarray(ref[:, :19, :27]), atol=1e-4)


def test_reflect_fill_indexing():
    img = jnp.arange(6, dtype=jnp.float32).reshape(1, 6, 1, 1) * jnp.ones((1, 6, 6, 1))
    out = _reflect_fill(img, jnp.asarray(4), jnp.asarray(6))
    # rows beyond the 4-row valid window reflect: 0 1 2 3 | 2 1
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0]), [0, 1, 2, 3, 2, 1])


def test_traced_chain_shapes_determinism(rng):
    deg = RealESRGANDegradation(resolution=64)
    imgs = _toy_images(rng, 2, 64)
    kernels = deg.sample_kernels(rng, 2)
    fn = deg.jitted()
    lq, gt = fn(jax.random.PRNGKey(0), imgs, kernels)
    assert lq.shape == (2, 64, 64, 3) and gt.shape == (2, 64, 64, 3)
    for x in (lq, gt):
        x = np.asarray(x)
        assert np.isfinite(x).all() and x.min() >= -1.0 and x.max() <= 1.0
    lq2, gt2 = fn(jax.random.PRNGKey(0), imgs, kernels)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(lq2))
    lq3, _ = fn(jax.random.PRNGKey(1), imgs, kernels)
    assert not np.array_equal(np.asarray(lq), np.asarray(lq3))


def test_traced_no_degradation_branch(rng):
    deg = RealESRGANDegradation(resolution=64)
    deg.degrade_opt["no_degradation_prob"] = 1.0
    imgs = _toy_images(rng, 1, 64)
    kernels = deg.sample_kernels(rng, 1)
    lq, gt = deg.traced_call(jax.random.PRNGKey(3), imgs, kernels)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(gt))


def test_traced_rejects_unaligned_shapes(rng):
    deg = RealESRGANDegradation(resolution=64)
    imgs = _toy_images(rng, 1, 64)[:, :48, :48]
    with pytest.raises(ValueError, match="multiples"):
        deg.traced_call(jax.random.PRNGKey(0), imgs, deg.sample_kernels(rng, 1))


def test_run_degradation_dispatch(rng):
    """common.run_degradation: traced path for aligned shapes, eager fallback
    for the tiny unaligned geometries the unit tests use."""
    deg = RealESRGANDegradation(resolution=64)
    imgs = _toy_images(rng, 1, 64)
    kernels = deg.sample_kernels(rng, 1)
    lq_t, _ = common.run_degradation(
        deg, jax.random.PRNGKey(5), imgs, kernels, jit_mode=True, host_rng=rng)
    ref_t, _ = deg.traced_call(jax.random.PRNGKey(5), imgs, kernels)
    np.testing.assert_array_equal(np.asarray(lq_t), np.asarray(ref_t))

    deg32 = RealESRGANDegradation(resolution=32, degrade_opt=dict(deg.degrade_opt, gt_size=32))
    imgs32 = _toy_images(rng, 1, 32)  # 32 % 64 != 0 → eager fallback
    kernels32 = deg32.sample_kernels(rng, 1)
    lq_e, gt_e = common.run_degradation(
        deg32, jax.random.PRNGKey(5), imgs32, kernels32,
        jit_mode=True, host_rng=np.random.default_rng(9))
    ref_e, _ = deg32(jax.random.PRNGKey(5), imgs32, kernels=kernels32,
                     host_rng=np.random.default_rng(9))
    np.testing.assert_array_equal(np.asarray(lq_e), np.asarray(ref_e))


def test_traced_vs_eager_distribution(rng):
    """Aggregate LQ statistics of the traced chain match the eager chain.

    Per-seed outputs differ by construction (host vs key randomness, exact vs
    snapped intermediate sizes); over N draws on the same inputs/kernels the
    LQ mean/std and PSNR-to-GT distributions must agree. Bounds are loose —
    this is a drift alarm, not bit parity (that's tools/degradation_delta.py
    against the torch chain)."""
    deg = RealESRGANDegradation(resolution=64)
    imgs = _toy_images(rng, 2, 64)
    kernels = deg.sample_kernels(rng, 2)
    n = 12

    def psnr(lq, gt):
        mse = np.mean((np.asarray(lq) - np.asarray(gt)) ** 2, axis=(1, 2, 3))
        return 10 * np.log10(4.0 / np.maximum(mse, 1e-12))

    fn = deg.jitted()
    stats = {"traced": [], "eager": []}
    for i in range(n):
        lq, gt = fn(jax.random.PRNGKey(100 + i), imgs, kernels)
        stats["traced"].append((float(jnp.mean(lq)), float(jnp.std(lq)), psnr(lq, gt).mean()))
        lq, gt = deg(jax.random.PRNGKey(100 + i), imgs, kernels=kernels,
                     host_rng=np.random.default_rng(200 + i))
        stats["eager"].append((float(jnp.mean(lq)), float(jnp.std(lq)), psnr(lq, gt).mean()))

    t = np.asarray(stats["traced"]).mean(axis=0)
    e = np.asarray(stats["eager"]).mean(axis=0)
    assert abs(t[0] - e[0]) < 0.08, (t, e)       # LQ mean
    assert abs(t[1] - e[1]) < 0.08, (t, e)       # LQ std
    assert abs(t[2] - e[2]) < 4.0, (t, e)        # mean PSNR(lq, gt) in dB
