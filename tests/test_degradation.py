"""Degradation pipeline: kernels, device ops, end-to-end determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.data.degradation import (
    RealESRGANDegradation,
    add_gaussian_noise,
    add_poisson_noise,
    filter2d,
    jpeg_compress,
    resize,
    usm_sharp,
)
from instantir_tpu.data.kernels import (
    bivariate_gaussian,
    circular_lowpass_kernel,
    pulse_kernel,
    sample_kernel_triple,
)


def test_kernels_normalized(rng):
    g = bivariate_gaussian(21, 1.5)
    assert g.shape == (21, 21) and abs(g.sum() - 1.0) < 1e-6
    s = circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert s.shape == (21, 21) and abs(s.sum() - 1.0) < 1e-6
    k1, k2, sk = sample_kernel_triple(rng)
    for k in (k1, k2, sk):
        assert k.shape == (21, 21) and abs(k.sum() - 1.0) < 1e-5


def test_filter2d_pulse_identity(rng):
    img = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)), jnp.float32)
    pulse = jnp.asarray(np.stack([pulse_kernel(21)] * 2))
    out = filter2d(img, pulse)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_filter2d_matches_torch(rng):
    torch = pytest.importorskip("torch")
    img = rng.uniform(size=(2, 12, 12, 3)).astype(np.float32)
    ker = np.stack([bivariate_gaussian(5, 1.0), bivariate_gaussian(5, 2.0)]).astype(np.float32)
    out = filter2d(jnp.asarray(img), jnp.asarray(ker))
    # torch oracle: reflect pad + per-sample conv
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    timg = torch.nn.functional.pad(timg, (2, 2, 2, 2), mode="reflect")
    refs = []
    for i in range(2):
        w = torch.from_numpy(ker[i])[None, None].repeat(3, 1, 1, 1)
        refs.append(torch.nn.functional.conv2d(timg[i : i + 1], w, groups=3))
    ref = torch.cat(refs).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gaussian_noise_statistics():
    key = jax.random.PRNGKey(0)
    img = jnp.full((2, 64, 64, 3), 0.5, jnp.float32)
    sigma = jnp.asarray([10.0, 20.0])
    out = add_gaussian_noise(key, img, sigma, jnp.asarray([0.0, 0.0]))
    noise = np.asarray(out) - 0.5
    np.testing.assert_allclose(noise[0].std(), 10 / 255, rtol=0.1)
    np.testing.assert_allclose(noise[1].std(), 20 / 255, rtol=0.1)
    # gray noise is channel-correlated
    out_gray = add_gaussian_noise(key, img, sigma, jnp.asarray([1.0, 1.0]))
    ng = np.asarray(out_gray) - 0.5
    np.testing.assert_allclose(ng[..., 0], ng[..., 1], atol=1e-6)


def test_poisson_noise_scales():
    key = jax.random.PRNGKey(1)
    img = jnp.full((1, 64, 64, 3), 0.5, jnp.float32)
    out_small = add_poisson_noise(key, img, jnp.asarray([0.1]), jnp.asarray([0.0]))
    out_big = add_poisson_noise(key, img, jnp.asarray([2.0]), jnp.asarray([0.0]))
    assert (np.asarray(out_big) - 0.5).std() > (np.asarray(out_small) - 0.5).std()


def test_jpeg_matches_real_codec(rng):
    # oracle: cv2's libjpeg round-trip. My DCT sim should land much closer to
    # the real codec's output than the codec's own distance from the input.
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    for q in (95, 50, 10):
        enc = cv2.imencode(".jpg", (img[..., ::-1] * 255).astype(np.uint8), [cv2.IMWRITE_JPEG_QUALITY, q])[1]
        dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1].astype(np.float32) / 255
        mine = np.asarray(jpeg_compress(jnp.asarray(img[None]), jnp.asarray([float(q)])))[0]
        mse_codec = float(np.mean((dec - img) ** 2))
        mse_cross = float(np.mean((mine - dec) ** 2))
        assert mse_cross < 0.25 * mse_codec, (q, mse_cross, mse_codec)


def test_jpeg_quality_ordering(rng):
    img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    hi = jpeg_compress(img, jnp.asarray([95.0]))
    lo = jpeg_compress(img, jnp.asarray([10.0]))
    assert float(jnp.mean((lo - img) ** 2)) > float(jnp.mean((hi - img) ** 2))


def test_jpeg_flat_image_preserved():
    img = jnp.full((1, 16, 16, 3), 0.5, jnp.float32)
    out = jpeg_compress(img, jnp.asarray([50.0]))
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=0.02)


def test_usm_sharpens_edges():
    # a step edge should get higher local contrast after USM
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[:, :, 16:] = 1.0
    img = jnp.asarray(img * 0.8 + 0.1)
    out = usm_sharp(img)
    grad_in = float(jnp.abs(jnp.diff(img[0, 16, :, 0])).max())
    grad_out = float(jnp.abs(jnp.diff(out[0, 16, :, 0])).max())
    assert grad_out >= grad_in


def test_resize_modes(rng):
    img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    for mode in ("area", "bilinear", "bicubic"):
        out = resize(img, (16, 16), mode)
        assert out.shape == (1, 16, 16, 3)


def test_end_to_end_degradation(rng):
    deg = RealESRGANDegradation(resolution=64)
    gt = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
    host = np.random.default_rng(0)
    kernels = deg.sample_kernels(host, 2)
    lq, gt_out = deg(jax.random.PRNGKey(0), gt, kernels=kernels, host_rng=np.random.default_rng(1))
    assert lq.shape == (2, 64, 64, 3) and gt_out.shape == (2, 64, 64, 3)
    assert float(lq.min()) >= -1.0 and float(lq.max()) <= 1.0
    assert float(gt_out.min()) >= -1.0 and float(gt_out.max()) <= 1.0
    # degraded differs from gt
    assert float(jnp.mean((lq - gt_out) ** 2)) > 1e-4
    # deterministic under same rngs
    lq2, _ = deg(jax.random.PRNGKey(0), gt, kernels=kernels, host_rng=np.random.default_rng(1))
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lq2), atol=1e-6)
