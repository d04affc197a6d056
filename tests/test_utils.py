"""Vis/face/profiling utilities."""

import jax.numpy as jnp
import numpy as np

from instantir_tpu.utils.face import (
    REFERENCE_FACIAL_POINTS_RELATIVE,
    extract_faces_and_landmarks,
    similarity_transform,
    warp_affine,
)
from instantir_tpu.utils.profiling import PhaseTimer
from instantir_tpu.utils.vis import add_text_to_image, image_grid, triplet_strip


def test_add_text_and_grid():
    img = np.zeros((32, 48, 3), np.uint8)
    out = add_text_to_image(img, "hello")
    assert out.shape == (32 + 24, 48, 3)
    grid = image_grid([img, img, img], cols=2)
    assert grid.shape == (64, 96, 3)
    strip = triplet_strip(img, img, img)
    assert strip.shape == (56, 144, 3)


def test_similarity_transform_identity():
    pts = np.array([[0.0, 0.0], [1, 0], [0, 1], [1, 1], [0.5, 0.5]])
    m = similarity_transform(pts, pts)
    np.testing.assert_allclose(m, [[1, 0, 0], [0, 1, 0]], atol=1e-8)


def test_similarity_transform_rotation_scale():
    pts = np.array([[0.0, 0.0], [1, 0], [0, 1], [1, 1], [0.5, 0.5]])
    theta, s, t = np.pi / 6, 2.0, np.array([3.0, -1.0])
    R = s * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = pts @ R.T + t
    m = similarity_transform(pts, dst)
    got = pts @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-8)


def test_warp_affine_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(16, 16, 3)), jnp.float32)
    out = warp_affine(img, jnp.asarray([[1.0, 0, 0], [0, 1, 0]]), (16, 16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_extract_faces_shapes():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    # landmarks roughly where the template expects them, scaled to 64px
    lms = np.stack([REFERENCE_FACIAL_POINTS_RELATIVE * 64] * 2)
    out = extract_faces_and_landmarks(imgs, lms)
    assert out.shape == (2, 112, 112, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert "a" in s and s["a"] >= 0


def test_adain_matches_torch_oracle(rng):
    """NHWC AdaIN vs the reference's torch math (infer.py:90-111)."""
    import pytest
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from instantir_tpu.utils.vis import adaptive_instance_normalization

    content = rng.normal(size=(2, 6, 5, 3)).astype(np.float32)
    style = rng.normal(loc=1.0, scale=2.0, size=(2, 6, 5, 3)).astype(np.float32)
    got = np.asarray(adaptive_instance_normalization(jnp.asarray(content), jnp.asarray(style)))

    def t_stats(feat, eps=1e-5):
        b, c = feat.shape[:2]
        var = feat.view(b, c, -1).var(dim=2) + eps
        return feat.view(b, c, -1).mean(dim=2).view(b, c, 1, 1), var.sqrt().view(b, c, 1, 1)

    tc = torch.from_numpy(content.transpose(0, 3, 1, 2))
    ts = torch.from_numpy(style.transpose(0, 3, 1, 2))
    sm, ss = t_stats(ts)
    cm, cs = t_stats(tc)
    want = ((tc - cm) / cs * ss + sm).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
