"""CLIP-loss image augmentations in JAX (reference ``losses/losses.py:296-333``).

The reference's ``ImageAugmentations`` tiles the resized batch
``augmentations_number`` times, keeps the first tile un-augmented, and pushes
the rest through kornia ``RandomAffine(degrees=15, translate=0.1, p=0.7,
padding_mode="border")`` + ``RandomPerspective(0.7, p=0.7)``. Here the warps
are explicit homographies sampled with JAX PRNG keys and applied by a
batched, differentiable bilinear sampler — fully jit-compatible (the
resize uses bilinear interpolation where torch uses adaptive average
pooling; for the downscales involved the two are interchangeable smoothers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(image: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray, border: bool) -> jnp.ndarray:
    """image [H, W, C]; sx/sy [oh, ow] source coords → [oh, ow, C]."""
    h, w, _ = image.shape
    x0 = jnp.clip(jnp.floor(sx), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(sx - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(sy - y0, 0.0, 1.0)[..., None]

    def gather(yy, xx):
        return image[yy.astype(jnp.int32), xx.astype(jnp.int32)]

    out = (
        gather(y0, x0) * (1 - wy) * (1 - wx)
        + gather(y0, x1) * (1 - wy) * wx
        + gather(y1, x0) * wy * (1 - wx)
        + gather(y1, x1) * wy * wx
    )
    if border:
        return out  # clamped coords == border padding
    valid = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))[..., None]
    return out * valid


def projective_warp(image: jnp.ndarray, hom: jnp.ndarray, border: bool = False) -> jnp.ndarray:
    """Inverse-warp one [H, W, C] image by a 3×3 output→input homography."""
    h, w, _ = image.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    src = coords @ hom.T
    sx = src[..., 0] / src[..., 2]
    sy = src[..., 1] / src[..., 2]
    return _bilinear_sample(image, sx, sy, border)


def _affine_homography(key, h: int, w: int, degrees: float, translate: float) -> jnp.ndarray:
    """kornia RandomAffine: rotation about the center + translation. Returns
    the inverse (output→input) map for the sampler."""
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees) * jnp.pi / 180.0
    tx = jax.random.uniform(k2, (), minval=-translate, maxval=translate) * w
    ty = jax.random.uniform(k3, (), minval=-translate, maxval=translate) * h
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    c, s = jnp.cos(-ang), jnp.sin(-ang)  # inverse rotation
    # inverse map: translate back by (tx,ty), rotate by -ang about center
    m = jnp.asarray(
        [
            [c, -s, cx - c * (cx + tx) + s * (cy + ty)],
            [s, c, cy - s * (cx + tx) - c * (cy + ty)],
            [0.0, 0.0, 1.0],
        ]
    )
    return m


def _four_point_homography(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Solve H (3×3, h33=1) with H·src_i ∝ dst_i for 4 point pairs."""
    rows = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0.0 * x, 0.0 * x, 0.0 * x, -u * x, -u * y]))
        rows.append(jnp.stack([0.0 * x, 0.0 * x, 0.0 * x, x, y, 1.0, -v * x, -v * y]))
    a = jnp.stack(rows)
    b = dst.reshape(-1)
    sol = jnp.linalg.solve(a, b)
    return jnp.concatenate([sol, jnp.ones((1,))]).reshape(3, 3)


def _perspective_homography(key, h: int, w: int, distortion: float) -> jnp.ndarray:
    """kornia RandomPerspective: corners displaced inward by U[0, d/2]·size.
    Returns the inverse (output→input) map."""
    corners = jnp.asarray([[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]])
    signs = jnp.asarray([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])  # inward
    offs = jax.random.uniform(key, (4, 2)) * distortion / 2.0 * jnp.asarray([w, h])
    dst = corners + signs * offs
    # sampler needs output→input: map displaced (output) corners back to the originals
    return _four_point_homography(dst, corners)


def image_augmentations(
    key: jax.Array,
    images: jnp.ndarray,
    output_size: int,
    augmentations_number: int,
    p: float = 0.7,
    degrees: float = 15.0,
    translate: float = 0.1,
    distortion: float = 0.7,
) -> jnp.ndarray:
    """[B, H, W, C] → [B·N, S, S, C]: first B resized un-augmented, the rest
    affine+perspective augmented (each warp applied with probability ``p``)."""
    b, h, w, c = images.shape
    resized = jax.image.resize(images, (b, output_size, output_size, c), method="bilinear")
    n_aug = (augmentations_number - 1) * b
    if n_aug <= 0:
        return resized

    tiled = jnp.tile(resized, (augmentations_number - 1, 1, 1, 1))
    keys = jax.random.split(key, n_aug)

    def one(img, k):
        ka, kap, kp, kpp = jax.random.split(k, 4)
        m_aff = _affine_homography(ka, output_size, output_size, degrees, translate)
        use_aff = jax.random.uniform(kap, ()) < p
        m_aff = jnp.where(use_aff, m_aff, jnp.eye(3))
        out = projective_warp(img, m_aff, border=True)
        m_per = _perspective_homography(kp, output_size, output_size, distortion)
        use_per = jax.random.uniform(kpp, ()) < p
        m_per = jnp.where(use_per, m_per, jnp.eye(3))
        return projective_warp(out, m_per, border=False)

    augmented = jax.vmap(one)(tiled, keys)
    return jnp.concatenate([resized, augmented], axis=0)
