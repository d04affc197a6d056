"""Face alignment utilities (reference ``utils/utils.py`` +
``utils/matlab_cp2tform.py``): similarity transform from detected 5-point
landmarks to the canonical 112×112 ArcFace template, and a differentiable
warp-crop in JAX.

Landmark *detection* (MTCNN in the reference) requires pretrained weights not
available offline — detection is injected as a callable; everything from
landmarks onward is implemented here. The cp2tform least-squares similarity
solve is the standard closed-form (Umeyama without scaling constraints),
matching the reference's ``get_similarity_transform_for_cv2``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# canonical 5-point template, relative coordinates (reference utils/utils.py:9)
REFERENCE_FACIAL_POINTS_RELATIVE = np.array(
    [
        [38.29459953, 51.69630051],
        [73.53179932, 51.50139999],
        [56.02519989, 71.73660278],
        [41.54930115, 92.3655014],
        [70.72990036, 92.20410156],
    ]
) / 112.0


def similarity_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity (rotation+scale+translation) mapping
    src[N,2] → dst[N,2]; returns a 2×3 affine matrix (cp2tform semantics)."""
    n = src.shape[0]
    # solve for [a, b, tx, ty] with x' = a·x − b·y + tx ; y' = b·x + a·y + ty
    A = np.zeros((2 * n, 4))
    b = np.zeros(2 * n)
    A[0::2, 0] = src[:, 0]
    A[0::2, 1] = -src[:, 1]
    A[0::2, 2] = 1
    A[1::2, 0] = src[:, 1]
    A[1::2, 1] = src[:, 0]
    A[1::2, 3] = 1
    b[0::2] = dst[:, 0]
    b[1::2] = dst[:, 1]
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    a, bb, tx, ty = sol
    return np.array([[a, -bb, tx], [bb, a, ty]])


def warp_affine(image: jnp.ndarray, matrix: jnp.ndarray, out_size: Tuple[int, int]) -> jnp.ndarray:
    """Differentiable inverse-warp with bilinear sampling.

    image: [H, W, C]; matrix: 2×3 mapping input→output coords; the sampler
    uses the inverse mapping (output grid → input coords).
    """
    oh, ow = out_size
    m = jnp.concatenate([matrix, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    minv = jnp.linalg.inv(m)[:2]

    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32), jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # [oh, ow, 3]
    src = coords @ minv.T  # [oh, ow, 2] (x, y)
    sx, sy = src[..., 0], src[..., 1]

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
    # zero out samples that fell outside the source image
    valid = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))[..., None]
    return out * valid


def extract_faces_and_landmarks(
    images: jnp.ndarray,
    landmarks: np.ndarray,
    output_size: int = 112,
) -> jnp.ndarray:
    """Crop-align faces to the ArcFace template (differentiable w.r.t. pixels).

    images: [B, H, W, C] in any float range; landmarks: [B, 5, 2] in pixels.
    """
    b, h, w, c = images.shape
    template = REFERENCE_FACIAL_POINTS_RELATIVE * output_size
    out = []
    for i in range(b):
        m = jnp.asarray(similarity_transform(np.asarray(landmarks[i], np.float64), template), jnp.float32)
        out.append(warp_affine(images[i], m, (output_size, output_size)))
    return jnp.stack(out)
