"""Visualization helpers (reference ``utils/vis_utils.py``): caption strips
on images for tracker logging, plus simple grid assembly."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def add_text_to_image(image: np.ndarray, text: str, strip_height: int = 24) -> np.ndarray:
    """Prepend a white caption strip with ``text`` to an [H, W, 3] u8 image."""
    from PIL import Image, ImageDraw

    h, w, _ = image.shape
    strip = np.full((strip_height, w, 3), 255, np.uint8)
    canvas = Image.fromarray(np.concatenate([strip, image], axis=0))
    draw = ImageDraw.Draw(canvas)
    draw.text((4, 4), text, fill=(0, 0, 0))
    return np.asarray(canvas)


def image_grid(images: Sequence[np.ndarray], cols: Optional[int] = None) -> np.ndarray:
    """Tile equally-sized [H, W, 3] images into a grid."""
    n = len(images)
    cols = cols or n
    rows = (n + cols - 1) // cols
    h, w, c = images[0].shape
    grid = np.zeros((rows * h, cols * w, c), images[0].dtype)
    for i, im in enumerate(images):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = im
    return grid


def triplet_strip(lq: np.ndarray, restored: np.ndarray, gt: Optional[np.ndarray] = None) -> np.ndarray:
    """lq | restored | (gt) comparison strip with captions — the layout the
    trainers log to TensorBoard (reference ``train_*:log_validation``)."""
    panels = [add_text_to_image(lq, "LQ"), add_text_to_image(restored, "restored")]
    if gt is not None:
        panels.append(add_text_to_image(gt, "GT"))
    return np.concatenate(panels, axis=1)


def calc_mean_std(feat, eps: float = 1e-5):
    """Per-sample, per-channel spatial mean/std of an NHWC feature tensor
    (reference ``infer.py:90-105`` — NCHW there; unused by the live CLI but
    part of its AdaIN color-transfer surface). Returns [B, 1, 1, C] pairs.

    Matches torch ``var(dim)`` semantics: unbiased variance, eps added to the
    variance before the sqrt.
    """
    import jax.numpy as jnp

    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    mean = flat.mean(axis=1)[:, None, None, :]
    n = h * w
    var = flat.var(axis=1) * (n / max(n - 1, 1))  # unbiased, like torch .var
    std = jnp.sqrt(var + eps)[:, None, None, :]
    return mean, std


def adaptive_instance_normalization(content_feat, style_feat):
    """AdaIN: re-statistic ``content_feat`` to ``style_feat``'s per-channel
    spatial mean/std (reference ``infer.py:107-111``). NHWC in/out."""
    style_mean, style_std = calc_mean_std(style_feat)
    content_mean, content_std = calc_mean_std(content_feat)
    return (content_feat - content_mean) / content_std * style_std + style_mean
