"""RealESRGAN-style two-stage degradation pipeline in JAX (device-side).

From-scratch rebuild of ``utils/degradation_pipeline.py:174-352`` plus the
basicsr device ops it imports (``filter2D``, ``DiffJPEG``, ``USMSharp``,
Gaussian/Poisson noise): USM sharpen → blur(k1) → random resize →
Gaussian|Poisson noise → JPEG → (p=0.8) blur(k2) → resize to gt/sf·scale →
noise → {JPEG, sinc} order-shuffled → clamp → paired crop → bicubic resize
back → 1% no-degradation → [-1,1].

TPU-native structure: per-batch random *choices* (scales, modes, noise type,
JPEG qualities) are sampled host-side per call — exactly like the reference's
``random.*`` calls — and the chosen intermediate sizes are snapped to a small
set of static buckets so XLA shape-specializes a bounded number of programs.
All pixel math runs on device in fp32 with explicit PRNG keys. Layout NHWC.

Known deviations from basicsr (documented, quality-neutral):
  * 'area' resize is antialiased linear resize (jax.image has no adaptive
    average pooling; for the downscales used here the two agree closely);
  * Poisson noise uses a fixed 256-level quantization instead of basicsr's
    per-image unique-color count.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.data.kernels import KERNEL_OPT, sample_kernel_triple

DEGRADE_OPT = {
    "resize_prob": [0.2, 0.7, 0.1],
    "resize_range": [0.15, 1.5],
    "gaussian_noise_prob": 0.5,
    "noise_range": [1, 30],
    "poisson_scale_range": [0.05, 3],
    "gray_noise_prob": 0.4,
    "jpeg_range": [30, 95],
    "second_blur_prob": 0.8,
    "resize_prob2": [0.3, 0.4, 0.3],
    "resize_range2": [0.3, 1.2],
    "gaussian_noise_prob2": 0.5,
    "noise_range2": [1, 25],
    "poisson_scale_range2": [0.05, 2.5],
    "gray_noise_prob2": 0.4,
    "jpeg_range2": [30, 95],
    "gt_size": 512,
    "no_degradation_prob": 0.01,
    "use_usm": True,
    "sf": 4,
    "resize_lq": True,
}


# ---------------------------------------------------------------------------
# device ops
# ---------------------------------------------------------------------------


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-sample 2D filtering with reflect padding (basicsr ``filter2D``).

    img: [B, H, W, C]; kernel: [B, k, k] (same kernel across channels).
    """
    b, h, w, c = img.shape
    k = kernel.shape[-1]
    pad = k // 2
    img_p = jnp.pad(img, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")

    def one(im, ker):
        # im: [H+2p, W+2p, C]; ker: [k, k] → depthwise conv
        lhs = im.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
        rhs = ker[None, None]  # [1, 1, k, k]
        out = jax.lax.conv_general_dilated(lhs, rhs, (1, 1), "VALID")
        return out[:, 0].transpose(1, 2, 0)

    return jax.vmap(one)(img_p, kernel)


def gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    ax = np.arange(size) - size // 2
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def usm_sharp(img: jnp.ndarray, weight: float = 0.5, radius: int = 50, threshold: int = 10) -> jnp.ndarray:
    """Unsharp masking with a soft edge mask (basicsr ``USMSharp``)."""
    size = radius * 2 + 1
    sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8  # cv2.getGaussianKernel(sigma=0)
    k1 = jnp.asarray(gaussian_kernel_1d(size, sigma))
    pad = size // 2

    def blur(x):
        xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
        xp = jax.lax.conv_general_dilated(
            xp.transpose(0, 3, 1, 2).reshape(-1, 1, *xp.shape[1:3]),
            k1[None, None, :, None],
            (1, 1),
            "VALID",
        )
        xp = jax.lax.conv_general_dilated(xp, k1[None, None, None, :], (1, 1), "VALID")
        return xp.reshape(x.shape[0], x.shape[3], x.shape[1], x.shape[2]).transpose(0, 2, 3, 1)

    residual = img - blur(img)
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = blur(mask)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img


def resize(img: jnp.ndarray, size: Tuple[int, int], mode: str) -> jnp.ndarray:
    """area | bilinear | bicubic resize, NHWC."""
    b, h, w, c = img.shape
    shape = (b, size[0], size[1], c)
    if mode == "area":
        return jax.image.resize(img, shape, method="linear", antialias=True)
    if mode == "bilinear":
        return jax.image.resize(img, shape, method="linear", antialias=False)
    if mode == "bicubic":
        return jax.image.resize(img, shape, method="cubic", antialias=False)
    raise ValueError(mode)


def add_gaussian_noise(
    key: jax.Array, img: jnp.ndarray, sigma: jnp.ndarray, gray_mask: jnp.ndarray
) -> jnp.ndarray:
    """sigma: [B] in 0-255 scale; gray_mask: [B] {0,1} — gray noise is shared
    across channels (basicsr ``random_add_gaussian_noise_pt``)."""
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, img.shape) * sigma.reshape(-1, 1, 1, 1) / 255.0
    gray = jax.random.normal(k2, (b, h, w, 1)) * sigma.reshape(-1, 1, 1, 1) / 255.0
    noise = jnp.where(gray_mask.reshape(-1, 1, 1, 1) > 0, jnp.broadcast_to(gray, img.shape), noise)
    return jnp.clip(img + noise, 0.0, 1.0)


def add_poisson_noise(
    key: jax.Array, img: jnp.ndarray, scale: jnp.ndarray, gray_mask: jnp.ndarray, vals: float = 256.0
) -> jnp.ndarray:
    """Per-sample scaled Poisson (shot) noise; scale: [B], gray_mask: [B]."""
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(key)
    gray_img = jnp.mean(img, axis=-1, keepdims=True)

    def shot(k, x):
        lam = jnp.clip(x, 0.0, 1.0) * vals
        return (jax.random.poisson(k, lam).astype(jnp.float32) / vals) - x

    noise = shot(k1, img)
    gray = jnp.broadcast_to(shot(k2, gray_img), img.shape)
    noise = jnp.where(gray_mask.reshape(-1, 1, 1, 1) > 0, gray, noise)
    return jnp.clip(img + noise * scale.reshape(-1, 1, 1, 1), 0.0, 1.0)


# --------------------------- DiffJPEG (DCT-based) ---------------------------

_Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
_C_TABLE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8), np.float32)
    for k in range(8):
        for n in range(8):
            m[k, n] = np.cos((2 * n + 1) * k * np.pi / 16) * (np.sqrt(0.125) if k == 0 else 0.5)
    return m


_DCT = _dct_matrix()


def _quality_factor(quality: jnp.ndarray) -> jnp.ndarray:
    """JPEG quality (1-100) → quantization scale factor."""
    return jnp.where(quality < 50, 5000.0 / jnp.maximum(quality, 1.0), 200.0 - quality * 2.0) / 100.0


def _blockify(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4)  # [B, hb, wb, 8, 8]


def _unblockify(x: jnp.ndarray) -> jnp.ndarray:
    b, hb, wb, _, _ = x.shape
    return x.transpose(0, 1, 3, 2, 4).reshape(b, hb * 8, wb * 8)


def _channel_jpeg(x: jnp.ndarray, table: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W] in 0..255 centered later; factor: [B]."""
    dct = jnp.asarray(_DCT)
    blocks = _blockify(x - 128.0)
    coefs = jnp.einsum("ij,bhwjk,lk->bhwil", dct, blocks, dct)
    q = table[None, None, None] * factor.reshape(-1, 1, 1, 1, 1)
    q = jnp.clip(jnp.round(q), 1.0, 255.0)
    coefs = jnp.round(coefs / q) * q
    blocks = jnp.einsum("ji,bhwjk,kl->bhwil", dct, coefs, dct)
    return _unblockify(blocks) + 128.0


def jpeg_compress(img: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """DCT-domain JPEG round-trip with 4:2:0 chroma subsampling.

    img: [B, H, W, 3] in [0,1] (H, W multiples of 16); quality: [B].
    """
    x = img * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    factor = _quality_factor(quality)
    bsz, h, w = y.shape
    # 2×2 average chroma subsample
    cb_s = cb.reshape(bsz, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr_s = cr.reshape(bsz, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    y = _channel_jpeg(y, jnp.asarray(_Y_TABLE), factor)
    cb_s = _channel_jpeg(cb_s, jnp.asarray(_C_TABLE), factor)
    cr_s = _channel_jpeg(cr_s, jnp.asarray(_C_TABLE), factor)

    cb = jnp.repeat(jnp.repeat(cb_s, 2, axis=1), 2, axis=2)
    cr = jnp.repeat(jnp.repeat(cr_s, 2, axis=1), 2, axis=2)

    cb -= 128.0
    cr -= 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b2 = y + 1.772 * cb
    out = jnp.stack([r, g, b2], axis=-1) / 255.0
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------


def _snap(v: int, multiple: int = 16) -> int:
    """Bucket a size to a multiple of 16 (JPEG blocks + bounded XLA shapes)."""
    return max(multiple, int(round(v / multiple)) * multiple)


def _snap_up(v: int, multiple: int = 16) -> int:
    return max(multiple, int(-(-v // multiple)) * multiple)


# ---------------------------------------------------------------------------
# traced (single-program) variant
# ---------------------------------------------------------------------------


def _reflect_fill(img: jnp.ndarray, vh: jnp.ndarray, vw: jnp.ndarray) -> jnp.ndarray:
    """Fill the canvas region beyond the [0,0]-anchored valid (vh, vw) window
    with the valid region's reflection (np.pad 'reflect' indexing, clamped
    once past a full period) — keeps downstream filters/JPEG/noise seeing
    image-like content instead of resize garbage."""
    h, w = img.shape[1], img.shape[2]
    row = jnp.clip(vh - 1 - jnp.abs(vh - 1 - jnp.arange(h)), 0, vh - 1)
    col = jnp.clip(vw - 1 - jnp.abs(vw - 1 - jnp.arange(w)), 0, vw - 1)
    return img[:, row][:, :, col]


def _resize_valid(
    img: jnp.ndarray,
    in_valid: jnp.ndarray,
    canvas: Tuple[int, int],
    out_valid: jnp.ndarray,
    method_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Resize the [0,0]-anchored valid region of ``img`` (traced [2] sizes)
    onto a static ``canvas``, valid size becoming ``out_valid`` (traced [2]).

    ``jax.image.scale_and_translate`` with translation 0 samples output pixel
    centers at (j+0.5)/scale — identical to ``jax.image.resize`` over the
    valid window — and supports *traced* scales (it builds dense [in,out]
    weight matrices, a trivial matmul at these sizes). method_idx selects the
    reference's random mode: 0='area' (antialiased linear, module-docstring
    deviation), 1=bilinear, 2=bicubic.
    """
    b, h, w, c = img.shape
    scale = out_valid.astype(jnp.float32) / in_valid.astype(jnp.float32)

    def branch(method, antialias):
        return lambda: jax.image.scale_and_translate(
            img, (b, canvas[0], canvas[1], c), (1, 2),
            scale, jnp.zeros((2,), jnp.float32), method=method, antialias=antialias,
        )

    out = jax.lax.switch(
        method_idx, [branch("linear", True), branch("linear", False), branch("cubic", False)]
    )
    return _reflect_fill(out, out_valid[0], out_valid[1])


@dataclasses.dataclass
class RealESRGANDegradation:
    """Callable degradation: (key, gt [B,H,W,3] in [0,1], kernels) → (lq, gt)
    both in [-1,1] at gt_size (reference ``__call__`` semantics)."""

    kernel_opt: dict = dataclasses.field(default_factory=lambda: dict(KERNEL_OPT))
    degrade_opt: dict = dataclasses.field(default_factory=lambda: dict(DEGRADE_OPT))
    resolution: Optional[int] = None

    def __post_init__(self):
        if self.resolution is not None:
            self.degrade_opt = dict(self.degrade_opt, gt_size=self.resolution)

    def jitted(self):
        """One-program form of ``__call__``: every random *choice* (scales,
        modes, noise types, JPEG qualities, crop, no-degradation) is traced
        from the JAX key, so the whole chain compiles ONCE per input shape
        and runs with zero host round-trips per step.

        The eager ``__call__`` re-dispatches ~10² device ops per call with
        fresh host randomness — through a remote-relay TPU (25-90 ms per
        dispatch) that dominates a train step. Random-size resizes become
        ``scale_and_translate`` with traced scales onto static /16-aligned
        canvases ([0,0]-anchored valid window, reflect-filled garbage), so
        noise statistics and the JPEG block grid over the valid window match
        the eager path's; branch choices are lax.switch/lax.cond.

        Distribution deltas vs the eager path (bounded in
        tests/test_degradation_jit.py): canvas JPEG edge blocks see reflected
        content beyond the valid window where the eager path snaps the image
        size to /16; intermediate resize sizes are exact (round(ori·s))
        instead of snapped.
        """
        if getattr(self, "_jit_fn", None) is None:
            self._jit_fn = jax.jit(self.traced_call)
        return self._jit_fn

    def traced_call(
        self,
        key: jax.Array,
        img_gt: jnp.ndarray,
        kernels: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        opt = self.degrade_opt
        kernel1, kernel2, sinc_kernel = kernels
        im_gt = jnp.asarray(img_gt, jnp.float32)
        b, ori_h, ori_w, _ = im_gt.shape
        sf = opt["sf"]
        gt_size = opt["gt_size"]
        lq_size = gt_size // sf
        if ori_h % (16 * sf) or ori_w % (16 * sf):
            raise ValueError(f"traced degradation needs H,W multiples of {16*sf}, got {ori_h}x{ori_w}")

        ks = jax.random.split(key, 24)
        u = jax.random.uniform(ks[0], (16,))  # per-call scalar choice draws

        if opt["use_usm"]:
            im_gt = usm_sharp(im_gt)

        # ---- stage 1: blur → random resize → noise → JPEG ----
        out = filter2d(im_gt, kernel1)

        p = np.asarray(opt["resize_prob"]) / np.sum(opt["resize_prob"])
        s_up = 1.0 + jax.random.uniform(ks[1], ()) * (opt["resize_range"][1] - 1.0)
        s_down = opt["resize_range"][0] + jax.random.uniform(ks[2], ()) * (1.0 - opt["resize_range"][0])
        scale1 = jnp.where(u[0] < p[0], s_up, jnp.where(u[0] < p[0] + p[1], s_down, 1.0))
        mode1 = jax.random.randint(ks[3], (), 0, 3)
        canvas1 = (_snap_up(int(ori_h * opt["resize_range"][1])), _snap_up(int(ori_w * opt["resize_range"][1])))
        v1 = jnp.round(jnp.asarray([ori_h, ori_w], jnp.float32) * scale1).astype(jnp.int32)
        out = _resize_valid(out, jnp.asarray([ori_h, ori_w], jnp.int32), canvas1, v1, mode1)

        sigma1 = jax.random.uniform(ks[4], (b,), minval=opt["noise_range"][0], maxval=opt["noise_range"][1])
        psc1 = jax.random.uniform(
            ks[5], (b,), minval=opt["poisson_scale_range"][0], maxval=opt["poisson_scale_range"][1]
        )
        gray1 = (jax.random.uniform(ks[6], (b,)) < opt["gray_noise_prob"]).astype(jnp.float32)
        out = jax.lax.cond(
            u[1] < opt["gaussian_noise_prob"],
            lambda x: add_gaussian_noise(ks[7], x, sigma1, gray1),
            lambda x: add_poisson_noise(ks[8], x, psc1, gray1),
            out,
        )

        q1 = jax.random.uniform(ks[9], (b,), minval=opt["jpeg_range"][0], maxval=opt["jpeg_range"][1])
        out = jpeg_compress(jnp.clip(out, 0.0, 1.0), q1)

        # ---- stage 2: (p) blur → random resize → noise → {JPEG, sinc} ----
        out = jax.lax.cond(
            u[2] < opt["second_blur_prob"], lambda x: filter2d(x, kernel2), lambda x: x, out
        )
        p2 = np.asarray(opt["resize_prob2"]) / np.sum(opt["resize_prob2"])
        s_up2 = 1.0 + jax.random.uniform(ks[10], ()) * (opt["resize_range2"][1] - 1.0)
        s_down2 = opt["resize_range2"][0] + jax.random.uniform(ks[11], ()) * (1.0 - opt["resize_range2"][0])
        scale2 = jnp.where(u[3] < p2[0], s_up2, jnp.where(u[3] < p2[0] + p2[1], s_down2, 1.0))
        mode2 = jax.random.randint(ks[12], (), 0, 3)
        canvas2 = (
            _snap_up(int(ori_h / sf * opt["resize_range2"][1])),
            _snap_up(int(ori_w / sf * opt["resize_range2"][1])),
        )
        v2 = jnp.round(jnp.asarray([ori_h / sf, ori_w / sf], jnp.float32) * scale2).astype(jnp.int32)
        out = _resize_valid(out, v1, canvas2, v2, mode2)

        sigma2 = jax.random.uniform(ks[13], (b,), minval=opt["noise_range2"][0], maxval=opt["noise_range2"][1])
        psc2 = jax.random.uniform(
            ks[14], (b,), minval=opt["poisson_scale_range2"][0], maxval=opt["poisson_scale_range2"][1]
        )
        gray2 = (jax.random.uniform(ks[15], (b,)) < opt["gray_noise_prob2"]).astype(jnp.float32)
        out = jax.lax.cond(
            u[4] < opt["gaussian_noise_prob2"],
            lambda x: add_gaussian_noise(ks[16], x, sigma2, gray2),
            lambda x: add_poisson_noise(ks[17], x, psc2, gray2),
            out,
        )

        final = (ori_h // sf, ori_w // sf)
        q2 = jax.random.uniform(ks[18], (b,), minval=opt["jpeg_range2"][0], maxval=opt["jpeg_range2"][1])
        mode3 = jax.random.randint(ks[19], (), 0, 3)
        fvalid = jnp.asarray(final, jnp.int32)

        def resize_first(x):
            x = _resize_valid(x, v2, final, fvalid, mode3)
            x = filter2d(x, sinc_kernel)
            return jpeg_compress(jnp.clip(x, 0.0, 1.0), q2)

        def jpeg_first(x):
            x = jpeg_compress(jnp.clip(x, 0.0, 1.0), q2)
            x = _resize_valid(x, v2, final, fvalid, mode3)
            return filter2d(x, sinc_kernel)

        out = jax.lax.cond(u[5] < 0.5, resize_first, jpeg_first, out)
        im_lq = jnp.clip(out, 0.0, 1.0)

        # ---- paired random crop + resize-back (traced offsets) ----
        top = jax.random.randint(ks[20], (), 0, final[0] - lq_size + 1)
        left = jax.random.randint(ks[21], (), 0, final[1] - lq_size + 1)
        im_lq = jax.lax.dynamic_slice(im_lq, (0, top, left, 0), (b, lq_size, lq_size, 3))
        im_gt = jax.lax.dynamic_slice(im_gt, (0, top * sf, left * sf, 0), (b, gt_size, gt_size, 3))

        if opt["resize_lq"]:
            im_lq = resize(im_lq, (gt_size, gt_size), "bicubic")

        im_lq = jnp.where(u[6] < opt["no_degradation_prob"], im_gt, im_lq)
        im_lq = jnp.where(jnp.any(jnp.isnan(im_lq)), im_gt, im_lq)

        im_lq = jnp.clip(im_lq * 2.0 - 1.0, -1.0, 1.0)
        im_gt = jnp.clip(im_gt * 2.0 - 1.0, -1.0, 1.0)
        return im_lq, im_gt

    def sample_kernels(self, rng: np.random.Generator, batch: int):
        triples = [sample_kernel_triple(rng, self.kernel_opt) for _ in range(batch)]
        k1 = jnp.asarray(np.stack([t[0] for t in triples]))
        k2 = jnp.asarray(np.stack([t[1] for t in triples]))
        sk = jnp.asarray(np.stack([t[2] for t in triples]))
        return k1, k2, sk

    def __call__(
        self,
        key: jax.Array,
        img_gt: jnp.ndarray,
        kernels: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
        host_rng: Optional[np.random.Generator] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        opt = self.degrade_opt
        host_rng = host_rng or np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
        if kernels is None:
            kernels = self.sample_kernels(host_rng, img_gt.shape[0])
        kernel1, kernel2, sinc_kernel = kernels

        im_gt = jnp.asarray(img_gt, jnp.float32)
        if opt["use_usm"]:
            im_gt = usm_sharp(im_gt)
        b, ori_h, ori_w, _ = im_gt.shape
        sf = opt["sf"]

        keys = list(jax.random.split(key, 8))

        # ---- stage 1 ----
        out = filter2d(im_gt, kernel1)
        updown = host_rng.choice(["up", "down", "keep"], p=np.asarray(opt["resize_prob"]) / np.sum(opt["resize_prob"]))
        scale = (
            host_rng.uniform(1, opt["resize_range"][1])
            if updown == "up"
            else host_rng.uniform(opt["resize_range"][0], 1)
            if updown == "down"
            else 1.0
        )
        mode = host_rng.choice(["area", "bilinear", "bicubic"])
        out = resize(out, (_snap(int(ori_h * scale)), _snap(int(ori_w * scale))), mode)

        if host_rng.random() < opt["gaussian_noise_prob"]:
            sigma = jnp.asarray(host_rng.uniform(*opt["noise_range"], size=(b,)), jnp.float32)
            gray = jnp.asarray(host_rng.random(b) < opt["gray_noise_prob"], jnp.float32)
            out = add_gaussian_noise(keys[0], out, sigma, gray)
        else:
            pscale = jnp.asarray(host_rng.uniform(*opt["poisson_scale_range"], size=(b,)), jnp.float32)
            gray = jnp.asarray(host_rng.random(b) < opt["gray_noise_prob"], jnp.float32)
            out = add_poisson_noise(keys[1], out, pscale, gray)

        quality = jnp.asarray(host_rng.uniform(*opt["jpeg_range"], size=(b,)), jnp.float32)
        out = jpeg_compress(jnp.clip(out, 0.0, 1.0), quality)

        # ---- stage 2 ----
        if host_rng.random() < opt["second_blur_prob"]:
            out = filter2d(out, kernel2)
        updown = host_rng.choice(
            ["up", "down", "keep"], p=np.asarray(opt["resize_prob2"]) / np.sum(opt["resize_prob2"])
        )
        scale = (
            host_rng.uniform(1, opt["resize_range2"][1])
            if updown == "up"
            else host_rng.uniform(opt["resize_range2"][0], 1)
            if updown == "down"
            else 1.0
        )
        mode = host_rng.choice(["area", "bilinear", "bicubic"])
        out = resize(out, (_snap(int(ori_h / sf * scale)), _snap(int(ori_w / sf * scale))), mode)

        if host_rng.random() < opt["gaussian_noise_prob2"]:
            sigma = jnp.asarray(host_rng.uniform(*opt["noise_range2"], size=(b,)), jnp.float32)
            gray = jnp.asarray(host_rng.random(b) < opt["gray_noise_prob2"], jnp.float32)
            out = add_gaussian_noise(keys[2], out, sigma, gray)
        else:
            pscale = jnp.asarray(host_rng.uniform(*opt["poisson_scale_range2"], size=(b,)), jnp.float32)
            gray = jnp.asarray(host_rng.random(b) < opt["gray_noise_prob2"], jnp.float32)
            out = add_poisson_noise(keys[3], out, pscale, gray)

        final_size = (ori_h // sf, ori_w // sf)
        quality = jnp.asarray(host_rng.uniform(*opt["jpeg_range2"], size=(b,)), jnp.float32)
        mode = host_rng.choice(["area", "bilinear", "bicubic"])
        if host_rng.random() < 0.5:
            # resize back + sinc, then JPEG
            out = resize(out, final_size, mode)
            out = filter2d(out, sinc_kernel)
            out = jpeg_compress(jnp.clip(out, 0.0, 1.0), quality)
        else:
            # JPEG, then resize back + sinc
            out = jpeg_compress(jnp.clip(out, 0.0, 1.0), quality)
            out = resize(out, final_size, mode)
            out = filter2d(out, sinc_kernel)

        im_lq = jnp.clip(out, 0.0, 1.0)

        # ---- paired random crop (gt at gt_size, lq aligned at gt_size/sf) ----
        gt_size = opt["gt_size"]
        lq_size = gt_size // sf
        top_lq = int(host_rng.integers(0, max(im_lq.shape[1] - lq_size, 0) + 1))
        left_lq = int(host_rng.integers(0, max(im_lq.shape[2] - lq_size, 0) + 1))
        im_lq = jax.lax.dynamic_slice(im_lq, (0, top_lq, left_lq, 0), (b, lq_size, lq_size, 3))
        im_gt = jax.lax.dynamic_slice(im_gt, (0, top_lq * sf, left_lq * sf, 0), (b, gt_size, gt_size, 3))

        if opt["resize_lq"]:
            im_lq = resize(im_lq, (gt_size, gt_size), "bicubic")

        if host_rng.random() < opt["no_degradation_prob"]:
            im_lq = im_gt
        im_lq = jnp.where(jnp.any(jnp.isnan(im_lq)), im_gt, im_lq)

        im_lq = jnp.clip(im_lq * 2.0 - 1.0, -1.0, 1.0)
        im_gt = jnp.clip(im_gt * 2.0 - 1.0, -1.0, 1.0)
        return im_lq, im_gt
