"""Quantify the JAX degradation chain's documented deviations vs the torch
semantics of the reference (utils/degradation_pipeline.py:174-352 + the
basicsr ops it imports — basicsr itself is not installed here, so the torch
side re-implements those ops' documented math, as the repo's oracle tests
do).

Three deviations are bounded (module docstring of data/degradation.py):
  1. `_snap`-to-16 intermediate sizes (vs exact round(ori·scale));
  2. 'area' resize as antialiased linear (vs true adaptive averaging);
  3. Poisson noise at fixed 256 quantization levels (vs basicsr's
     per-image unique-color count rounded to a power of two).

Sections:
  * resize_delta  — per-(scale, mode) PSNR between the JAX path (snapped
    size + its mode mapping) and the torch path (exact size + true mode),
    both resized back to the common final grid as the chain does;
  * poisson_delta — noise σ of the fixed-256-level shot noise vs the
    per-image-level variant on natural-statistics test images;
  * e2e_delta     — N seeds through the full chain both ways with IDENTICAL
    host-rng recipes, kernels, and noise realizations (shared numpy RNG;
    the JAX side's DCT JPEG is used for both, isolating deviations 1-3):
    per-seed PSNR(lq_jax, lq_torch) + the LQ mean/σ distribution deltas.

Run: python tools/degradation_delta.py    (CPU: JAX_PLATFORMS=cpu recommended)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") != "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from instantir_tpu.data.degradation import (
    DEGRADE_OPT,
    RealESRGANDegradation,
    _snap,
    jpeg_compress,
    resize as jax_resize,
)

MODES = {"area": "area", "bilinear": "bilinear", "bicubic": "bicubic"}


def t_resize(x: torch.Tensor, size, mode: str) -> torch.Tensor:
    """torch F.interpolate with the reference's exact semantics (NCHW)."""
    kw = {} if mode == "area" else {"align_corners": False}
    return F.interpolate(x, size=size, mode=mode, **kw)


def t_filter2d(img: torch.Tensor, kernel: torch.Tensor) -> torch.Tensor:
    """basicsr filter2D: reflect pad + per-sample same-kernel conv (NCHW)."""
    b, c, h, w = img.shape
    k = kernel.shape[-1]
    pad = k // 2
    img = F.pad(img, (pad, pad, pad, pad), mode="reflect")
    ker = kernel.view(b, 1, 1, k, k).expand(b, c, 1, k, k).reshape(b * c, 1, k, k)
    out = F.conv2d(img.reshape(1, b * c, h + 2 * pad, w + 2 * pad), ker, groups=b * c)
    return out.view(b, c, h, w)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(peak * peak / mse)


def toy_images(rng, b, size):
    base = rng.uniform(size=(b, size // 8, size // 8, 3)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (b, size, size, 3), method="cubic")
    return np.asarray(jnp.clip(img, 0.0, 1.0))


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def nhwc(x: torch.Tensor) -> np.ndarray:
    return x.numpy().transpose(0, 2, 3, 1)


def resize_delta(rng):
    """JAX (snapped size + mode mapping) vs torch (exact size + true mode),
    compared on the common final (ori/sf) grid like the chain's stage-2."""
    ori, sf = 512, 4
    img = toy_images(rng, 1, ori)
    rows = {}
    for mode in MODES:
        for scale in (0.15, 0.35, 0.6, 0.9, 1.2, 1.5):
            exact = int(ori * scale)
            snapped = _snap(exact)
            jx = jax_resize(jnp.asarray(img), (snapped, snapped), mode)
            jx = np.asarray(jax_resize(jx, (ori // sf, ori // sf), "bicubic"))
            tx = t_resize(nchw(img), (exact, exact), MODES[mode])
            tx = nhwc(t_resize(tx, (ori // sf, ori // sf), "bicubic"))
            rows[f"{mode}_s{scale}"] = round(psnr(jx, tx), 2)
    return rows


def poisson_delta(rng):
    """σ of the shot noise under fixed-256 levels vs basicsr's per-image
    levels (unique gray values → next power of two), at unit scale."""
    out = {}
    posterized = np.round(toy_images(rng, 1, 256) * 31.0) / 31.0  # 5-bit content
    for img, label in ((toy_images(rng, 1, 256), "smooth_256"),
                       (toy_images(rng, 1, 64), "tiny_64"),
                       (posterized, "posterized_5bit")):
        gray = np.round(np.mean(img, -1, keepdims=False) * 255.0)
        uniq = len(np.unique(gray))
        vals_img = 2 ** int(np.ceil(np.log2(max(uniq, 2))))
        sig = lambda v: float(np.sqrt(np.mean(np.clip(img, 0, 1) / v)))  # noqa: E731
        out[label] = {
            "unique_levels": uniq, "basicsr_vals": vals_img,
            "sigma_fixed256": round(sig(256.0), 5),
            "sigma_per_image": round(sig(float(vals_img)), 5),
            "sigma_ratio": round(sig(256.0) / sig(float(vals_img)), 3),
        }
    return out


def torch_chain(img_gt: np.ndarray, kernels, recipe, noise, opt) -> np.ndarray:
    """The reference chain with EXACT sizes and true 'area', torch ops,
    shared noise realizations; JPEG via the (libjpeg-validated) JAX DCT op."""
    sf = opt["sf"]
    gt_size = opt["gt_size"]
    x = nchw(img_gt)
    b, _, ori_h, ori_w = x.shape
    k1, k2, sk = (torch.from_numpy(np.asarray(k, np.float32)) for k in kernels)

    def jpeg(xt, quality):
        arr = jnp.asarray(np.clip(nhwc(xt), 0.0, 1.0))
        h, w = arr.shape[1:3]
        ph, pw = -h % 16, -w % 16
        arr = jnp.pad(arr, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="edge")
        out = jpeg_compress(arr, jnp.asarray(quality, jnp.float32))
        return nchw(np.asarray(out[:, :h, :w]))

    # USM sharpen via the JAX op (identical on both sides — not a deviation)
    from instantir_tpu.data.degradation import usm_sharp

    gt_sharp = nchw(np.asarray(usm_sharp(jnp.asarray(img_gt))))

    out = t_filter2d(gt_sharp, k1)
    size1 = int(ori_h * recipe["scale1"])
    out = t_resize(out, (size1, size1), MODES[recipe["mode1"]])
    if recipe["gauss1"]:
        n = torch.from_numpy(noise["g1"][:, :, :size1, :size1])
        out = torch.clamp(out + n * recipe["sigma1"] / 255.0, 0.0, 1.0)
    else:
        lam = torch.clamp(out, 0, 1) * 256.0
        shot = torch.from_numpy(noise["p1"][:, :, :size1, :size1])
        out = torch.clamp(out + (lam + torch.sqrt(torch.clamp(lam, min=0)) * shot - lam) / 256.0
                          * recipe["pscale1"], 0.0, 1.0)
    out = jpeg(out, recipe["q1"])

    if recipe["second_blur"]:
        out = t_filter2d(out, k2)
    size2 = int(ori_h / sf * recipe["scale2"])
    out = t_resize(out, (size2, size2), MODES[recipe["mode2"]])
    if recipe["gauss2"]:
        n = torch.from_numpy(noise["g2"][:, :, :size2, :size2])
        out = torch.clamp(out + n * recipe["sigma2"] / 255.0, 0.0, 1.0)
    else:
        lam = torch.clamp(out, 0, 1) * 256.0
        shot = torch.from_numpy(noise["p2"][:, :, :size2, :size2])
        out = torch.clamp(out + (lam + torch.sqrt(torch.clamp(lam, min=0)) * shot - lam) / 256.0
                          * recipe["pscale2"], 0.0, 1.0)

    final = (ori_h // sf, ori_w // sf)
    if recipe["resize_first"]:
        out = t_resize(out, final, MODES[recipe["mode3"]])
        out = t_filter2d(out, sk)
        out = jpeg(out, recipe["q2"])
    else:
        out = jpeg(out, recipe["q2"])
        out = t_resize(out, final, MODES[recipe["mode3"]])
        out = t_filter2d(out, sk)
    lq = torch.clamp(out, 0.0, 1.0)

    lq_size = gt_size // sf
    top, left = recipe["top"], recipe["left"]
    lq = lq[:, :, top:top + lq_size, left:left + lq_size]
    if opt["resize_lq"]:
        lq = t_resize(lq, (gt_size, gt_size), "bicubic")
    return np.clip(nhwc(lq) * 2.0 - 1.0, -1.0, 1.0)


def jax_chain_forced(deg, img_gt, kernels, recipe, noise):
    """The production eager chain's math with the SAME recipe and noise
    realizations, snapped sizes and mode mapping (what data/degradation.py
    actually runs)."""
    from instantir_tpu.data.degradation import filter2d, usm_sharp

    opt = deg.degrade_opt
    sf, gt_size = opt["sf"], opt["gt_size"]
    im = usm_sharp(jnp.asarray(img_gt))
    b, ori_h, ori_w, _ = im.shape
    k1, k2, sk = (jnp.asarray(k) for k in kernels)

    def jpeg(arr, quality):
        h, w = arr.shape[1:3]
        ph, pw = -h % 16, -w % 16
        arr = jnp.pad(jnp.clip(arr, 0.0, 1.0), [(0, 0), (0, ph), (0, pw), (0, 0)], mode="edge")
        return jpeg_compress(arr, jnp.asarray(quality, jnp.float32))[:, :h, :w]

    out = filter2d(im, k1)
    size1 = _snap(int(ori_h * recipe["scale1"]))
    out = jax_resize(out, (size1, size1), recipe["mode1"])
    if recipe["gauss1"]:
        n = jnp.asarray(noise["g1"].transpose(0, 2, 3, 1)[:, :size1, :size1, :])
        out = jnp.clip(out + n * recipe["sigma1"] / 255.0, 0.0, 1.0)
    else:
        lam = jnp.clip(out, 0, 1) * 256.0
        shot = jnp.asarray(noise["p1"].transpose(0, 2, 3, 1)[:, :size1, :size1, :])
        out = jnp.clip(out + (jnp.sqrt(jnp.maximum(lam, 0)) * shot) / 256.0 * recipe["pscale1"], 0.0, 1.0)
    out = jpeg(out, recipe["q1"])

    if recipe["second_blur"]:
        out = filter2d(out, k2)
    size2 = _snap(int(ori_h / sf * recipe["scale2"]))
    out = jax_resize(out, (size2, size2), recipe["mode2"])
    if recipe["gauss2"]:
        n = jnp.asarray(noise["g2"].transpose(0, 2, 3, 1)[:, :size2, :size2, :])
        out = jnp.clip(out + n * recipe["sigma2"] / 255.0, 0.0, 1.0)
    else:
        lam = jnp.clip(out, 0, 1) * 256.0
        shot = jnp.asarray(noise["p2"].transpose(0, 2, 3, 1)[:, :size2, :size2, :])
        out = jnp.clip(out + (jnp.sqrt(jnp.maximum(lam, 0)) * shot) / 256.0 * recipe["pscale2"], 0.0, 1.0)

    final = (ori_h // sf, ori_w // sf)
    if recipe["resize_first"]:
        out = jax_resize(out, final, recipe["mode3"])
        out = filter2d(out, sk)
        out = jpeg(out, recipe["q2"])
    else:
        out = jpeg(out, recipe["q2"])
        out = jax_resize(out, final, recipe["mode3"])
        out = filter2d(out, sk)
    lq = jnp.clip(out, 0.0, 1.0)
    lq_size = gt_size // sf
    lq = lq[:, recipe["top"]:recipe["top"] + lq_size, recipe["left"]:recipe["left"] + lq_size]
    if opt["resize_lq"]:
        lq = jax_resize(lq, (gt_size, gt_size), "bicubic")
    return np.asarray(jnp.clip(lq * 2.0 - 1.0, -1.0, 1.0))


def e2e_delta(rng, n_seeds=8, res=256):
    deg = RealESRGANDegradation(resolution=res)
    opt = deg.degrade_opt
    img = toy_images(rng, 1, res)
    kernels = deg.sample_kernels(rng, 1)
    kn = tuple(np.asarray(k) for k in kernels)
    max1 = int(res * opt["resize_range"][1]) + 16
    max2 = int(res / opt["sf"] * opt["resize_range2"][1]) + 16

    per_seed, stats = [], {"jax": [], "torch": []}
    for s in range(n_seeds):
        r = np.random.default_rng(1000 + s)

        def draw_scale(prob, rg):
            u = r.random()
            p = np.asarray(prob) / np.sum(prob)
            if u < p[0]:
                return r.uniform(1, rg[1])
            if u < p[0] + p[1]:
                return r.uniform(rg[0], 1)
            return 1.0

        recipe = {
            "scale1": draw_scale(opt["resize_prob"], opt["resize_range"]),
            "mode1": r.choice(list(MODES)),
            "gauss1": r.random() < opt["gaussian_noise_prob"],
            "sigma1": r.uniform(*opt["noise_range"]),
            "pscale1": r.uniform(*opt["poisson_scale_range"]),
            "q1": r.uniform(*opt["jpeg_range"]),
            "second_blur": r.random() < opt["second_blur_prob"],
            "scale2": draw_scale(opt["resize_prob2"], opt["resize_range2"]),
            "mode2": r.choice(list(MODES)),
            "gauss2": r.random() < opt["gaussian_noise_prob2"],
            "sigma2": r.uniform(*opt["noise_range2"]),
            "pscale2": r.uniform(*opt["poisson_scale_range2"]),
            "q2": r.uniform(*opt["jpeg_range2"]),
            "mode3": r.choice(list(MODES)),
            "resize_first": r.random() < 0.5,
            "top": 0, "left": 0,
        }
        noise = {
            "g1": r.normal(size=(1, 3, max1, max1)).astype(np.float32),
            "p1": r.normal(size=(1, 3, max1, max1)).astype(np.float32),
            "g2": r.normal(size=(1, 3, max2, max2)).astype(np.float32),
            "p2": r.normal(size=(1, 3, max2, max2)).astype(np.float32),
        }
        lq_t = torch_chain(img, kn, recipe, noise, opt)
        lq_j = jax_chain_forced(deg, img, kn, recipe, noise)
        per_seed.append(round(psnr(lq_j, lq_t, peak=2.0), 2))
        stats["jax"].append((float(lq_j.mean()), float(lq_j.std())))
        stats["torch"].append((float(lq_t.mean()), float(lq_t.std())))

    mj, mt = np.asarray(stats["jax"]).mean(0), np.asarray(stats["torch"]).mean(0)
    return {
        "per_seed_psnr_db": per_seed,
        "min_psnr_db": min(per_seed),
        "lq_mean_delta": round(abs(mj[0] - mt[0]), 5),
        "lq_std_delta": round(abs(mj[1] - mt[1]), 5),
        "note": ("gaussian shot-noise approximation of Poisson used on BOTH sides so the same "
                 "realization can be shared; the fixed-256-vs-per-image level deviation is "
                 "quantified separately in poisson_delta"),
    }


def main():
    rng = np.random.default_rng(0)
    out = {
        "resize_delta_psnr_db": resize_delta(rng),
        "poisson_delta": poisson_delta(rng),
        "e2e_delta": e2e_delta(rng),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
