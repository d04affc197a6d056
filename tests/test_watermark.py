"""Invisible watermark (utils/watermark.py) — the reference's optional
StableDiffusionXLWatermarker behavior (sdxl_instantir.py:63-64, 341-343),
rebuilt as a DCT-QIM codec. Pins: exact 48-bit recovery after uint8
rounding, imperceptibility (>40 dB), no-watermark extraction is garbage,
and the CLI flag surface."""

import numpy as np

from instantir_tpu.utils.watermark import (
    WATERMARK_BITS,
    embed_watermark,
    extract_watermark,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_roundtrip_through_uint8(rng):
    img = rng.uniform(size=(512, 512, 3)).astype(np.float32)
    wm = embed_watermark(img)
    assert _psnr(img, wm) > 40.0
    # survive the save-to-PNG quantization
    wm8 = np.round(wm * 255.0) / 255.0
    bits = extract_watermark(wm8)
    np.testing.assert_array_equal(bits, WATERMARK_BITS)


def test_batch_and_custom_bits(rng):
    imgs = rng.uniform(size=(2, 256, 264, 3)).astype(np.float32)  # non-multiple W
    custom = (rng.random(48) < 0.5).astype(np.int64)
    wm = embed_watermark(imgs, bits=custom)
    assert wm.shape == imgs.shape
    for b in range(2):
        np.testing.assert_array_equal(extract_watermark(wm[b]), custom)


def test_unwatermarked_does_not_match(rng):
    img = rng.uniform(size=(512, 512, 3)).astype(np.float32)
    bits = extract_watermark(img)
    assert (bits != np.asarray(WATERMARK_BITS)).sum() > 8


def test_cli_flag_exists():
    from instantir_tpu.cli.infer import build_parser

    args = build_parser().parse_args(
        ["--sdxl_path", "x", "--instantir_path", "x", "--vision_encoder_path", "x",
         "--test_path", "/tmp", "--watermark"])
    assert args.watermark
