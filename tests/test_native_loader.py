"""Native C++ loader: decode parity vs PIL, prefetch loader liveness."""

import os

import numpy as np
import pytest
from PIL import Image

from instantir_tpu.data import native_loader


pytestmark = pytest.mark.skipif(not native_loader.available(), reason="native loader not built")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory, ):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, ext in enumerate(["jpg", "png", "jpg"]):
        arr = (rng.uniform(size=(97 + i * 7, 123, 3)) * 255).astype(np.uint8)
        p = str(d / f"img{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95) if ext == "jpg" else Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_probe(image_dir):
    w, h = native_loader.probe(image_dir[1])
    assert (w, h) == (123, 104)


def test_decode_crop_shapes_and_determinism(image_dir):
    a = native_loader.decode_crop(image_dir[0], 64, seed=7)
    b = native_loader.decode_crop(image_dir[0], 64, seed=7)
    c = native_loader.decode_crop(image_dir[0], 64, seed=8)
    assert a.shape == (64, 64, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_png_decode_matches_pil(image_dir):
    # crop the full image (size == shorter side after resize keeps content):
    # compare statistics of a big crop against the PIL decode
    png_path = image_dir[1]
    ref = np.asarray(Image.open(png_path).convert("RGB"))
    out = native_loader.decode_crop(png_path, min(ref.shape[:2]), seed=0)
    # same value distribution (crop of losslessly-decoded identical image)
    assert abs(float(out.mean()) - float(ref.mean())) < 10


def test_prefetch_loader(image_dir):
    loader = native_loader.NativePrefetchLoader(image_dir, [1.0, 2.0, 1.0], gt_size=32, batch=4, seed=0)
    b1 = loader.next()
    b2 = loader.next()
    assert b1.shape == (4, 32, 32, 3)
    assert b1.dtype == np.uint8
    assert (b1 != b2).any()
    loader.close()


def test_corrupt_file_fallback(tmp_path, image_dir):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8garbagegarbage")
    assert native_loader.decode_crop(bad, 32) is None
    # loader with only a corrupt file emits gray batches rather than dying
    loader = native_loader.NativePrefetchLoader([bad], None, gt_size=16, batch=2, seed=0)
    b = loader.next()
    assert (b == 128).all()
    loader.close()
