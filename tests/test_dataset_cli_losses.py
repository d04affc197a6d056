"""Dataset file loading, CLI resize logic, loss closed forms."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from instantir_tpu.cli.infer import DEFAULT_NEG_PROMPT, DEFAULT_PROMPT, build_parser, resize_img
from instantir_tpu.data.dataset import DataConfig, SingleDataConfig, WeightedImageDataset, load_data_config
from instantir_tpu.losses import DiffusionLossInputs, HuberLoss, L1Loss, L2Loss, build_losses
from instantir_tpu.losses.loss_config import SingleLossConfig, load_losses_config


@pytest.fixture()
def image_dirs(tmp_path):
    rng = np.random.default_rng(0)
    for name, n in [("a", 3), ("b", 2)]:
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            arr = (rng.uniform(size=(80, 100, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return tmp_path


def test_weighted_dataset_batches(image_dirs):
    cfg = DataConfig(
        datasets=[
            SingleDataConfig(str(image_dirs / "a"), 0.75),
            SingleDataConfig(str(image_dirs / "b"), 0.25),
        ]
    )
    ds = WeightedImageDataset(cfg, seed=0)
    assert len(ds) == 5
    it = ds.batches(batch_size=3, gt_size=64)
    batch = next(it)
    assert batch["images"].shape == (3, 64, 64, 3)
    assert batch["kernel"].shape == (3, 21, 21)
    assert batch["images"].min() >= 0 and batch["images"].max() <= 1
    # deterministic under the same seed
    ds2 = WeightedImageDataset(cfg, seed=0)
    batch2 = next(ds2.batches(batch_size=3, gt_size=64))
    np.testing.assert_array_equal(batch["images"], batch2["images"])


def test_dataset_per_sample_captions(image_dirs):
    """Captions via metadata.jsonl (multi-caption random-choice) and sidecar
    .txt files (reference utils/train_utils.py:190-237)."""
    import json

    meta = [
        {"file_name": "0.png", "text": "caption zero"},
        {"file_name": "1.png", "text": ["multi one", "multi two"]},
    ]
    (image_dirs / "a" / "metadata.jsonl").write_text("\n".join(json.dumps(m) for m in meta))
    (image_dirs / "b" / "0.txt").write_text("sidecar caption\n")
    cfg = DataConfig(
        datasets=[
            SingleDataConfig(str(image_dirs / "a"), 0.5),
            SingleDataConfig(str(image_dirs / "b"), 0.5),
        ]
    )
    ds = WeightedImageDataset(cfg, seed=0)
    seen = set()
    for batch in [next(ds.batches(batch_size=4, gt_size=64)) for _ in range(8)]:
        assert len(batch["captions"]) == 4
        seen.update(batch["captions"])
    assert "caption zero" in seen
    assert "sidecar caption" in seen
    assert seen & {"multi one", "multi two"}  # random-choice multi-caption
    assert "" in seen  # images without any caption fall back to empty


def test_dataset_missing_folder_raises(tmp_path):
    cfg = DataConfig(datasets=[SingleDataConfig(str(tmp_path / "nope"))])
    with pytest.raises(FileNotFoundError):
        WeightedImageDataset(cfg)


def test_load_data_config(tmp_path, image_dirs):
    p = tmp_path / "data.yaml"
    p.write_text("datasets:\n  - dataset_folder: 'a'\n    dataset_weight: 0.5\n")
    cfg = load_data_config(str(p), data_dir=str(image_dirs))
    assert cfg.datasets[0].dataset_folder.endswith("a")
    assert cfg.datasets[0].dataset_weight == 0.5


def test_resize_img_rules():
    # reference infer.py:31-66 — min side 768, max 1024, floor to /64
    img = Image.new("RGB", (500, 400))
    out, orig = resize_img(img)
    assert orig == (500, 400)
    w, h = out.size
    assert w % 64 == 0 and h % 64 == 0
    assert min(w, h) >= 768 - 64 and max(w, h) <= 1024
    # explicit size passthrough
    out2, orig2 = resize_img(Image.new("RGB", (2000, 1000)), width=1024, height=1024)
    assert orig2 == (1024, 1024)
    assert max(out2.size) <= 1024


def test_cli_parser_defaults():
    p = build_parser()
    args = p.parse_args(
        ["--sdxl_path", "s", "--instantir_path", "i", "--vision_encoder_path", "v", "--test_path", "t"]
    )
    assert args.num_inference_steps == 30 and args.cfg == 7.0 and args.batch_size == 6
    assert len(DEFAULT_PROMPT) > 50 and len(DEFAULT_NEG_PROMPT) > 50


def test_loss_closed_forms(rng):
    a = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    inputs = DiffusionLossInputs(predicted=a, target=b)
    np.testing.assert_allclose(float(L2Loss()(inputs)), float(np.mean((np.asarray(a) - np.asarray(b)) ** 2)), rtol=1e-6)
    np.testing.assert_allclose(float(L1Loss()(inputs)), float(np.mean(np.abs(np.asarray(a) - np.asarray(b)))), rtol=1e-6)
    c = 0.001
    expected = np.mean(np.sqrt((np.asarray(a) - np.asarray(b)) ** 2 + c**2) - c)
    np.testing.assert_allclose(float(HuberLoss(huber_c=c)(inputs)), expected, rtol=1e-5)
    # per-sample weights
    w = jnp.asarray([2.0, 0.0])
    per = np.mean((np.asarray(a) - np.asarray(b)) ** 2, axis=(1, 2, 3))
    expected_w = np.mean(per * np.array([2.0, 0.0]))
    got = float(L2Loss()(DiffusionLossInputs(predicted=a, target=b, weights=w)))
    np.testing.assert_allclose(got, expected_w, rtol=1e-6)


def test_build_losses_and_yaml(tmp_path):
    p = tmp_path / "losses.yaml"
    p.write_text(
        "diffusion_losses:\n- name: L2Loss\n  weight: 1\nlcm_losses:\n- name: HuberLoss\n  weight: 1\n  init_params:\n    huber_c: 0.001\n"
    )
    cfg = load_losses_config(str(p))
    diff = build_losses(cfg.diffusion_losses)
    lcm = build_losses(cfg.lcm_losses)
    assert isinstance(diff[0][0], L2Loss) and diff[0][1] == 1
    assert isinstance(lcm[0][0], HuberLoss) and lcm[0][0].huber_c == 0.001
    # unavailable losses fail fast at construction
    with pytest.raises(NotImplementedError):
        build_losses([SingleLossConfig(name="LPIPSLoss")])


def test_cli_val_batch_builder(tmp_path):
    """--validation_image paths become a [-1,1] NHWC val batch."""
    from PIL import Image

    from instantir_tpu.cli.train import _val_batch, build_parser

    img = tmp_path / "lq.png"
    Image.fromarray((np.random.default_rng(0).uniform(0, 255, (40, 50, 3))).astype(np.uint8)).save(img)
    args = build_parser().parse_args(
        ["stage1", "--validation_steps", "5", "--validation_image", str(img), "--resolution", "32"]
    )
    vb = _val_batch(args)
    assert vb["lq"].shape == (1, 32, 32, 3) == vb["gt"].shape
    assert float(vb["lq"].min()) >= -1.0 and float(vb["lq"].max()) <= 1.0
    # disabled when validation_steps is 0
    args = build_parser().parse_args(["stage1", "--validation_image", str(img)])
    assert _val_batch(args) is None
