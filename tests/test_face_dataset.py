"""Face-identity pair dataset (dormant reference component ``data/dataset.py``)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from instantir_tpu.data.face_dataset import FaceIdentityDataset, path_to_prompt


@pytest.fixture()
def face_root(tmp_path):
    root = tmp_path / "faces"
    root.mkdir()
    rng = np.random.default_rng(0)
    names, labels = [], {}
    for ident in ("alice", "bob"):
        for j in range(3):
            name = f"conceptname_smiling_{ident}_{j}.png"
            arr = (rng.uniform(0, 255, size=(40, 48, 3))).astype(np.uint8)
            Image.fromarray(arr).save(root / name)
            names.append(name)
            labels[name] = ident
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps(labels))
    return root, meta


def test_path_to_prompt():
    assert path_to_prompt("x/conceptname_smiling_3.png") == "a face smiling"
    assert path_to_prompt("x/conceptname_happy_12_7.jpg", "a dog") == "a dog happy"


def test_same_identity_pairing(face_root):
    root, meta = face_root
    ds = FaceIdentityDataset(str(root), metadata_path=str(meta), size=32, seed=1,
                             prompt_in_filename=True)
    assert len(ds) == 6
    ex = ds[0]
    assert ex["instance_images"].shape == (32, 32, 3)
    assert ex["encoder_images"].shape == (32, 32, 3)
    assert -1.001 <= ex["instance_images"].min() and ex["instance_images"].max() <= 1.001
    # encoder image is the SAME identity but never the same file: with 3
    # images per identity and distinct pixels, they must differ
    assert not np.allclose(ex["instance_images"], ex["encoder_images"])
    assert "a face" in ex["instance_prompt"]


def test_no_metadata_augmented_self(face_root):
    root, _ = face_root
    ds = FaceIdentityDataset(str(root), size=32, aug_images=True, center_crop=True, seed=2)
    ex = ds[1]
    # augmentation changes the self-pair; center crop keeps both deterministic sizes
    assert ex["encoder_images"].shape == (32, 32, 3)
    # same prompt template, but the placeholder substitution differs per side
    # (encoder <ph>, instance <s*> — reference data/dataset.py:167-168)
    assert ex["encoder_prompt"].replace("<ph>", "X") == ex["instance_prompt"].replace("<s*>", "X")


def test_placeholder_substitution_and_batches(face_root):
    root, meta = face_root
    ds = FaceIdentityDataset(
        str(root), instance_prompt="a photo of {placeholder}", metadata_path=str(meta),
        size=16, seed=0, use_only_decoder_prompts=True,
    )
    ex = ds[2]
    assert ex["instance_prompt"] == "a photo of <s*>"
    assert ex["encoder_prompt"] == ex["instance_prompt"]  # decoder prompts only
    batch = next(ds.batches(batch_size=4))
    assert batch["instance_images"].shape == (4, 16, 16, 3)
    assert len(batch["encoder_prompt"]) == 4


def test_head_crop_with_injected_detector(face_root):
    root, meta = face_root
    calls = []

    def detect_fn(images):
        calls.append(images.shape)
        lm = np.array([[[10, 12], [22, 12], [16, 18], [12, 24], [20, 24]]], np.float32)
        return lm, []

    ds = FaceIdentityDataset(str(root), metadata_path=str(meta), size=32, seed=3,
                             crop_head_for_encoder_image=True, detect_fn=detect_fn)
    ex = ds[0]
    assert calls and calls[0] == (1, 32, 32, 3)
    assert ex["encoder_images"].shape == (32, 32, 3)
    assert np.isfinite(ex["encoder_images"]).all()


def test_head_crop_requires_detector(face_root):
    root, _ = face_root
    with pytest.raises(ValueError, match="detect_fn"):
        FaceIdentityDataset(str(root), size=32, crop_head_for_encoder_image=True)
