"""Trainer validation rendering + image-projection containers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.ip_adapter import ImageProjModel, MLPProjModel, MultiImageProjection
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.train.common import Tracker
from instantir_tpu.train.previewer_lora import PreviewerConfig, PreviewerTrainer
from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer
from instantir_tpu.train.stage2_aggregator import Stage2Config, Stage2Trainer
from instantir_tpu.train.validation import validate_previewer, validate_stage1, validate_stage2

RES = 32


class _CaptureTracker(Tracker):
    def __init__(self):
        super().__init__(None)
        self.logged = {}

    def images(self, step, tag, images):
        self.logged[tag] = np.asarray(images)


@pytest.fixture(scope="module")
def bundle():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    return build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES
    )


def _cond(pipe, b):
    rng = np.random.default_rng(5)
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = pipe.unet.config.projection_class_embeddings_input_dim - pipe.unet.config.addition_time_embed_dim * 6
    return {
        "prompt_embeds": jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32),
        "pooled_embeds": jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32), (b, 1)),
    }


def test_validate_all_stages(bundle, tmp_path, rng):
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, RES, RES, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(-1, 1, size=(1, RES, RES, 3)), jnp.float32)
    cond = _cond(bundle, 1)
    tracker = _CaptureTracker()

    t1 = Stage1Trainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params,
        Stage1Config(output_dir=str(tmp_path / "a"), resolution=RES),
    )
    validate_stage1(t1, lq, gt, cond, tracker, 0, num_steps=2)
    assert "validation/stage1" in tracker.logged

    t2 = PreviewerTrainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params,
        PreviewerConfig(output_dir=str(tmp_path / "b"), resolution=RES),
    )
    validate_previewer(t2, lq, gt, cond, tracker, 0)
    assert "validation/previewer_one_step" in tracker.logged

    t3 = Stage2Trainer(
        bundle.unet, bundle.aggregator, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params,
        Stage2Config(output_dir=str(tmp_path / "c"), resolution=RES),
    )
    validate_stage2(t3, lq, gt, cond, tracker, 0, num_steps=2)
    assert "validation/instantir" in tracker.logged
    for v in tracker.logged.values():
        assert np.isfinite(v).all() and v.ndim == 4


def test_image_proj_models(rng):
    m = ImageProjModel(cross_attention_dim=32, clip_embeddings_dim=16, clip_extra_context_tokens=4)
    emb = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), emb)
    out = m.apply(p, emb)
    assert out.shape == (2, 4, 32)

    m2 = MLPProjModel(cross_attention_dim=32, clip_embeddings_dim=16)
    p2 = m2.init(jax.random.PRNGKey(0), emb)
    out2 = m2.apply(p2, emb)
    assert out2.shape == (2, 1, 32)

    multi = MultiImageProjection([(m, p), (m2, p2)])
    tokens = multi([emb, emb])
    assert tokens.shape == (2, 5, 32)
    with pytest.raises(ValueError):
        multi([emb])


def test_tracker_wandb_backend(tmp_path, monkeypatch):
    """The wandb backend works when the package is importable (unlike the
    reference, whose wandb branch is `raise NotImplementedError`,
    train_stage1_adapter.py:137-138) and fails with a clear ImportError when
    it is not. Exercised against a stub wandb module."""
    import sys
    import types

    with pytest.raises(ValueError):
        Tracker(str(tmp_path), backend="bogus")

    assert "wandb" not in sys.modules  # not installed in this image
    with pytest.raises(ImportError):
        Tracker(str(tmp_path), backend="wandb")

    logged = []
    stub = types.SimpleNamespace()

    class _Run:
        def log(self, values, step=None):
            logged.append((step, values))

        def finish(self):
            logged.append(("finish", None))

    stub.init = lambda project=None, name=None, dir=None: _Run()
    stub.Image = lambda im: ("img", np.asarray(im).shape)
    monkeypatch.setitem(sys.modules, "wandb", stub)

    t = Tracker(str(tmp_path), backend="wandb", run_name="t")
    assert t.writer is None  # wandb-only: no tensorboard writer
    t.scalars(3, {"loss": 1.5})
    t.images(4, "val", np.zeros((2, 8, 8, 3), np.float32))
    t.close()
    assert logged[0] == (3, {"loss": 1.5})
    assert logged[1][0] == 4 and logged[1][1]["val"] == [("img", (8, 8, 3))] * 2
    assert logged[-1] == ("finish", None)

    # backend="all" writes both
    t2 = Tracker(str(tmp_path), backend="all")
    assert t2.writer is not None and t2.wandb is not None
    t2.scalars(1, {"a": 2.0})
    t2.close()
