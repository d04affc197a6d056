"""Host-pipelined batch preparation (``prefetch_batches`` /
``common.pipelined_batches``).

A worker thread runs the host-side batch path (loader, caption cond,
``prepare_batch`` upload + degradation dispatch) ahead of the train loop —
the TPU-side point is hiding blocking host time (≈12 MB/batch of relay
upload at 512², docs/perf.md round 4) behind device compute. The contract
pinned here: the pipelined loop consumes the SAME (recipe, key) sequence as
the sequential loop — final parameters are identical — and worker failures
surface in the caller instead of hanging the queue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.data.dataset import SyntheticImageDataset
from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.train import common
from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer

RES = 32
BATCH = 2
STEPS = 3


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
    pooled_dim = (
        pipe.unet.config.projection_class_embeddings_input_dim
        - pipe.unet.config.addition_time_embed_dim * 6
    )
    return {
        "prompt_embeds": jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32),
        "uncond_prompt_embeds": jnp.zeros((b, 7, cross), jnp.float32),
        "pooled_embeds": jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32),
        "uncond_pooled_embeds": jnp.zeros((b, pooled_dim), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32), (b, 1)),
    }


def _train(bundle, tmp_path, prefetch: int):
    cfg = Stage1Config(
        output_dir=str(tmp_path / f"pf{prefetch}"), max_train_steps=STEPS,
        train_batch_size=BATCH, resolution=RES, lr_warmup_steps=0,
        learning_rate=1e-3, logging_steps=1000, checkpointing_steps=1000,
        prefetch_batches=prefetch,
    )
    tr = Stage1Trainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg
    )
    data = SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES * 4)
    tr.run(data, _cond(bundle, BATCH))
    return tr


def test_pipelined_matches_sequential(bundle, tmp_path):
    seq = _train(bundle, tmp_path, prefetch=0)
    pipe = _train(bundle, tmp_path, prefetch=2)
    assert seq.global_step == pipe.global_step == STEPS
    for k, v in seq.trainable.items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(pipe.trainable[k]), err_msg=str(k)
        )


def test_worker_exception_surfaces(bundle):
    class Boom(RuntimeError):
        pass

    def bad_iter():
        yield from SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES * 4)

    def broken():
        raise Boom("loader died")
        yield  # pragma: no cover

    cfg = Stage1Config(
        output_dir="", max_train_steps=4, train_batch_size=BATCH, resolution=RES,
        lr_warmup_steps=0, resume_from_checkpoint=None,
    )
    tr = Stage1Trainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg
    )
    src = common.pipelined_batches(tr, broken(), _cond(bundle, BATCH), jax.random.PRNGKey(0), 4, 2)
    with pytest.raises(Boom):
        next(src)


def test_data_exhaustion_ends_cleanly(bundle):
    """A finite data iterator ends the pipelined stream (None sentinel), it
    does not hang or raise through the queue."""
    cfg = Stage1Config(
        output_dir="", max_train_steps=10, train_batch_size=BATCH, resolution=RES,
        lr_warmup_steps=0, resume_from_checkpoint=None,
    )
    tr = Stage1Trainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg
    )
    finite = iter(
        [next(SyntheticImageDataset(seed=0).batches(batch_size=BATCH, gt_size=RES * 4))]
    )
    src = common.pipelined_batches(tr, finite, _cond(bundle, BATCH), jax.random.PRNGKey(0), 10, 2)
    items = list(src)
    assert len(items) == 1
    batch, k_step = items[0]
    assert "lq" in batch and k_step.shape == (2,)
