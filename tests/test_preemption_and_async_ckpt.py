"""Preemption handling (SIGTERM → checkpoint + clean exit) and async
checkpointing.

TPU spot/maintenance events deliver SIGTERM with a grace window; the trainers
must save a resumable checkpoint at the next step boundary instead of dying
mid-run. The reference has no equivalent (a preempted accelerate job loses
everything since the last --checkpointing_steps save,
``train_stage1_adapter.py:1054-1078`` is resume-only). Async checkpointing
overlaps the orbax write with subsequent train steps (``accelerator.save_state``
is synchronous in the reference).
"""

import os
import signal

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


@pytest.fixture(scope="module")
def bundle():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    return build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES
    )


@pytest.fixture(autouse=True)
def _clean_preempt_state():
    prev = signal.getsignal(signal.SIGTERM)
    common._PREEMPT["requested"] = False
    yield
    common._PREEMPT["requested"] = False
    signal.signal(signal.SIGTERM, prev)


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


def test_sigterm_sets_preemption_flag():
    assert common.install_preemption_handler() is True
    assert not common.preemption_requested()
    os.kill(os.getpid(), signal.SIGTERM)  # what the TPU runtime sends
    assert common.preemption_requested()


def test_handler_refuses_non_main_thread():
    import threading

    results = []
    t = threading.Thread(target=lambda: results.append(common.install_preemption_handler()))
    t.start()
    t.join()
    assert results == [False]


def test_trainer_exits_and_checkpoints_on_preemption(bundle, tmp_path):
    """run() must stop at the next step boundary and leave a resumable
    checkpoint, losing at most the in-flight step."""
    cfg = Stage1Config(
        output_dir=str(tmp_path / "s1"), max_train_steps=50, train_batch_size=2,
        resolution=RES, checkpointing_steps=1000, logging_steps=1000,
        lr_warmup_steps=0, learning_rate=1e-3, handle_preemption=True,
    )
    tr = Stage1Trainer(bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg)

    inner = SyntheticImageDataset(seed=0).batches(batch_size=2, gt_size=RES * 4)

    def preempted_data():
        # SIGTERM lands while the first step is in flight
        batch = next(inner)
        os.kill(os.getpid(), signal.SIGTERM)
        yield batch
        raise AssertionError("trainer kept consuming data after preemption")

    tr.run(preempted_data(), _cond(bundle, 2))
    assert tr.global_step == 1  # stopped at the first step boundary
    assert tr.ckpt.latest_step() == 1

    # the checkpoint is resumable
    tr2 = Stage1Trainer(bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg)
    tr2.resume()
    assert tr2.global_step == 1
    for a, b in zip(jax.tree_util.tree_leaves(tr.trainable), jax.tree_util.tree_leaves(tr2.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_roundtrip_and_gc(tmp_path):
    mgr = common.CheckpointManager(str(tmp_path), total_limit=2, async_save=True)
    template = {"w": np.zeros((4, 4), np.float32), "step": 0}
    for step in (1, 2, 3):
        state = {"w": np.full((4, 4), float(step), np.float32), "step": step}
        mgr.save(step, state)  # returns before the write commits
    mgr.wait()
    # GC kept the newest total_limit dirs
    dirs = sorted(os.listdir(tmp_path))
    assert dirs == ["checkpoint-2", "checkpoint-3"]
    restored = mgr.restore(3, template)
    assert restored["step"] == 3
    np.testing.assert_array_equal(restored["w"], np.full((4, 4), 3.0, np.float32))


def test_final_save_idempotent_with_in_loop_save(bundle, tmp_path):
    """checkpointing_steps dividing max_train_steps must not double-save the
    final step (orbax refuses to overwrite an existing checkpoint)."""
    cfg = Stage1Config(
        output_dir=str(tmp_path / "s1"), max_train_steps=2, train_batch_size=2,
        resolution=RES, checkpointing_steps=2, logging_steps=1000,
        lr_warmup_steps=0, learning_rate=1e-3,
    )
    tr = Stage1Trainer(bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg)
    data = SyntheticImageDataset(seed=0).batches(batch_size=2, gt_size=RES * 4)
    tr.run(data, _cond(bundle, 2))  # in-loop save at step 2 + final save at step 2
    assert tr.ckpt.latest_step() == 2
