"""Multi-host execution path.

Single-host guarantees first: ``initialize_distributed`` must be a safe no-op
(every CLI calls it unconditionally) and only engage when a coordinator is
configured. Then the real thing: TWO actual OS processes connect through a
localhost coordinator (``jax.distributed`` — the same runtime a TPU pod
uses, with gloo in place of ICI/DCN), each feeds its process-LOCAL batch
rows to the PRODUCT trainer path (``Stage1Trainer(mesh=global_mesh)``), and
the parent checks cross-process loss agreement AND agreement with a
single-process run of the identical global batch on the same 8-device
topology. The workers also roundtrip an orbax checkpoint (replicated
trainables + ZeRO-1-sharded optimizer state) through ``CheckpointManager`` —
the multi-host checkpoint layout. Reference analogue:
``accelerate launch --num_processes N`` + sharded dataloader
(``train_stage1_adapter.sh:2``, ``utils/train_utils.py:98,171``).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp

from instantir_tpu.parallel import initialize_distributed, make_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False
    # single-host topology unchanged — the local mesh still builds
    assert jax.process_count() == 1
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())


def test_idempotent_once_initialized(monkeypatch):
    import instantir_tpu.parallel.mesh as m

    monkeypatch.setattr(m, "_distributed_initialized", True)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: calls.append(1))
    assert m.initialize_distributed(force=True) is True
    assert not calls  # already connected → no second handshake


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step_and_checkpoint(tmp_path):
    """The real multi-host handshake + product train path + orbax layout."""
    nproc, per_proc_devices = 2, 4
    port = _free_port()
    out = str(tmp_path / "loss")
    procs = []
    for pid in range(nproc):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={per_proc_devices}",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(nproc),
            JAX_PROCESS_ID=str(pid),
            MH_CKPT_DIR=str(tmp_path / "ckpt"),
            MH_OUT=out,
            PYTHONPATH=REPO,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "_mh_worker.py")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"

    reports = []
    for pid in range(nproc):
        with open(f"{out}.{pid}") as f:
            reports.append(json.load(f))
    # both processes saw the global 8-device topology and the same loss
    assert all(r["global_devices"] == nproc * per_proc_devices for r in reports)
    assert all(r["mesh_data"] == nproc * per_proc_devices for r in reports)
    assert abs(reports[0]["loss"] - reports[1]["loss"]) < 1e-6

    # the orbax checkpoint written across processes is complete on disk
    assert (tmp_path / "ckpt" / "checkpoint-1" / "state").is_dir()

    # single-process ground truth: the SAME global batch on the suite's own
    # 8-device (virtual) mesh must produce the same loss
    from instantir_tpu.data.dataset import SyntheticImageDataset
    from instantir_tpu.models.dinov2 import tiny_dinov2_config
    from instantir_tpu.models.resampler import tiny_resampler_config
    from instantir_tpu.models.unet import tiny_unet_config
    from instantir_tpu.models.vae import tiny_vae_config
    from instantir_tpu.pipeline.factory import build_pipeline
    from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer

    from _mh_common import GLOBAL_BATCH, RES, make_cond

    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    bundle = build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0),
        image_size=RES,
    )
    cfg = Stage1Config(
        output_dir="", max_train_steps=1, train_batch_size=GLOBAL_BATCH, resolution=RES,
        lr_warmup_steps=0, learning_rate=1e-3, resume_from_checkpoint=None,
    )
    trainer = Stage1Trainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg,
        mesh=make_mesh(num_devices=8),
    )
    gbatch = next(SyntheticImageDataset(seed=0).batches(batch_size=GLOBAL_BATCH, gt_size=RES * 4))
    cond = {k: jnp.asarray(v) for k, v in make_cond(ucfg).items()}
    batch = trainer.prepare_batch(gbatch, cond, jax.random.PRNGKey(2))
    loss_1p = float(trainer.train_step(batch, jax.random.PRNGKey(3))["loss"])
    # same 8-way sharding, different collective transport (in-process vs
    # gloo): identical math up to reduction-order noise
    assert abs(loss_1p - reports[0]["loss"]) < 2e-4 * max(1.0, abs(loss_1p))
