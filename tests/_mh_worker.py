"""Worker process for tests/test_multihost.py — NOT collected by pytest.

Launched N times (env: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID, plus MH_CKPT_DIR / MH_OUT below), each instance:

  1. connects via ``initialize_distributed()`` (the product path every CLI
     calls at startup),
  2. runs one Stage1Trainer step on the GLOBAL mesh feeding only its
     process-LOCAL batch rows (exactly what ``cli.train``'s per-process
     dataset sharding produces),
  3. saves + restores an orbax checkpoint of the (replicated trainable,
     ZeRO-1-sharded opt-state) through ``CheckpointManager`` — the multi-host
     layout the roadmap listed as untestable without hardware,
  4. writes its observed loss to ``MH_OUT`` for the parent to compare across
     processes and against a single-process run of the same global batch.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from instantir_tpu.parallel import initialize_distributed, make_mesh  # noqa: E402

assert initialize_distributed(), "worker must engage the distributed runtime"
pid = jax.process_index()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instantir_tpu.data.dataset import SyntheticImageDataset  # noqa: E402
from instantir_tpu.models.dinov2 import tiny_dinov2_config  # noqa: E402
from instantir_tpu.models.resampler import tiny_resampler_config  # noqa: E402
from instantir_tpu.models.unet import tiny_unet_config  # noqa: E402
from instantir_tpu.models.vae import tiny_vae_config  # noqa: E402
from instantir_tpu.pipeline.factory import build_pipeline  # noqa: E402
from instantir_tpu.train.common import CheckpointManager  # noqa: E402
from instantir_tpu.train.stage1_adapter import Stage1Config, Stage1Trainer  # noqa: E402

from _mh_common import GLOBAL_BATCH, RES, make_cond  # noqa: E402


def main() -> None:
    nproc = jax.process_count()
    assert nproc == int(os.environ["JAX_NUM_PROCESSES"])
    local = GLOBAL_BATCH // nproc
    lo, hi = pid * local, (pid + 1) * local

    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    bundle = build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES
    )
    cfg = Stage1Config(
        output_dir="", max_train_steps=1, train_batch_size=GLOBAL_BATCH, resolution=RES,
        lr_warmup_steps=0, learning_rate=1e-3, resume_from_checkpoint=None,
    )
    mesh = make_mesh()
    trainer = Stage1Trainer(
        bundle.unet, bundle.resampler, bundle.vae, bundle.image_encoder, bundle.params, cfg,
        mesh=mesh,
    )

    gbatch = next(SyntheticImageDataset(seed=0).batches(batch_size=GLOBAL_BATCH, gt_size=RES * 4))
    local_batch = {k: v[lo:hi] for k, v in gbatch.items()}
    lcond = {k: jnp.asarray(v[lo:hi]) for k, v in make_cond(ucfg).items()}

    batch = trainer.prepare_batch(local_batch, lcond, jax.random.PRNGKey(2))
    metrics = trainer.train_step(batch, jax.random.PRNGKey(3))
    loss = float(metrics["loss"])

    mgr = CheckpointManager(os.environ["MH_CKPT_DIR"], total_limit=2)
    state = {"trainable": trainer.trainable, "opt_state": trainer.opt_state}
    mgr.save(1, state)
    restored = mgr.restore(1, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state["trainable"]),
        jax.tree_util.tree_leaves(restored["trainable"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with open(os.environ["MH_OUT"] + f".{pid}", "w") as f:
        json.dump({"loss": loss, "global_devices": len(jax.devices()),
                   "mesh_data": int(mesh.shape["data"])}, f)
    print(f"[{pid}] OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
