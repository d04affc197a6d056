"""Device mesh + sharding utilities.

The reference's only distributed strategy is accelerate DDP over NCCL
(SURVEY.md §2.3). The TPU-native equivalent: one ``jax.sharding.Mesh`` with a
``data`` axis over ICI; batches are sharded along ``data``, parameters are
replicated, and XLA inserts the gradient ``psum`` when the jitted loss is
differentiated under these shardings — no explicit collectives in user code.
An optional ``model`` axis is reserved for tensor-parallel experiments
(conv-channel / attention-head sharding).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_distributed_initialized = False


def initialize_distributed(force: bool = False) -> bool:
    """Connect this process to the JAX distributed runtime for multi-host
    meshes (the analogue of ``accelerate launch --num_processes N`` spawning
    one process per device, ``train_stage1_adapter.sh:2``).

    On TPU pods (and Slurm / Open MPI launchers) ``force=True`` lets
    ``jax.distributed.initialize()`` auto-detect coordinator, process count,
    and process id from the cluster metadata. Elsewhere set the standard
    ``JAX_COORDINATOR_ADDRESS`` env var plus ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` (jax reads the address itself but not the other two —
    they are forwarded explicitly here). Single-host runs skip it entirely:
    without ``force``, this is a no-op (returns False) unless a coordinator
    address is configured — so every CLI can call it unconditionally at
    startup. After initialization, ``jax.devices()`` spans all hosts,
    ``make_mesh`` builds the global mesh, and the per-process dataset
    sharding (``jax.process_index/process_count``, already wired in
    ``cli.train``) plus orbax's multi-host checkpoint layout need no further
    changes. Exercised for real (two CPU processes over a localhost
    coordinator) in ``tests/test_multihost.py``.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    if not force and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        num_processes=int(num) if num is not None else None,
        process_id=int(pid) if pid is not None else None,
    )
    _distributed_initialized = True
    return True


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1, devices=None) -> Mesh:
    """(data, model) mesh over the available (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array in a pytree along its leading (batch) axis.

    Multi-host: each process passes only ITS slice of the global batch (the
    per-process dataset sharding — ``WeightedImageDataset(process_index,
    process_count)`` — produces exactly that, mirroring accelerate's sharded
    dataloader ``utils/train_utils.py:98,171``); the global array is
    assembled from the process-local shards without any cross-host copy.
    """
    sharding = data_parallel_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), batch
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def _put(x, sharding: NamedSharding):
    """device_put that also works when ``sharding`` spans multiple processes
    (every process must hold the full value, e.g. identically-seeded params):
    each process materializes only its addressable shards."""
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
    return jax.device_put(x, sharding)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: _put(x, sharding), params)


def zero1_spec(x, mesh: Mesh) -> NamedSharding:
    """ZeRO-1 layout for one optimizer-state leaf: shard the largest
    ``data``-divisible axis; replicate scalars/indivisible leaves."""
    ndev = mesh.shape["data"]
    if hasattr(x, "shape") and ndev > 1:
        for axis in sorted(range(len(x.shape)), key=lambda a: -x.shape[a]):
            if x.shape[axis] and x.shape[axis] % ndev == 0:
                parts = [None] * len(x.shape)
                parts[axis] = "data"
                return NamedSharding(mesh, P(*parts))
    return NamedSharding(mesh, P())


def zero1_shard(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree in the ZeRO-1 layout (optimizer-state sharding over the
    ``data`` axis). With fp32 Adam moments this cuts the per-chip optimizer
    footprint by ~the mesh size — the difference between stage-2's 1B-param
    aggregator fitting a v5e-8 pod and not. The update math is elementwise,
    so GSPMD runs it sharded and all-gathers only the parameter deltas."""
    return jax.tree_util.tree_map(lambda x: _put(x, zero1_spec(x, mesh)), tree)
