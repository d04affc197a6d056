from instantir_tpu.parallel.mesh import (
    data_parallel_sharding,
    initialize_distributed,
    make_mesh,
    replicate_params,
    shard_batch,
    zero1_shard,
)
from instantir_tpu.parallel.ring_attention import ring_attention, shard_sequence

__all__ = [
    "data_parallel_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicate_params",
    "ring_attention",
    "shard_batch",
    "shard_sequence",
    "zero1_shard",
]
