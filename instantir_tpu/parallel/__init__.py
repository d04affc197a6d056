from instantir_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate_params,
    data_parallel_sharding,
)

__all__ = ["make_mesh", "shard_batch", "replicate_params", "data_parallel_sharding"]
