from genrl_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    put_process_local_batch,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "initialize_distributed",
    "put_process_local_batch",
    "replicated",
    "shard_batch",
    "shard_params",
]
