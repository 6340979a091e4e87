from genrl_tpu.parallel.mesh import (
    batch_axes,
    batch_sharding,
    chunk_batch_sharding,
    data_size,
    initialize_distributed,
    make_mesh,
    put_process_local_batch,
    replicated,
    shard_batch,
    shard_params,
    shard_state,
    state_shardings,
)

__all__ = [
    "make_mesh",
    "batch_axes",
    "batch_sharding",
    "chunk_batch_sharding",
    "data_size",
    "initialize_distributed",
    "put_process_local_batch",
    "replicated",
    "shard_batch",
    "shard_params",
    "shard_state",
    "state_shardings",
]
