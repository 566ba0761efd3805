"""Parallelism: device meshes, batch sharding, distributed reductions."""

from cinemri_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    batch_partition_spec,
    ARRAY_KEYS,
)
from cinemri_tpu.parallel.distributed import (
    initialize,
    process_info,
    make_process_sum,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "batch_partition_spec",
    "ARRAY_KEYS",
    "initialize",
    "process_info",
    "make_process_sum",
]
