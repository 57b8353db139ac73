from .mesh import (
    batch_sharding,
    make_mesh,
    mesh_from_cfg,
    replicate,
    replicated,
    shard_batch,
)
from .multihost import (
    all_gather_objects,
    is_main_process,
    process_count,
    process_index,
    put_global,
    sync_processes,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "mesh_from_cfg",
    "replicate",
    "replicated",
    "shard_batch",
    "all_gather_objects",
    "is_main_process",
    "process_count",
    "process_index",
    "put_global",
    "sync_processes",
]
