from .mesh import (
    batch_sharding,
    make_mesh,
    mesh_from_cfg,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "mesh_from_cfg",
    "replicate",
    "replicated",
    "shard_batch",
]
