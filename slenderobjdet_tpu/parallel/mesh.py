"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP
(SURVEY.md §2.11: `detectron2.engine.launch` → one process per GPU,
all_reduce in losses, gather at eval). The TPU-native design replaces all of
that with a single jitted program over a `jax.sharding.Mesh`:

- axis "data": batch sharding (the DP axis; collectives ride ICI)
- axis "model": intra-layer (channel) sharding of wide heads (TP)
- axis "spatial": image-height sharding (spatial partitioning, the classic
  TPU technique for detection resolutions that exceed one chip's HBM; GSPMD
  inserts the conv halo exchanges automatically)

Because loss normalizers are computed on the *global* (logical) batch inside
one jit program, XLA inserts the psum that DDP did by hand — no explicit
collectives needed in model code.

Multi-host: the same program runs on every host via
`jax.distributed.initialize()`; `make_mesh` uses the global device list.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, spatial: int = 1,
              devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data == -1:
        assert n % (model * spatial) == 0, \
            f"{n} devices not divisible by model={model}*spatial={spatial}"
        data = n // (model * spatial)
    assert data * model * spatial == n, \
        f"mesh {data}x{model}x{spatial} != {n} devices"
    arr = np.array(devices).reshape(data, model, spatial)
    return Mesh(arr, axis_names=("data", "model", "spatial"))


def mesh_from_cfg(cfg, devices=None) -> Mesh:
    return make_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_MODEL,
                     cfg.TPU.MESH_SPATIAL, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Shard images (B, H, W, C) over ('data', 'spatial'): batch over the DP
    axis, image HEIGHT over the spatial axis. GSPMD partitions every conv
    spatially and inserts the halo exchanges; flattened head tensors
    (B, HW, C) reshard automatically."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every batch leaf with its leading axis sharded over 'data';
    the image additionally shards its height over 'spatial' (no-op on
    spatial=1 meshes).

    Multi-process: `batch` is this process's LOCAL batch (leading dim =
    global batch / process_count); `put_global` assembles the global arrays
    from the per-process shards (`jax.make_array_from_process_local_data`),
    so under a `jax.distributed` run each host only ever materializes its
    own images — the counterpart of the reference's per-rank DataLoader
    shards (`slender_det/engine/defaults.py:66` per-rank seeding)."""
    from .multihost import put_global

    sh = batch_sharding(mesh)
    im = image_sharding(mesh) if mesh.shape.get("spatial", 1) > 1 else sh
    return {
        k: jax.tree_util.tree_map(
            lambda x: put_global(x, im if k == "image" else sh), v)
        for k, v in batch.items()
    }


def replicate(tree: Any, mesh: Mesh) -> Any:
    from .multihost import put_global

    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), tree)


def channel_sharded_params(params: Any, mesh: Mesh,
                           min_channels: int = 256) -> Any:
    """Place parameters with their output-channel dimension sharded over the
    'model' mesh axis (tensor parallelism for wide convs/denses); everything
    else replicated.

    Rule: conv kernels (h, w, cin, cout) and dense kernels (cin, cout) shard
    their LAST axis over 'model' when it's divisible by the axis size and at
    least `min_channels` (narrow outputs like 4-channel box heads stay
    replicated). GSPMD then partitions the matmuls and inserts the
    all-gathers/reduce-scatters — the manual Megatron plumbing of GPU
    frameworks has no user-code counterpart here.
    """
    model = mesh.shape["model"]
    repl = replicated(mesh)
    if model == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)

    def place(x):
        if (x.ndim in (2, 4) and x.shape[-1] >= min_channels
                and x.shape[-1] % model == 0):
            spec = P(*([None] * (x.ndim - 1)), "model")
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, params)
