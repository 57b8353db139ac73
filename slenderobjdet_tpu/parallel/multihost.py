"""Multi-host (multi-process) support.

The reference's multi-node mode is 2 nodes x 4 GPUs of NCCL DDP launched by
`detectron2.engine.launch` (`/root/reference/train_multi_nodes.sh:1-16`,
`/root/reference/train_net.py:188-195`) with host-side collectives for eval
(`/root/reference/slender_det/evaluation/coco_evaluation.py:81-87`
`comm.gather`) and barriers (`engine/hooks.py:43`).

TPU-native design: the SAME jitted SPMD program runs in every process over
the global device mesh (`jax.distributed.initialize` + `make_mesh` over
`jax.devices()`); per-process host data becomes global `jax.Array`s via
`jax.make_array_from_process_local_data`, XLA/GSPMD inserts the on-device
collectives, and the few host-side object transfers (eval prediction
gather) ride `multihost_utils.process_allgather` over the distributed
client. No torch.distributed/NCCL/MPI plumbing has a counterpart here.

Everything in this module degrades to a no-op/pass-through when
`jax.process_count() == 1`, so single-process code paths are unchanged.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np

__all__ = [
    "process_count",
    "process_index",
    "is_main_process",
    "put_global",
    "all_gather_objects",
    "sync_processes",
    "local_slice",
]


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def put_global(x: Any, sharding) -> jax.Array:
    """Place host data on the mesh as one GLOBAL jax.Array.

    Single-process: plain `device_put` (all devices addressable).
    Multi-process: `x` is this process's LOCAL portion of the global array —
    its slice of the batch for specs that shard a dimension across
    processes, or the full (identical) array for replicated specs. This is
    the fix for the round-3 finding that a global `device_put` requires
    all-addressable devices and throws under `jax.distributed.initialize`.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def local_slice(n: int, batch_axis_shards_per_process: int = 1):
    """(start, stop) of this process's contiguous portion of a length-n
    global batch axis, assuming mesh axes are laid out process-major (the
    `make_mesh` default: `jax.devices()` is ordered by process)."""
    per = n // jax.process_count()
    start = jax.process_index() * per
    return start, start + per


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one arbitrary picklable object per process; every process
    receives the full list ordered by process index.

    Counterpart of the reference's `comm.gather(predictions, dst=0)`
    (`coco_evaluation.py:82-84`) — implemented as an all-gather of padded
    pickle bytes over `process_allgather` (two host collectives: sizes,
    then payloads). Prediction lists are small host data; symmetry is
    cheaper than a rank-0-only code path.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), np.uint8
    )
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64)
    ).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: payload.size] = payload
    stacked = np.asarray(multihost_utils.process_allgather(buf))
    return [
        pickle.loads(stacked[i, : int(sizes[i])].tobytes())
        for i in range(len(sizes))
    ]


def sync_processes(name: str = "sync") -> None:
    """Cross-process barrier (reference `comm.synchronize`,
    `engine/hooks.py:43`). No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
