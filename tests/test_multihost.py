"""Multi-HOST (multi-process) path: 2 subprocesses x 4 virtual CPU devices
joined by `jax.distributed.initialize` into one 8-device global mesh — the
operational counterpart of the reference's 2-node DDP launch
(`/root/reference/train_multi_nodes.sh:1-16`, `train_net.py:188-195`).

The dryrun asserts, in the parent (tools/multihost_dryrun.py):
  * one SPMD train step over the global mesh with per-process batch slices
    assembled via jax.make_array_from_process_local_data gives EXACTLY the
    same loss as a single-process run of the same global program;
  * COCOEvaluator gathers predictions across processes at evaluate()
    (reference `comm.gather`, coco_evaluation.py:81-87): main-process AP
    equals the single-process AP over the full set, non-main returns empty.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multihost_2x4():
    import __graft_entry__

    __graft_entry__.dryrun_multihost(n_processes=2, local_devices=4)


def test_multihost_helpers_single_process():
    """Single-process degradation: every helper is a pass-through no-op."""
    import jax
    import numpy as np

    from slenderobjdet_tpu.parallel import (
        all_gather_objects,
        is_main_process,
        process_count,
        put_global,
        sync_processes,
    )
    from slenderobjdet_tpu.parallel.mesh import make_mesh, replicated

    assert process_count() == 1 and is_main_process()
    assert all_gather_objects({"a": 1}) == [{"a": 1}]
    sync_processes("noop")
    mesh = make_mesh(data=len(jax.devices()))
    x = np.arange(8, dtype=np.float32)
    arr = put_global(x, replicated(mesh))
    np.testing.assert_array_equal(np.asarray(arr), x)
