"""Multi-device sharding: the full train step on 2-D (data x model) meshes
using the 8 virtual CPU devices from conftest."""

import sys, os

import pytest

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_channel_sharding_rule():
    import jax
    import numpy as np

    from slenderobjdet_tpu.parallel import make_mesh
    from slenderobjdet_tpu.parallel.mesh import channel_sharded_params

    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    params = {
        "wide_conv": np.zeros((3, 3, 256, 256), np.float32),
        "narrow_head": np.zeros((3, 3, 256, 4), np.float32),
        "bias": np.zeros((256,), np.float32),
    }
    placed = channel_sharded_params(params, mesh)
    # wide conv sharded over 'model' on the output-channel dim
    assert "model" in str(placed["wide_conv"].sharding.spec)
    # narrow heads and biases replicated
    assert "model" not in str(placed["narrow_head"].sharding.spec)
    assert "model" not in str(placed["bias"].sharding.spec)


def test_trainer_tensor_parallel(tmp_path):
    """TPU.MESH_MODEL > 1 shards wide param channels over 'model' inside the
    TRAINER (not just dryrun_multichip) and trains finite."""
    import jax
    import numpy as np

    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.engine.trainer import BaseTrainer
    from synthetic import make_coco_json

    gt_json, image_root = make_coco_json(tmp_path, num_images=4,
                                         img_hw=(64, 64))
    name = "synth_tp"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, gt_json, image_root)

    cfg = make_tiny_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = ()
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.TPU.MESH_DATA = 4
    cfg.TPU.MESH_MODEL = 2
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    trainer = BaseTrainer(cfg)
    assert trainer.mesh is not None and trainer.mesh.shape["model"] == 2
    # at least one wide kernel actually sharded over 'model'
    sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(trainer.state.params)
        if hasattr(leaf, "sharding") and "model" in str(leaf.sharding.spec)
    ]
    assert sharded, "no parameter sharded over the model axis"
    state = trainer.train()
    assert int(np.asarray(jax.device_get(state.step))) == 2


def test_spatial_partitioning_matches_unsharded():
    """A (data=2, model=1, spatial=4) mesh step must reproduce the
    single-device loss exactly: spatial sharding is a layout, not an
    approximation (GSPMD inserts conv halo exchanges)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_cfg
    from slenderobjdet_tpu.engine.train_loop import (
        TrainState, make_train_step)
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.parallel import make_mesh, replicate, shard_batch

    cfg = _flagship_cfg(tiny=True)
    det = build_model(cfg)
    h = w = 64
    B, G = 2, 8
    variables = det.init_variables(jax.random.PRNGKey(0), (h, w), B)
    tx = optax.sgd(0.01)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    r = np.random.RandomState(0)
    xy = r.rand(B, G, 2).astype(np.float32) * 30
    wh = r.rand(B, G, 2).astype(np.float32) * 20 + 4
    batch = {
        "image": r.randint(0, 255, (B, h, w, 3)).astype(np.uint8),
        "gt_boxes": np.concatenate([xy, xy + wh], axis=2),
        "gt_classes": r.randint(0, 80, (B, G)).astype(np.int32),
        "gt_valid": np.ones((B, G), bool),
    }

    step = make_train_step(det, tx, donate=False)
    _, m_ref = step(state, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh(data=2, model=1, spatial=4,
                     devices=jax.devices()[:8])
    sstate = replicate(state, mesh)
    sbatch = shard_batch(batch, mesh)
    assert "spatial" in str(sbatch["image"].sharding.spec)
    sstep = make_train_step(det, tx, mesh=mesh, donate=False)
    _, m_sp = sstep(sstate, sbatch)

    np.testing.assert_allclose(float(m_ref["total_loss"]),
                               float(m_sp["total_loss"]), rtol=1e-5)


def test_trainer_spatial_partitioning(tmp_path):
    """TPU.MESH_SPATIAL > 1 builds the 3-D mesh inside the TRAINER and
    trains finite with the image height sharded over 'spatial'."""
    import jax
    import numpy as np

    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.engine.trainer import BaseTrainer
    from synthetic import make_coco_json

    gt_json, image_root = make_coco_json(tmp_path, num_images=4,
                                         img_hw=(64, 64))
    name = "synth_sp"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, gt_json, image_root)

    cfg = make_tiny_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = ()
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.TPU.MESH_DATA = 4
    cfg.TPU.MESH_SPATIAL = 2
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    trainer = BaseTrainer(cfg)
    assert trainer.mesh is not None and trainer.mesh.shape["spatial"] == 2
    state = trainer.train()
    assert int(np.asarray(jax.device_get(state.step))) == 2


def test_spatial_partitioning_hlo_guard():
    """Compile (not run) the train step at the REAL eval shape 800x1344 on a
    (data=1, model=1, spatial=8) mesh and assert the partitioned HLO is
    halo-exchange-based: collective-permutes present, and every all-gather
    small (head-reshape edges), i.e. NO full-activation all-gathers — the
    failure mode where GSPMD silently de-shards the backbone (a full stem
    activation at this shape is ~275 MB; the guard allows <= 8 MB).

    Measured on this probe (fp32 CPU lowering, VALIDATION.md round 4):
    ~492 collective-permutes totalling 46.4 MB/step + 4.9 MB of all-gathers
    (max single 1.51 MB) — sub-millisecond on v5e ICI.
    """
    import re

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_cfg
    from slenderobjdet_tpu.engine.train_loop import TrainState, make_train_step
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.parallel import make_mesh, replicate, shard_batch

    cfg = _flagship_cfg(tiny=True)
    det = build_model(cfg)
    H, W, B, G = 800, 1344, 1, 8
    variables = det.init_variables(jax.random.PRNGKey(0), (H, W), B)
    tx = optax.sgd(0.01)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]))
    r = np.random.RandomState(0)
    xy = r.rand(B, G, 2).astype(np.float32) * 300
    wh = r.rand(B, G, 2).astype(np.float32) * 100 + 8
    batch = {
        "image": r.randint(0, 255, (B, H, W, 3)).astype(np.uint8),
        "gt_boxes": np.concatenate([xy, xy + wh], axis=2),
        "gt_classes": r.randint(0, 80, (B, G)).astype(np.int32),
        "gt_valid": np.ones((B, G), bool),
    }
    mesh = make_mesh(data=1, model=1, spatial=8, devices=jax.devices()[:8])
    step = make_train_step(det, tx, mesh=mesh, donate=False)
    txt = step.lower(replicate(state, mesh),
                     shard_batch(batch, mesh)).compile().as_text()

    sizes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
             "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

    def result_bytes(line, op):
        s = line.strip().lstrip("%")
        m = re.match(rf"[\w.\-]*{op}[\w.\-]* = (\w+)\[([\d,]*)\]", s)
        if not m or f"{op}(" not in s:
            return None
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        return n * sizes.get(m.group(1), 4)

    cp = [b for b in (result_bytes(l, "collective-permute")
                      for l in txt.splitlines()) if b is not None]
    ag = [b for b in (result_bytes(l, "all-gather")
                      for l in txt.splitlines()) if b is not None]
    assert len(cp) > 0, "no halo exchanges — spatial axis not partitioned?"
    assert not ag or max(ag) <= 8 * 2 ** 20, (
        f"full-activation all-gather: max {max(ag) / 2**20:.1f} MiB")
    total_mb = (sum(cp) + sum(ag)) / 1e6
    assert total_mb < 200, f"spatial comm blew up: {total_mb:.0f} MB/step"
