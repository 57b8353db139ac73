"""End-to-end trainer smoke test on CPU: train_net.py main() on a synthetic
dataset for a handful of iterations, then eval-only from the checkpoint."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from synthetic import make_coco_json

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trainer_env(tmp_path_factory):
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances

    tmpdir = tmp_path_factory.mktemp("trainerdata")
    json_path, image_root = make_coco_json(tmpdir, num_images=4)
    name = "trainer_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, json_path, image_root)
    return name, str(tmpdir)


def _cfg(name, outdir):
    from slenderobjdet_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone_use_p5"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FCOS.NUM_CLASSES = 3
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT_PER_IMAGE = 10
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 6
    cfg.SOLVER.CHECKPOINT_PERIOD = 6
    cfg.SOLVER.BASE_LR = 0.001
    cfg.OUTPUT_DIR = os.path.join(outdir, "output")
    cfg.freeze()
    return cfg


def test_trainer_train_and_eval(trainer_env):
    name, outdir = trainer_env
    from slenderobjdet_tpu.engine.trainer import BaseTrainer, default_setup

    cfg = _cfg(name, outdir)
    default_setup(cfg)
    trainer = BaseTrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()

    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
    assert trainer.checkpointer.has_checkpoint()

    # resume path restores the iteration counter
    trainer2 = BaseTrainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == 6

    results = trainer2.test()
    assert name in results
    assert "bbox" in results[name]


def test_profiler_trace_window(tmp_path):
    """TPU.PROFILE_START_ITER enables a jax.profiler trace window during
    training (the tracing/profiling aux subsystem, SURVEY §5)."""
    import glob

    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.engine.trainer import BaseTrainer
    from synthetic import make_coco_json

    gt_json, image_root = make_coco_json(tmp_path, num_images=2,
                                         img_hw=(64, 64))
    name = "synth_profile"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, gt_json, image_root)

    cfg = make_tiny_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = ()
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.IMS_PER_BATCH = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.TPU.PROFILE_START_ITER = 1
    cfg.TPU.PROFILE_NUM_ITERS = 2
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    trainer = BaseTrainer(cfg)
    trainer.train()
    traces = glob.glob(str(tmp_path / "out" / "profile" / "**" / "*.pb"),
                       recursive=True) + glob.glob(
        str(tmp_path / "out" / "profile" / "**" / "*.json.gz"),
        recursive=True)
    assert traces, "no profiler artifacts written"


def test_eval_with_tta(tmp_path):
    """TEST.AUG.ENABLED routes BaseTrainer.test() through the TTA path
    (reference train_net.py:128-142), ending in real evaluator metrics."""
    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.engine.trainer import BaseTrainer
    from synthetic import make_coco_json

    gt_json, image_root = make_coco_json(tmp_path, num_images=2,
                                         img_hw=(64, 64))
    name = "synth_tta_eval"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, gt_json, image_root)

    cfg = make_tiny_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.SOLVER.MAX_ITER = 1
    cfg.SOLVER.IMS_PER_BATCH = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 64
    cfg.TEST.AUG.FLIP = True
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    trainer = BaseTrainer(cfg)
    results = trainer.test()
    assert name in results and "bbox" in results[name]
