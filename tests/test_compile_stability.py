"""Compile-stability guard for multi-scale training (VERDICT r2 #8).

The reference 1x recipe samples shortest-edge 640-800 per iteration
(configs/fcos/Base-Fcos.yaml MIN_SIZE_TRAIN); under jit every distinct input
shape is a fresh XLA compilation, so the mapper buckets every resized image
into exactly two padded shapes (landscape/portrait). This test trains through
enough iterations of a multi-scale mixed-orientation loader to hit both
buckets and asserts the jitted train step compiled EXACTLY once per bucket —
catching any silent recompile storm (a shape leak through gt arrays, scale
tensors, host-float batch fields, etc.).
"""

import os

import numpy as np
import pytest

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


def _cfg(names):
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "FCOS"
    cfg.MODEL.FCOS.NUM_CLASSES = 3
    cfg.MODEL.FCOS.NUM_CONVS = 1
    cfg.DATASETS.TRAIN = tuple(names)
    # multi-scale: several shortest-edge sizes, as in the reference 1x
    # recipe; max size 256 so landscape (128, 256) and portrait (256, 128)
    # pad buckets stay distinct
    cfg.INPUT.MIN_SIZE_TRAIN = (96, 112, 128)
    cfg.INPUT.MAX_SIZE_TRAIN = 256
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT_PER_IMAGE = 10
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.freeze()
    return cfg


def test_multiscale_train_compiles_once_per_bucket(tmp_path):
    import jax
    import optax

    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.build import build_detection_train_loader
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.engine.train_loop import (
        create_train_state, make_train_step)
    from slenderobjdet_tpu.models import build_model
    from synthetic import make_coco_json

    # mixed landscape + portrait images so BOTH orientation buckets occur
    names = []
    for i, hw in enumerate([(120, 160), (160, 120)]):
        json_path, image_root = make_coco_json(
            os.path.join(str(tmp_path), f"d{i}"), num_images=4, img_hw=hw,
            seed=i)
        name = f"multiscale_synth_{i}"
        if name in DatasetCatalog:
            DatasetCatalog.remove(name)
        register_coco_instances(name, json_path, image_root)
        names.append(name)

    cfg = _cfg(names)
    det = build_model(cfg)
    tx = optax.sgd(1e-4)
    state = create_train_state(det, tx, jax.random.PRNGKey(0), (64, 64), 2)
    step = make_train_step(det, tx, donate=False)

    loader = build_detection_train_loader(cfg, seed=3)
    it = iter(loader)
    shapes = set()
    for _ in range(30):
        batch = next(it)
        shapes.add(tuple(np.asarray(batch["image"]).shape))
        model_batch = {
            k: batch[k]
            for k in ("image", "gt_boxes", "gt_classes", "gt_valid")
        }
        state, metrics = step(state, model_batch)
        assert np.isfinite(float(metrics["total_loss"]))

    # the mapper must bucket every multi-scale sample into the two
    # orientation shapes — any third shape is a recompile leak
    assert len(shapes) == 2, shapes
    # and the step must have compiled exactly once per bucket
    assert step._cache_size() == len(shapes), (
        f"train step compiled {step._cache_size()} times "
        f"for {len(shapes)} input buckets")
