"""RotatedRetinaNet + rotated data/eval path, end-to-end on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


def make_rotated_batch(B=1, H=64, W=64, G=6, seed=0):
    r = np.random.RandomState(seed)
    cx = r.rand(B, G).astype(np.float32) * 40 + 10
    cy = r.rand(B, G).astype(np.float32) * 40 + 10
    w = r.rand(B, G).astype(np.float32) * 20 + 6
    h = r.rand(B, G).astype(np.float32) * 10 + 3
    a = r.rand(B, G).astype(np.float32) * 90 - 45
    rboxes = np.stack([cx, cy, w, h, a], axis=-1)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    return {
        "image": jnp.asarray(r.randint(0, 255, (B, H, W, 3)), jnp.uint8),
        "gt_boxes": jnp.asarray(boxes),
        "gt_rboxes": jnp.asarray(rboxes),
        "gt_classes": jnp.asarray(r.randint(0, 80, (B, G)), jnp.int32),
        "gt_valid": jnp.ones((B, G), bool),
        "scale": jnp.ones((B,), jnp.float32),
        "orig_size": jnp.array([[H, W]] * B, jnp.float32),
    }


@pytest.fixture(scope="module")
def tiny_rotated():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RotatedRetinaNet"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[-45, 0, 45]]
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return det, variables


def test_rotated_anchor_generation(tiny_rotated):
    det, _ = tiny_rotated
    anchors, counts = det.anchor_spec.anchors((64, 64))
    assert counts[0] == 8 * 8 * 6  # 1 size * 2 ratios * 3 angles
    assert anchors.shape[1] == 5
    angles = np.unique(anchors[:, 4])
    np.testing.assert_array_equal(np.sort(angles), [-45, 0, 45])


def test_rotated_loss_and_grads(tiny_rotated):
    det, variables = tiny_rotated
    batch = make_rotated_batch()

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert float(metrics["num_pos"]) > 0
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(g) and g > 0


def test_rotated_predict(tiny_rotated):
    det, variables = tiny_rotated
    batch = make_rotated_batch()
    out = det.predict(variables, batch)
    assert out["boxes"].shape == (1, det.max_dets, 5)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_rotated_evaluator_oracle(tmp_path):
    """gt echoed as rotated predictions through RotatedCOCOEvaluator -> AP 100."""
    import sys

    sys.path.insert(0, "tests")
    from synthetic import make_coco_json

    from slenderobjdet_tpu.data import DatasetCatalog, build_detection_test_loader
    from slenderobjdet_tpu.data.datasets import register_rotated_coco_instances
    from slenderobjdet_tpu.evaluation.rotated_evaluation import RotatedCOCOEvaluator
    from slenderobjdet_tpu.config import get_cfg

    json_path, image_root = make_coco_json(tmp_path, num_images=4, slender=True)
    name = "rot_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_rotated_coco_instances(name, json_path, image_root)

    dicts = DatasetCatalog.get(name)
    assert all("rbox" in a for d in dicts for a in d["annotations"])

    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.TPU.MAX_GT_PER_IMAGE = 10
    loader = build_detection_test_loader(cfg, name, batch_size=2)
    evaluator = RotatedCOCOEvaluator(name)

    D = 10
    for batch in loader:
        B = batch["image"].shape[0]
        boxes = np.zeros((B, D, 5), np.float32)
        scores = np.zeros((B, D), np.float32)
        classes = np.zeros((B, D), np.int32)
        valid = np.zeros((B, D), bool)
        for i in range(B):
            n = int(batch["gt_valid"][i].sum())
            boxes[i, :n] = batch["gt_rboxes"][i, :n]
            boxes[i, :n, :4] /= batch["scale"][i]
            classes[i, :n] = batch["gt_classes"][i, :n]
            scores[i, :n] = 0.9
            valid[i, :n] = True
        evaluator.process(batch, {"boxes": boxes, "scores": scores,
                                  "classes": classes, "valid": valid})
    results = evaluator.evaluate()
    assert results["bbox"]["AP50"] == pytest.approx(100.0, abs=1.0)
    assert results["bbox"]["AP"] == pytest.approx(100.0, abs=1.0)


def test_rotated_retinanet_converges_on_fixed_batch():
    """Training-convergence evidence for the rotated family: a tiny
    RotatedRetinaNet overfits one synthetic rotated batch — loss drops
    well below its starting point and stays finite (the 5-param
    Box2BoxTransformRotated deltas + rotated IoU matching train
    end-to-end)."""
    import optax
    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.engine.train_loop import TrainState, make_train_step

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RotatedRetinaNet"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[-45, 0, 45]]
    cfg.MODEL.RESNETS.NORM = "GN"  # from-scratch training needs a real norm
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    tx = optax.sgd(2e-3, momentum=0.9)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(det, tx, donate=False)
    batch = make_rotated_batch(B=2, G=6)
    losses = []
    for _ in range(60):
        state, m = step(state, batch)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses[-5:]
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
