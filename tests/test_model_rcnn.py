import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model

from test_model_fcos import make_batch

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_rcnn():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "ProposalVisibleRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    cfg.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return det, variables


def test_rcnn_loss_and_grads(tiny_rcnn):
    det, variables = tiny_rcnn
    batch = make_batch()
    batch["rng"] = jax.random.PRNGKey(3)
    batch["image_size"] = jnp.array([[64, 64]], jnp.int32)

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"):
        assert np.isfinite(float(metrics[k])), k
    # roi box head got gradients
    roi_g = jax.tree_util.tree_leaves(grads["roi_box"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in roi_g)
    # rpn head got gradients
    rpn_g = jax.tree_util.tree_leaves(grads["rpn_head"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in rpn_g)


def test_rcnn_predict_shapes(tiny_rcnn):
    det, variables = tiny_rcnn
    batch = make_batch()
    batch["image_size"] = jnp.array([[64, 64]], jnp.int32)
    out = jax.jit(det.predict)(variables, batch)
    D = det.max_dets
    assert out["boxes"].shape == (1, D, 4)
    assert out["proposals"].shape == (1, 50, 4)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    assert np.isfinite(np.asarray(out["proposals"])).all()
    # untrained RPN still proposes (objectness random) - proposals valid
    assert int(np.asarray(out["proposal_valid"]).sum()) > 0


def test_rcnn_fewer_candidates_than_roi_batch():
    """BATCH_SIZE_PER_IMAGE may exceed the candidate pool
    (POST_NMS_TOPK_TRAIN + padded gt): sample_proposals must clamp instead
    of emitting mismatched rows/row_valid shapes (regression: broadcast
    error at roi_heads.py sample_proposals with POST_NMS_TOPK_TRAIN=32,
    batch 64)."""
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "ProposalVisibleRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    cfg.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64   # > 32 + 8 gt rows
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()
    batch["rng"] = jax.random.PRNGKey(3)
    total, metrics = jax.jit(det.loss)(variables, batch)
    assert np.isfinite(float(total))
