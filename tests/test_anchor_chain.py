"""Anchor-diagnosis chain tests: source anchors must survive topk -> NMS ->
final outputs -> evaluator dump, end to end (reference
proposal_utils.py:11-130, fast_rcnn.py:109-115, retinanetwa.py:88-154,
coco_evaluation_with_anchors.py:28-159)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model

from test_model_fcos import make_batch

# full-tier: heavy oracle/convergence coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


def _rcnn_cfg(meta_arch="ProposalVisibleRCNNWithAnchor"):
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = meta_arch
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    cfg.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def tiny_rcnn_wa():
    cfg = _rcnn_cfg()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return det, variables


def _clipped_grid(anchors_np, h, w):
    g = anchors_np.copy()
    g[:, 0::2] = g[:, 0::2].clip(0, w)
    g[:, 1::2] = g[:, 1::2].clip(0, h)
    return g


def _assert_rows_in_grid(rows, grid, atol=1e-3):
    """every row (N,4) must be a member of grid (M,4)."""
    d = np.abs(rows[:, None, :] - grid[None, :, :]).max(-1)  # (N, M)
    assert (d.min(1) < atol).all(), d.min(1).max()


def test_rpn_proposals_carry_source_anchors(tiny_rcnn_wa):
    """With zero deltas, each kept proposal IS its source anchor (clipped),
    so the returned anchor must equal the proposal — and both must be actual
    rows of the anchor grid."""
    det, _ = tiny_rcnn_wa
    h = w = 64
    anchors_np, counts = det.rpn.anchor_spec.anchors((h, w))
    N = anchors_np.shape[0]
    r = np.random.RandomState(0)
    logits = jnp.asarray(r.randn(1, N).astype(np.float32))
    deltas = jnp.zeros((1, N, 4), jnp.float32)
    sizes = jnp.array([[h, w]], jnp.int32)

    pb, ps, pv, pa = det.rpn.proposals(
        anchors_np, counts, logits, deltas, sizes, train=False,
        with_anchors=True,
    )
    pb, pv, pa = np.asarray(pb[0]), np.asarray(pv[0]), np.asarray(pa[0])
    assert pv.sum() > 0
    np.testing.assert_allclose(pa[pv], pb[pv], atol=1e-4)
    _assert_rows_in_grid(pa[pv], _clipped_grid(anchors_np, h, w))


def test_rcnn_with_anchor_outputs(tiny_rcnn_wa):
    """ProposalVisibleRCNNWithAnchor predict() must expose proposal_anchors
    (per proposal) and anchors/det_proposals (per detection), all traceable
    to the static anchor grid."""
    det, variables = tiny_rcnn_wa
    batch = make_batch()
    batch["image_size"] = jnp.array([[64, 64]], jnp.int32)
    out = jax.jit(det.predict)(variables, batch)
    for key in ("proposal_anchors", "anchors", "det_proposals"):
        assert key in out, key

    anchors_np, _ = det.rpn.anchor_spec.anchors((64, 64))
    grid = _clipped_grid(anchors_np, 64, 64)

    pv = np.asarray(out["proposal_valid"][0])
    pa = np.asarray(out["proposal_anchors"][0])  # scale=1: original coords
    assert pv.sum() > 0
    _assert_rows_in_grid(pa[pv], grid)

    dv = np.asarray(out["valid"][0])
    if dv.sum() > 0:
        da = np.asarray(out["anchors"][0])[dv]
        _assert_rows_in_grid(da, grid)
        # each detection's source proposal must be one of the RPN proposals
        dp = np.asarray(out["det_proposals"][0])[dv]
        props = np.asarray(out["proposals"][0])[pv]
        _assert_rows_in_grid(dp, props, atol=1e-3)


def test_plain_rcnn_has_no_anchor_fields():
    cfg = _rcnn_cfg("ProposalVisibleRCNN")
    det = build_model(cfg)
    assert not det.with_anchor


def test_retinanet_with_anchor():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNetWithAnchor"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
        [x, x * 2 ** (1.0 / 3), x * 2 ** (2.0 / 3)]
        for x in [32, 64, 128, 256, 512]
    ]
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = 0.0  # untrained: keep all topk
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()
    out = jax.jit(det.predict)(variables, batch)
    assert "anchors" in out
    v = np.asarray(out["valid"][0])
    assert v.sum() > 0
    anchors_np, _ = det._anchors((64, 64))
    _assert_rows_in_grid(np.asarray(out["anchors"][0])[v],
                         _clipped_grid(anchors_np, 64, 64))


def test_fcos_with_anchor(tiny_fcos):
    """FCOSWithAnchor attaches the source location as a degenerate (x,y,x,y)
    box (fcoswa.py:68-76)."""
    det, variables = tiny_fcos
    det.with_anchor = True
    try:
        batch = make_batch()
        out = jax.jit(det.predict)(variables, batch)
        assert "anchors" in out
        v = np.asarray(out["valid"][0])
        if v.sum() > 0:
            a = np.asarray(out["anchors"][0])[v]
            np.testing.assert_allclose(a[:, :2], a[:, 2:], atol=1e-5)
            locs, _ = det._locations((64, 64))
            d = np.abs(a[:, None, :2] - locs[None]).max(-1)
            assert (d.min(1) < 1e-3).all()
    finally:
        det.with_anchor = False


def test_evaluator_with_anchors_pkl_roundtrip(tmp_path):
    """An anchor injected at the model-output boundary must come back
    bit-identical from box_proposals.pkl (reference pkl schema
    coco_evaluation_with_anchors.py:45-51) and as the per-detection
    "anchor" field of the instance json (XYWH)."""
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.evaluation import COCOEvaluatorWithAnchors
    from synthetic import make_coco_json

    json_path, image_root = make_coco_json(tmp_path, num_images=2)
    name = "synth_anchor_chain"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, json_path, image_root)

    out_dir = str(tmp_path / "out")
    ev = COCOEvaluatorWithAnchors(name, output_dir=out_dir)

    K, D = 5, 3
    r = np.random.RandomState(0)
    props = r.rand(2, K, 4).astype(np.float32) * 50
    props[..., 2:] += props[..., :2] + 5
    panchors = props + 1.5  # distinct, recognizable
    det_boxes = r.rand(2, D, 4).astype(np.float32) * 50
    det_boxes[..., 2:] += det_boxes[..., :2] + 5
    det_anchors = det_boxes + 2.5
    outputs = {
        "boxes": det_boxes,
        "scores": np.linspace(0.9, 0.5, D)[None].repeat(2, 0),
        "classes": np.zeros((2, D), np.int32),
        "valid": np.ones((2, D), bool),
        "anchors": det_anchors,
        "proposals": props,
        "proposal_scores": r.rand(2, K).astype(np.float32),
        "proposal_valid": np.ones((2, K), bool),
        "proposal_anchors": panchors,
    }
    batch = {"image_id": np.array([1, 2])}
    ev.process(batch, outputs)
    ev.evaluate()

    with open(os.path.join(out_dir, "box_proposals.pkl"), "rb") as f:
        data = pickle.load(f)
    assert set(data) == {"boxes", "anchors", "objectness_logits", "ids",
                         "bbox_mode"}
    assert data["ids"] == [1, 2]
    np.testing.assert_allclose(data["anchors"][0], panchors[0], atol=1e-6)
    np.testing.assert_allclose(data["boxes"][1], props[1], atol=1e-6)

    # per-detection anchor in the instance json, XYWH like the reference
    inst = ev._predictions[0]["instances"][0]  # highest score first
    x1, y1, x2, y2 = det_anchors[0, 0]
    np.testing.assert_allclose(
        inst["anchor"], [x1, y1, x2 - x1, y2 - y1], atol=1e-5
    )
