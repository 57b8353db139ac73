"""Rotated two-stage path: ROIAlignRotated oracle, RRPN, RROIHeads, and the
end-to-end rotated Faster R-CNN (reference configs/rotated/faster_R_50.yaml:
GeneralizedRCNN + RotatedAnchorGenerator + RRPN + RROIHeads)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model
from slenderobjdet_tpu.ops.roi_align import roi_align
from slenderobjdet_tpu.ops.roi_align_rotated import roi_align_rotated

from test_rotated_model import make_rotated_batch


# ------------------------------------------------------- ROIAlignRotated op
def _np_bilinear(feat, y, x):
    H, W, _ = feat.shape
    y0f, x0f = np.floor(y), np.floor(x)
    ly, lx = y - y0f, x - x0f
    y0 = int(np.clip(y0f, 0, H - 1))
    x0 = int(np.clip(x0f, 0, W - 1))
    y1 = min(y0 + 1, H - 1)
    x1 = min(x0 + 1, W - 1)
    return (feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx)


def _np_roi_align_rotated(feat, rois, scale, P, S):
    """Direct-loop oracle with d2 ROIAlignRotated semantics (see
    ops/roi_align_rotated.py docstring)."""
    out = np.zeros((len(rois), P, P, feat.shape[-1]), np.float32)
    for n, (cx, cy, w, h, ang) in enumerate(np.asarray(rois)):
        ccx, ccy = cx * scale - 0.5, cy * scale - 0.5
        rw, rh = w * scale, h * scale
        th = ang * np.pi / 180.0
        ct, st = np.cos(th), np.sin(th)
        for ph in range(P):
            for pw in range(P):
                acc = np.zeros(feat.shape[-1])
                for iy in range(S):
                    for ix in range(S):
                        yy = -rh / 2 + (ph + (iy + 0.5) / S) * (rh / P)
                        xx = -rw / 2 + (pw + (ix + 0.5) / S) * (rw / P)
                        y = yy * ct - xx * st + ccy
                        x = yy * st + xx * ct + ccx
                        acc += _np_bilinear(feat, y, x)
                out[n, ph, pw] = acc / (S * S)
    return out


def test_roi_align_rotated_oracle(rng):
    feat = rng.randn(14, 11, 3).astype(np.float32)
    rois = np.array(
        [
            [5.0, 6.0, 6.0, 4.0, 0.0],
            [4.5, 7.5, 8.0, 3.0, 30.0],
            [6.0, 5.0, 5.0, 9.0, -60.0],
            [7.0, 7.0, 10.0, 10.0, 120.0],
        ],
        np.float32,
    )
    got = np.asarray(roi_align_rotated(jnp.asarray(feat), jnp.asarray(rois),
                                       spatial_scale=1.0, output_size=4,
                                       sampling_ratio=2))
    want = _np_roi_align_rotated(feat, rois, 1.0, 4, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_roi_align_rotated_angle0_matches_axis_aligned(rng):
    """At angle 0 the rotated op must reduce exactly to aligned RoIAlign on
    the equivalent XYXY box."""
    feat = jnp.asarray(rng.randn(16, 16, 4).astype(np.float32))
    cxcywh = np.array([[8.0, 7.0, 6.0, 5.0], [5.0, 9.0, 7.5, 3.5]], np.float32)
    rrois = jnp.asarray(np.concatenate(
        [cxcywh, np.zeros((2, 1), np.float32)], axis=1))
    xyxy = jnp.asarray(np.stack([
        cxcywh[:, 0] - cxcywh[:, 2] / 2, cxcywh[:, 1] - cxcywh[:, 3] / 2,
        cxcywh[:, 0] + cxcywh[:, 2] / 2, cxcywh[:, 1] + cxcywh[:, 3] / 2,
    ], axis=1))
    a = np.asarray(roi_align_rotated(feat, rrois, 0.5, 7, 2))
    b = np.asarray(roi_align(feat, xyxy, 0.5, 7, 2))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_roi_align_rotated_chunked_matches_unchunked(rng):
    feat = jnp.asarray(rng.randn(12, 12, 2).astype(np.float32))
    rois = jnp.asarray(
        np.column_stack([
            rng.rand(9) * 8 + 2, rng.rand(9) * 8 + 2,
            rng.rand(9) * 6 + 2, rng.rand(9) * 6 + 2,
            rng.rand(9) * 180 - 90,
        ]).astype(np.float32))
    a = np.asarray(roi_align_rotated(feat, rois, 1.0, 4, 2, roi_chunk=4))
    b = np.asarray(roi_align_rotated(feat, rois, 1.0, 4, 2, roi_chunk=128))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_rotated_fused_matches_all_level_path(rng):
    """multilevel_roi_align_rotated_fused (single flattened-level gather,
    inference hot path) must match the pool-every-level path up to fp
    reduction order."""
    import jax.numpy as jnp

    from slenderobjdet_tpu.ops.roi_align_rotated import (
        multilevel_roi_align_rotated,
        multilevel_roi_align_rotated_fused,
    )

    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(64 // s, 80 // s, 6).astype(np.float32))
             for s in strides]
    n = 37
    rois = jnp.asarray(np.column_stack([
        rng.rand(n) * 200 + 20, rng.rand(n) * 150 + 20,   # cx, cy
        rng.rand(n) * 500 + 4, rng.rand(n) * 500 + 4,     # w, h (all levels)
        rng.rand(n) * 360 - 180,                          # angle
    ]).astype(np.float32))

    want = np.asarray(multilevel_roi_align_rotated(
        feats, strides, rois, output_size=7))
    got = np.asarray(multilevel_roi_align_rotated_fused(
        feats, strides, rois, output_size=7, roi_chunk=16))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    feats16 = [f.astype(jnp.bfloat16) for f in feats]
    want16 = np.asarray(multilevel_roi_align_rotated(
        feats16, strides, rois, output_size=7))
    got16 = np.asarray(multilevel_roi_align_rotated_fused(
        feats16, strides, rois, output_size=7, roi_chunk=16))
    np.testing.assert_allclose(got16, want16, rtol=1e-4, atol=1e-4)


def test_clip_rotated_boxes_semantics():
    from slenderobjdet_tpu.models.proposal_generator.rrpn import (
        clip_rotated_boxes,
    )

    boxes = jnp.asarray([
        [-2.0, 5.0, 10.0, 4.0, 0.0],     # horizontal: clipped
        [-2.0, 5.0, 10.0, 4.0, 45.0],    # rotated: untouched
        [5.0, 5.0, 4.0, 4.0, 270.0],     # angle normalized to -90
    ])
    out = np.asarray(clip_rotated_boxes(boxes, 20.0, 20.0))
    # box 0: x1 = -7 -> 0, x2 = 3 -> cx 1.5, w 3
    np.testing.assert_allclose(out[0], [1.5, 5.0, 3.0, 4.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [-2.0, 5.0, 10.0, 4.0, 45.0], atol=1e-6)
    assert out[2][4] == pytest.approx(-90.0)


# -------------------------------------------------------- end-to-end model
@pytest.fixture(scope="module")
def tiny_rotated_rcnn():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RRPN"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[45, 0, -45]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0)
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 50
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.NAME = "RROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    cfg.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignRotated"
    cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 5.0, 5.0, 5.0, 1.0)
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return det, variables


@pytest.mark.slow
def test_rotated_rcnn_is_rotated(tiny_rotated_rcnn):
    det, variables = tiny_rotated_rcnn
    assert det.rotated
    # 5-dim RPN regression and 5-dim class-specific ROI regression
    ad = variables["params"]["rpn_head"]["anchor_deltas"]["kernel"]
    assert ad.shape[-1] == det.rpn.num_cell_anchors * 5
    bp = variables["params"]["roi_box"]["outputs"]["bbox_pred"]["kernel"]
    assert bp.shape[-1] == det.roi_heads.num_classes * 5


@pytest.mark.slow
def test_rotated_rcnn_loss_and_grads(tiny_rotated_rcnn):
    det, variables = tiny_rotated_rcnn
    batch = make_rotated_batch(B=1, G=6)
    batch["rng"] = jax.random.PRNGKey(3)

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"):
        assert np.isfinite(float(metrics[k])), k
    # gradients reach both the rotated RPN head and the rotated box head
    g_rpn = float(jnp.abs(
        grads["rpn_head"]["anchor_deltas"]["kernel"]).sum())
    g_roi = float(jnp.abs(
        grads["roi_box"]["outputs"]["bbox_pred"]["kernel"]).sum())
    assert g_rpn > 0 and g_roi > 0


@pytest.mark.slow
def test_rotated_rcnn_predict(tiny_rotated_rcnn):
    det, variables = tiny_rotated_rcnn
    batch = make_rotated_batch(B=1, G=6)
    out = det.predict(variables, batch)
    assert out["boxes"].shape == (1, det.max_dets, 5)
    assert out["proposals"].shape[-1] == 5
    assert np.isfinite(np.asarray(out["boxes"])).all()
    assert np.isfinite(np.asarray(out["proposals"])).all()


@pytest.mark.slow
def test_rrpn_zero_delta_identity(tiny_rotated_rcnn):
    """Zero deltas must decode every proposal to its (clipped) anchor."""
    det, _ = tiny_rotated_rcnn
    hw = (64, 64)
    anchors_np, counts = det.rpn.anchor_spec.anchors(hw)
    n = anchors_np.shape[0]
    rs = np.random.RandomState(0)
    logits = jnp.asarray(rs.randn(1, n).astype(np.float32))
    deltas = jnp.zeros((1, n, 5))
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    pb, ps, pv = det.rpn.proposals(anchors_np, counts, logits, deltas,
                                   sizes, train=False)
    from slenderobjdet_tpu.models.proposal_generator.rrpn import (
        clip_rotated_boxes,
    )

    clipped = np.asarray(clip_rotated_boxes(jnp.asarray(anchors_np),
                                            64.0, 64.0))
    pb, pv = np.asarray(pb[0]), np.asarray(pv[0])
    rows = {tuple(np.round(r, 3)) for r in clipped}
    for box, ok in zip(pb, pv):
        if ok:
            assert tuple(np.round(box, 3)) in rows


@pytest.mark.slow
def test_reference_rotated_faster_configs_build():
    """The reference rotated two-stage YAMLs build the rotated model (they
    previously silently built an axis-aligned one)."""
    import os

    from slenderobjdet_tpu.config import get_cfg

    for path in (
        "/root/reference/configs/rotated/faster_R_50.yaml",
        "configs/rotated/faster_rcnn_rotated_R_50_FPN_1x.yaml",
    ):
        if not os.path.exists(path):
            continue
        cfg = get_cfg()
        cfg.merge_from_file(path)
        cfg.MODEL.RESNETS.DEPTH = 18
        cfg.freeze()
        det = build_model(cfg)
        assert det.rotated, path
        assert type(det.roi_heads).__name__ == "RotatedROIHeads"


@pytest.mark.slow
def test_rotated_rcnn_converges_on_fixed_batch():
    """The rotated two-stage family trains end-to-end: total loss on one
    fixed synthetic batch drops and stays finite."""
    import optax
    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.engine.train_loop import TrainState, make_train_step

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RRPN"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[45, 0, -45]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0)
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.ROI_HEADS.NAME = "RROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignRotated"
    cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 5.0, 5.0, 5.0, 1.0)
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    tx = optax.sgd(1e-3, momentum=0.9)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(det, tx, donate=False)
    batch = make_rotated_batch(B=1, G=6)
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses[-5:]
    assert losses[-1] < losses[0], (losses[0], losses[-1])
