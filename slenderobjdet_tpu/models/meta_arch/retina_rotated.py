"""Rotated RetinaNet (5-parameter XYWHA boxes), TPU-native.

Counterpart of the reference's rotated detector
(`slender_det/modeling/meta_arch/retina/retina_rotated.py:37-474`: RetinaNet
head regressing Box2BoxTransformRotated deltas over rotated anchors) — the
reference class isn't importable upstream (name clash, SURVEY.md §2.5); here
it is registered as "RotatedRetinaNet".

Anchors: sizes x aspect_ratios x ANCHOR_GENERATOR.ANGLES per level
(d2 RotatedAnchorGenerator). Matching uses the exact rotated IoU
(ops/rotated.py); inference decodes rotated deltas and applies rotated NMS.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.rotated import (
    apply_rotated_deltas,
    get_rotated_deltas,
    pairwise_rotated_iou,
    rotated_nms,
)
from ..anchors import (  # noqa: F401  (re-exported: historical home)
    RotatedAnchorGeneratorSpec,
    rotated_cell_anchors,
)
from ..backbones.fpn import build_backbone
from .retinanet import RetinaNetHead


def rotated_label_anchors(anchors, gt_rboxes, gt_classes, gt_valid,
                          thresholds, labels, num_classes):
    """Per-image labeling with exact rotated IoU + low-quality matching."""
    iou = pairwise_rotated_iou(gt_rboxes, anchors)          # (G, N)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_vals = jnp.max(iou, axis=0)
    matched_idx = jnp.argmax(iou, axis=0).astype(jnp.int32)

    out = jnp.full(matched_vals.shape, labels[0], jnp.int8)
    for lo, lab in zip(list(thresholds), labels[1:]):
        out = jnp.where(matched_vals >= lo, jnp.int8(lab), out)

    highest = jnp.max(iou, axis=1, keepdims=True)
    lq = jnp.any((iou == highest) & gt_valid[:, None] & (highest > 0), axis=0)
    out = jnp.where(lq, jnp.int8(labels[-1]), out)
    out = jnp.where(jnp.any(gt_valid), out, jnp.int8(labels[0]))

    cls = jnp.where(out == 1, gt_classes[matched_idx], num_classes)
    cls = jnp.where(out == -1, -1, cls)
    return cls.astype(jnp.int32), gt_rboxes[matched_idx]


class RotatedRetinaNetModule(nn.Module):
    backbone: nn.Module
    head: RetinaNetHead
    in_features: Tuple[str, ...]
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    dtype: Any = jnp.float32

    def __call__(self, images):
        x = images.astype(jnp.float32)
        x = (x - jnp.asarray(self.pixel_mean)) / jnp.asarray(self.pixel_std)
        x = x.astype(self.dtype)
        feats = self.backbone(x)
        return self.head([feats[f] for f in self.in_features])


class RotatedRetinaNet:
    def __init__(self, cfg):
        self.cfg = cfg
        self.int8_predict = cfg.TPU.INT8_PREDICT
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        r = cfg.MODEL.RETINANET
        self.num_classes = r.NUM_CLASSES
        self.in_features = list(r.IN_FEATURES)
        self.focal_alpha = r.FOCAL_LOSS_ALPHA
        self.focal_gamma = r.FOCAL_LOSS_GAMMA
        self.smooth_l1_beta = r.SMOOTH_L1_LOSS_BETA
        self.iou_thresholds = list(r.IOU_THRESHOLDS)
        self.iou_labels = list(r.IOU_LABELS)
        self.score_thresh = r.SCORE_THRESH_TEST
        self.topk_candidates = r.TOPK_CANDIDATES_TEST
        self.nms_thresh = r.NMS_THRESH_TEST
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
        w = r.BBOX_REG_WEIGHTS
        self.box_reg_weights = tuple(w) + (1.0,) * (5 - len(w))

        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        strides = [spec.strides[f] for f in self.in_features]
        self.anchor_spec = RotatedAnchorGeneratorSpec(cfg, strides)
        num_anchors = self.anchor_spec.num_cell_anchors[0]

        self.module = RotatedRetinaNetModule(
            backbone=spec.module,
            head=RotatedHead(
                num_classes=self.num_classes, num_anchors=num_anchors,
                num_convs=r.NUM_CONVS, prior_prob=r.PRIOR_PROB, dtype=dtype,
            ),
            in_features=tuple(self.in_features),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            dtype=dtype,
        )

    def init_variables(self, rng, image_hw=(128, 128), batch_size=1):
        del image_hw, batch_size
        return jax.jit(self.module.init)(
            rng, jnp.zeros((1, 128, 128, 3), jnp.float32)
        )

    def loss(self, variables, batch):
        images = batch["image"]
        anchors_np, _ = self.anchor_spec.anchors(images.shape[1:3])
        anchors = jnp.asarray(anchors_np)

        from ..layers import apply_train

        (logits_l, regs_l), updated_buffers = apply_train(
            self.module, variables, images)
        logits = jnp.concatenate(logits_l, axis=1)
        regs = jnp.concatenate(regs_l, axis=1)

        gt_rboxes = batch["gt_rboxes"]
        gt_labels, matched = jax.vmap(
            partial(rotated_label_anchors, thresholds=self.iou_thresholds,
                    labels=self.iou_labels, num_classes=self.num_classes),
            in_axes=(None, 0, 0, 0),
        )(anchors, gt_rboxes, batch["gt_classes"], batch["gt_valid"])

        valid = gt_labels >= 0
        fg = valid & (gt_labels < self.num_classes)
        num_fg = jnp.maximum(jnp.sum(fg), 1.0)

        onehot = jax.nn.one_hot(gt_labels, self.num_classes, dtype=jnp.float32)
        cls_loss = jnp.sum(
            jnp.where(valid[..., None],
                      sigmoid_focal_loss(logits, onehot, self.focal_alpha,
                                         self.focal_gamma), 0.0)
        ) / num_fg

        safe = jnp.where(fg[..., None], matched,
                         anchors[None] + jnp.asarray([1., 1., 0., 0., 0.]))
        tgt = get_rotated_deltas(
            jnp.broadcast_to(anchors[None], safe.shape), safe,
            weights=self.box_reg_weights)
        reg = smooth_l1_loss(regs, tgt, self.smooth_l1_beta)
        reg_loss = jnp.sum(jnp.where(fg[..., None], reg, 0.0)) / num_fg

        metrics = {
            "loss_cls": cls_loss, "loss_box_reg": reg_loss, "num_pos": num_fg,
        }
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return cls_loss + reg_loss, metrics

    def predict(self, variables, batch):
        images = batch["image"]
        anchors_np, counts = self.anchor_spec.anchors(images.shape[1:3])
        from ...ops.quant import int8_predict_scope
        with int8_predict_scope(self.int8_predict):
            logits_l, regs_l = self.module.apply(variables, images)

        offsets = np.concatenate([[0], np.cumsum(counts)])
        cb, cs, cc, cv = [], [], [], []
        for lvl in range(len(counts)):
            lvl_anchors = jnp.asarray(anchors_np[offsets[lvl]: offsets[lvl + 1]])
            logits, regs = logits_l[lvl], regs_l[lvl]
            from ...ops.topk import pair_top_k

            scores = jax.nn.sigmoid(logits.astype(jnp.float32))  # (B, N, C)
            top_scores, a_idx, cls_idx = pair_top_k(
                scores, self.topk_candidates, approx=False)
            sel = jnp.take_along_axis(regs, a_idx[..., None], axis=1)
            boxes = apply_rotated_deltas(sel, lvl_anchors[a_idx],
                                         weights=self.box_reg_weights)
            cb.append(boxes)
            cs.append(top_scores)
            cc.append(cls_idx)
            cv.append(top_scores > self.score_thresh)

        boxes = jnp.concatenate(cb, axis=1)
        scores = jnp.concatenate(cs, axis=1)
        classes = jnp.concatenate(cc, axis=1)
        valid = jnp.concatenate(cv, axis=1)

        # class-aware rotated NMS via center-offset trick
        def one(bx, sc, cl, vl, scale):
            off = cl.astype(bx.dtype) * 4096.0
            shifted = bx.at[:, 0].add(off).at[:, 1].add(off)
            keep_idx, keep_valid = rotated_nms(
                shifted, sc, self.nms_thresh, self.max_dets, valid=vl
            )
            kb = bx[keep_idx]
            kb = kb.at[:, :4].set(kb[:, :4] / scale)
            return kb, sc[keep_idx], cl[keep_idx], keep_valid

        ob, os_, oc, ov = jax.vmap(one)(
            boxes, scores, classes, valid, batch["scale"].astype(jnp.float32)
        )
        return {"boxes": ob, "scores": os_, "classes": oc, "valid": ov}


class RotatedHead(RetinaNetHead):
    """RetinaNet head with 5-channel (XYWHA-delta) regression."""

    @nn.compact
    def __call__(self, feats):
        c = feats[0].shape[-1]
        init = nn.initializers.normal(stddev=0.01)
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob)
        )
        cls_subnet = [
            nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=init,
                    name=f"cls_subnet{i}")
            for i in range(self.num_convs)
        ]
        bbox_subnet = [
            nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=init,
                    name=f"bbox_subnet{i}")
            for i in range(self.num_convs)
        ]
        cls_score = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                            padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=init,
                            bias_init=bias_init, name="cls_score")
        bbox_pred = nn.Conv(self.num_anchors * 5, (3, 3), padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=init, name="bbox_pred")
        logits, regs = [], []
        for feat in feats:
            b, h, w, _ = feat.shape
            ct, bt = feat, feat
            for conv in cls_subnet:
                ct = nn.relu(conv(ct))
            for conv in bbox_subnet:
                bt = nn.relu(conv(bt))
            logits.append(cls_score(ct).astype(jnp.float32)
                          .reshape(b, h * w * self.num_anchors, self.num_classes))
            regs.append(bbox_pred(bt).astype(jnp.float32)
                        .reshape(b, h * w * self.num_anchors, 5))
        return logits, regs
