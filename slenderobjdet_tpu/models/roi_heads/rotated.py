"""Rotated ROI heads (RROIHeads), TPU-native.

Counterpart of detectron2's RROIHeads (rotated_fast_rcnn.py), selected by
the reference's rotated two-stage configs via ROI_HEADS.NAME "RROIHeads"
(`configs/rotated/Base-RRCNN-FPN.yaml`, `configs/submit/test_dev.yaml`).
StandardROIHeads (roi_heads.py) with the d2 rotated substitutions:

- proposal/gt matching: exact rotated IoU through the same Matcher
- pooling: ROIAlignRotated (ops/roi_align_rotated.py), POOLER_TYPE parity
- regression: Box2BoxTransformRotated, 5-dim class-specific deltas with
  ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10, 5, 5, 5, 1)
- inference: fast_rcnn_inference_rotated — softmax scores, per-class rotated
  NMS (center-offset trick), rotated clip before NMS
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from ...ops.losses import smooth_l1_loss
from ...ops.roi_align_rotated import (
    multilevel_roi_align_rotated,
    multilevel_roi_align_rotated_fused,
)
from ...ops.rotated import (
    apply_rotated_deltas,
    get_rotated_deltas,
    pairwise_rotated_iou,
    rotated_nms,
)
from ..matchers import iou_matcher
from ..sampling import subsample_labels
from .roi_heads import StandardROIHeads


def sample_rotated_proposals(
    rng,
    proposals: jnp.ndarray,      # (R, 5) XYWHA
    prop_valid: jnp.ndarray,     # (R,)
    gt_boxes: jnp.ndarray,       # (G, 5)
    gt_classes: jnp.ndarray,     # (G,)
    gt_valid: jnp.ndarray,       # (G,)
    num_samples: int,
    positive_fraction: float,
    iou_thresholds: Sequence[float],
    iou_labels: Sequence[int],
    num_classes: int,
    append_gt: bool = True,
):
    """d2 RROIHeads.label_and_sample_proposals, masked (same packing scheme
    as roi_heads.sample_proposals, rotated IoU)."""
    if append_gt:
        proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
        prop_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    matched_idx, match_labels = iou_matcher(
        proposals, gt_boxes, gt_valid, iou_thresholds, iou_labels,
        allow_low_quality_matches=False, pairwise_fn=pairwise_rotated_iou,
    )
    pos = (match_labels == 1) & prop_valid
    neg = (match_labels == 0) & prop_valid
    sel_pos, sel_neg = subsample_labels(
        rng, pos, neg, num_samples, positive_fraction
    )
    selected = sel_pos | sel_neg

    # clamp to the candidate count (see roi_heads.sample_proposals)
    num_samples = min(num_samples, proposals.shape[0])
    order = jnp.argsort(jnp.where(selected, 0, 1), stable=True)
    rows = order[:num_samples]
    row_valid = jnp.arange(num_samples) < jnp.sum(selected)

    rois = proposals[rows]
    is_pos = sel_pos[rows]
    classes = jnp.where(is_pos, gt_classes[matched_idx[rows]], num_classes)
    classes = jnp.where(row_valid, classes, num_classes).astype(jnp.int32)
    target_boxes = gt_boxes[matched_idx[rows]]
    return rois, classes, target_boxes, row_valid


class RotatedROIHeads(StandardROIHeads):
    box_dim = 5

    def __init__(self, cfg, strides: Sequence[int], dtype=jnp.float32):
        super().__init__(cfg, strides, dtype=dtype)
        w = cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
        self.bbox_reg_weights = tuple(w) + (1.0,) * (5 - len(w))
        # rebuild the box module with 5-dim regression outputs
        from .roi_heads import (
            FastRCNNConvFCHead,
            FastRCNNOutputLayers,
            ROIBoxModule,
        )

        b = cfg.MODEL.ROI_BOX_HEAD
        self.module = ROIBoxModule(
            head=FastRCNNConvFCHead(num_fc=max(b.NUM_FC, 1), fc_dim=b.FC_DIM,
                                    dtype=dtype),
            outputs=FastRCNNOutputLayers(num_classes=self.num_classes,
                                         cls_agnostic=self.cls_agnostic,
                                         box_dim=5, dtype=dtype),
        )

    def pool(self, feats_per_image: List[jnp.ndarray], rois: jnp.ndarray,
             fused: bool = False):
        """fused=True (inference) gathers each roi only from its assigned
        level via the flattened-level table (4x fewer gathered bytes; see
        ops/roi_align.py). Training keeps the all-level path."""
        fn = (multilevel_roi_align_rotated_fused if fused
              else multilevel_roi_align_rotated)
        return fn(
            feats_per_image, self.strides, rois,
            output_size=self.pooler_resolution,
            sampling_ratio=self.sampling_ratio,
        )

    # ----------------------------------------------------------------- loss
    def losses(self, rng, variables, feats, proposals, prop_valid,
               gt_boxes, gt_classes, gt_valid) -> Dict[str, jnp.ndarray]:
        """feats: list of (B,H,W,C); proposals (B,R,5); gt_boxes (B,G,5)."""
        B = proposals.shape[0]
        rngs = jax.random.split(rng, B)
        rois, classes, target_boxes, row_valid = jax.vmap(
            lambda r, p, pv, gb, gc, gv: sample_rotated_proposals(
                r, p, pv, gb, gc, gv,
                self.batch_size_per_image, self.positive_fraction,
                self.iou_thresholds, self.iou_labels, self.num_classes,
                self.append_gt,
            )
        )(rngs, proposals, prop_valid, gt_boxes, gt_classes, gt_valid)

        pooled = jax.vmap(
            lambda *args: self.pool(list(args[:-1]), args[-1])
        )(*feats, rois)

        scores, deltas = self.module.apply(variables, pooled)

        fg = (classes < self.num_classes) & row_valid
        num_valid = jnp.maximum(jnp.sum(row_valid), 1.0)

        logp = jax.nn.log_softmax(scores, axis=-1)
        ce = -jnp.take_along_axis(logp, classes[..., None], axis=-1).squeeze(-1)
        cls_loss = jnp.sum(jnp.where(row_valid, ce, 0.0)) / num_valid

        off = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
        safe_targets = jnp.where(fg[..., None], target_boxes, rois + off)
        tgt_deltas = get_rotated_deltas(rois, safe_targets,
                                        weights=self.bbox_reg_weights)
        if self.cls_agnostic:
            sel_deltas = deltas
        else:
            d = deltas.reshape(*deltas.shape[:-1], self.num_classes, 5)
            cls_idx = jnp.clip(classes, 0, self.num_classes - 1)
            sel_deltas = jnp.take_along_axis(
                d, cls_idx[..., None, None].repeat(5, -1), axis=-2
            ).squeeze(-2)
        reg = smooth_l1_loss(sel_deltas, tgt_deltas, self.smooth_l1_beta)
        reg_loss = jnp.sum(jnp.where(fg[..., None], reg, 0.0)) / num_valid

        return {"loss_cls": cls_loss, "loss_box_reg": reg_loss,
                "num_fg": jnp.sum(fg)}

    # ------------------------------------------------------------ inference
    def inference(self, variables, feats, proposals, prop_valid,
                  scales, orig_sizes,
                  prop_anchors=None) -> Dict[str, jnp.ndarray]:
        """fast_rcnn_inference_rotated. Output boxes are XYWHA in original
        image coordinates (cx, cy, w, h divided by scale; angle unchanged —
        same rescale as RotatedRetinaNet.predict). prop_anchors is accepted
        for API parity but the WithAnchor diagnosis chain is an axis-aligned
        reference feature; it is ignored here."""
        del prop_anchors
        pooled = jax.vmap(
            lambda *args: self.pool(list(args[:-1]), args[-1], fused=True)
        )(*feats, proposals)
        scores, deltas = self.module.apply(variables, pooled)
        probs = jax.nn.softmax(scores, axis=-1)[..., :-1]   # (B,R,C)

        B, R, C = probs.shape
        if self.cls_agnostic:
            boxes = apply_rotated_deltas(deltas, proposals,
                                         weights=self.bbox_reg_weights)
            boxes = jnp.broadcast_to(boxes[:, :, None, :], (B, R, C, 5))
        else:
            d = deltas.reshape(B, R, C, 5)
            boxes = apply_rotated_deltas(d, proposals[:, :, None, :],
                                         weights=self.bbox_reg_weights)

        flat_scores = jnp.where(prop_valid[..., None], probs, 0.0)
        flat_scores = flat_scores.reshape(B, R * C)
        flat_boxes = boxes.reshape(B, R * C, 5)
        cls_ids = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, None, :], (B, R, C)
        ).reshape(B, R * C)

        k = min(1000, R * C)
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)
        sel_boxes = jnp.take_along_axis(flat_boxes, top_idx[..., None], axis=1)
        sel_cls = jnp.take_along_axis(cls_ids, top_idx, axis=1)
        valid = top_scores > self.score_thresh

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
            sel_boxes, top_scores, sel_cls, valid,
            scales.astype(jnp.float32),
        )
        return {"boxes": ob, "scores": os_, "classes": oc, "valid": ov}
