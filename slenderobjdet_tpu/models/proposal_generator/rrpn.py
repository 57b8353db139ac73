"""Rotated Region Proposal Network (RRPN), TPU-native.

Counterpart of detectron2's RRPN, which the reference's rotated two-stage
configs select via PROPOSAL_GENERATOR.NAME "RRPN"
(`configs/rotated/Base-RRCNN-FPN.yaml`, `configs/submit/test_dev.yaml`).
Same structure as the axis-aligned RPN (rpn.py) with the d2 rotated
substitutions:

- anchors: RotatedAnchorGeneratorSpec (XYWHA, SIZES x ASPECT_RATIOS x ANGLES)
- matching: exact rotated IoU (ops/rotated.pairwise_rotated_iou) through the
  same Matcher semantics
- regression: Box2BoxTransformRotated deltas (5-dim, angle normalized to
  (-180, 180], RPN.BBOX_REG_WEIGHTS = (1,1,1,1,1))
- find_top_rrpn_proposals: per-level top-k -> rotated clip (d2
  RotatedBoxes.clip: only boxes within 1 degree of horizontal are clipped)
  -> min-size filter on (w, h) -> level-aware rotated NMS via the
  center-offset trick (greedy global order + per-level suppression ==
  per-level NMS + global sort, as in rpn.py)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import optax_sigmoid_ce, smooth_l1_loss
from ...ops.rotated import (
    apply_rotated_deltas,
    get_rotated_deltas,
    pairwise_rotated_iou,
    rotated_nms,
)
from ..anchors import RotatedAnchorGeneratorSpec
from ..matchers import iou_matcher
from ..sampling import subsample_labels
from .rpn import RPN


def clip_rotated_boxes(boxes: jnp.ndarray, h, w,
                       clip_angle_threshold: float = 1.0) -> jnp.ndarray:
    """d2 RotatedBoxes.clip: normalize angles to (-180, 180], then clip ONLY
    nearly-horizontal boxes (|angle| <= threshold) to the image by clamping
    their XYXY form; rotated boxes are left untouched (clipping a rotated
    rectangle is not representable as a rectangle)."""
    cx, cy, bw, bh, a = (boxes[..., i] for i in range(5))
    a = (a + 180.0) % 360.0 - 180.0
    x1 = jnp.clip(cx - bw / 2.0, 0, w)
    y1 = jnp.clip(cy - bh / 2.0, 0, h)
    x2 = jnp.clip(cx + bw / 2.0, 0, w)
    y2 = jnp.clip(cy + bh / 2.0, 0, h)
    horiz = jnp.abs(a) <= clip_angle_threshold
    cx = jnp.where(horiz, (x1 + x2) / 2.0, cx)
    cy = jnp.where(horiz, (y1 + y2) / 2.0, cy)
    bw = jnp.where(horiz, x2 - x1, bw)
    bh = jnp.where(horiz, y2 - y1, bh)
    return jnp.stack([cx, cy, bw, bh, a], axis=-1)


class RotatedRPN(RPN):
    """RPN over XYWHA anchors. The RPN head must be built with box_dim=5
    (StandardRPNHead(box_dim=5), d2 StandardRPNHead box_dim from the rotated
    anchor generator)."""

    def __init__(self, cfg, strides: Sequence[int]):
        super().__init__(cfg, strides)
        self.anchor_spec = RotatedAnchorGeneratorSpec(cfg, strides)
        self.num_cell_anchors = self.anchor_spec.num_cell_anchors[0]
        self.bbox_reg_weights = tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS) + (
            (1.0,) * (5 - len(cfg.MODEL.RPN.BBOX_REG_WEIGHTS)))

    def _match(self, anchors, gt_boxes, gt_valid):
        # d2 RRPN keeps the plain Matcher (no TopK variant) with rotated IoU
        return iou_matcher(anchors, gt_boxes, gt_valid,
                           self.iou_thresholds, self.iou_labels,
                           allow_low_quality_matches=True,
                           pairwise_fn=pairwise_rotated_iou)

    # ----------------------------------------------------------------- loss
    def losses(self, rng, anchors, logits, deltas, gt_boxes, gt_classes,
               gt_valid):
        """logits (B, N); deltas (B, N, 5); gt_boxes (B, G, 5) XYWHA."""
        B = logits.shape[0]

        def label_one(rng_i, gt_b, gt_v):
            matched_idx, match_labels = self._match(anchors, gt_b, gt_v)
            pos = match_labels == 1
            neg = match_labels == 0
            sel_pos, sel_neg = subsample_labels(
                rng_i, pos, neg, self.batch_size_per_image,
                self.positive_fraction,
            )
            return sel_pos, sel_neg, gt_b[matched_idx]

        rngs = jax.random.split(rng, B)
        sel_pos, sel_neg, matched_boxes = jax.vmap(label_one)(
            rngs, gt_boxes, gt_valid
        )

        normalizer = float(self.batch_size_per_image * B)
        obj_loss = jnp.sum(
            jnp.where(sel_pos | sel_neg,
                      optax_sigmoid_ce(logits, sel_pos.astype(jnp.float32)),
                      0.0)
        ) / normalizer

        # dummy non-degenerate target for masked-out rows
        off = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
        safe_boxes = jnp.where(sel_pos[..., None], matched_boxes,
                               anchors[None] + off)
        target_deltas = get_rotated_deltas(
            jnp.broadcast_to(anchors[None], safe_boxes.shape), safe_boxes,
            weights=self.bbox_reg_weights,
        )
        reg_loss = jnp.sum(
            jnp.where(sel_pos[..., None],
                      smooth_l1_loss(deltas, target_deltas,
                                     self.smooth_l1_beta),
                      0.0)
        ) / normalizer

        return {
            "loss_rpn_cls": obj_loss * self.loss_weight,
            "loss_rpn_loc": reg_loss * self.loss_weight,
        }

    # ------------------------------------------------------------ proposals
    def proposals(self, anchors_np, counts, logits, deltas, image_sizes,
                  train: bool, with_anchors: bool = False):
        """-> (B, K, 5) XYWHA proposals, (B, K) scores, (B, K) valid."""
        pre_k = self.pre_nms_topk[train]
        post_k = self.post_nms_topk[train]
        offsets = np.concatenate([[0], np.cumsum(counts)])

        cand_boxes, cand_scores, cand_levels, cand_anchors = [], [], [], []
        for lvl in range(len(counts)):
            sl = slice(offsets[lvl], offsets[lvl + 1])
            lvl_anchors = jnp.asarray(anchors_np[sl])
            k = min(pre_k, counts[lvl])
            top_scores, top_idx = jax.lax.top_k(logits[:, sl], k)
            sel_deltas = jnp.take_along_axis(
                deltas[:, sl], top_idx[..., None], axis=1)
            sel_anchors = lvl_anchors[top_idx]
            boxes = apply_rotated_deltas(sel_deltas, sel_anchors,
                                         weights=self.bbox_reg_weights)
            cand_boxes.append(boxes)
            cand_scores.append(top_scores)
            cand_levels.append(jnp.full(top_scores.shape, lvl, jnp.int32))
            cand_anchors.append(sel_anchors)

        boxes = jnp.concatenate(cand_boxes, axis=1)
        scores = jnp.concatenate(cand_scores, axis=1)
        levels = jnp.concatenate(cand_levels, axis=1)
        anchors = jnp.concatenate(cand_anchors, axis=1)

        def one_image(bx, sc, lv, an, hw):
            bx = clip_rotated_boxes(bx, hw[0], hw[1])
            wh_ok = (bx[:, 2] > self.min_size) & (bx[:, 3] > self.min_size)
            # level-aware rotated NMS: shift centers per level so cross-level
            # pairs never overlap (image extent << 4096 * level gap)
            off = lv.astype(bx.dtype) * 4096.0
            shifted = bx.at[:, 0].add(off).at[:, 1].add(off)
            keep_idx, keep_valid = rotated_nms(
                shifted, sc, self.nms_thresh, post_k, valid=wh_ok
            )
            kept_anchors = an[keep_idx]
            return bx[keep_idx], sc[keep_idx], keep_valid, kept_anchors

        pb, ps, pv, pa = jax.vmap(one_image)(
            boxes, scores, levels, anchors, image_sizes.astype(jnp.float32)
        )
        if with_anchors:
            return pb, ps, pv, pa
        return pb, ps, pv
