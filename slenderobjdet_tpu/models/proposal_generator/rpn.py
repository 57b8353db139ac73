"""Region Proposal Network, TPU-native.

Counterpart of the reference's `RPNWNM` full-RPN re-implementation
(`slender_det/modeling/proposal_generator/rpn.py:25-356`), which is the d2
RPN with a pluggable matcher (MODEL.RPN.MATCHER.TYPE in {Origin, TopK}).

Fixed-shape redesign:
- anchor labeling + random 256@0.5 subsampling are masked ops
  (models/sampling.py) driven by an explicit PRNGKey
- find_top_rpn_proposals (topk -> per-level NMS -> global topk,
  proposal_utils.py:11-130) becomes per-level static-k topk + a single
  level-aware batched NMS returning POST_NMS_TOPK fixed slots (greedy
  selection in global score order with per-level suppression is equivalent
  to per-level NMS followed by global score sort)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import optax_sigmoid_ce, smooth_l1_loss
from ...ops.nms import batched_nms
from ...structures import boxes as box_ops
from ..matchers import iou_matcher, topk_matcher
from ..sampling import subsample_labels


class StandardRPNHead(nn.Module):
    num_anchors: int
    box_dim: int = 4               # 5 for RRPN (XYWHA deltas, d2 parity)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        init = nn.initializers.normal(stddev=0.01)
        c = feats[0].shape[-1]
        conv = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=init, name="conv")
        objectness = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32, kernel_init=init,
                             name="objectness_logits")
        deltas = nn.Conv(self.num_anchors * self.box_dim, (1, 1),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         kernel_init=init, name="anchor_deltas")
        logits, regs = [], []
        for f in feats:
            b, h, w, _ = f.shape
            t = nn.relu(conv(f))
            logits.append(objectness(t).astype(jnp.float32).reshape(b, -1))
            regs.append(deltas(t).astype(jnp.float32)
                        .reshape(b, -1, self.box_dim))
        return logits, regs


class RPN:
    """RPN logic over head outputs (anchors are host-computed constants)."""

    def __init__(self, cfg, strides: Sequence[int]):
        from ..anchors import AnchorGeneratorSpec

        r = cfg.MODEL.RPN
        self.in_features = list(r.IN_FEATURES)
        self.strides = list(strides)
        self.anchor_spec = AnchorGeneratorSpec(cfg, strides)
        self.num_cell_anchors = self.anchor_spec.num_cell_anchors[0]
        self.batch_size_per_image = r.BATCH_SIZE_PER_IMAGE
        self.positive_fraction = r.POSITIVE_FRACTION
        self.iou_thresholds = list(r.IOU_THRESHOLDS)
        self.iou_labels = list(r.IOU_LABELS)
        self.matcher_type = r.MATCHER.TYPE
        self.matcher_topk = r.MATCHER.TOPK
        self.matcher_chunk = r.MATCHER.CHUNK
        self.bbox_reg_weights = tuple(r.BBOX_REG_WEIGHTS)
        self.smooth_l1_beta = r.SMOOTH_L1_BETA
        self.loss_weight = r.LOSS_WEIGHT
        self.pre_nms_topk = {True: r.PRE_NMS_TOPK_TRAIN, False: r.PRE_NMS_TOPK_TEST}
        self.post_nms_topk = {True: r.POST_NMS_TOPK_TRAIN, False: r.POST_NMS_TOPK_TEST}
        self.nms_thresh = r.NMS_THRESH
        self.min_size = cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE

    def _match(self, anchors, gt_boxes, gt_valid):
        if self.matcher_type == "TopK":
            return topk_matcher(anchors, gt_boxes, gt_valid,
                                self.iou_thresholds, self.iou_labels,
                                k=self.matcher_topk)
        return iou_matcher(anchors, gt_boxes, gt_valid,
                           self.iou_thresholds, self.iou_labels,
                           allow_low_quality_matches=True,
                           chunk=self.matcher_chunk)

    # ----------------------------------------------------------------- loss
    def losses(self, rng, anchors, logits, deltas, gt_boxes, gt_classes,
               gt_valid) -> Dict[str, jnp.ndarray]:
        """logits (B, N); deltas (B, N, 4); gt padded per image."""
        B = logits.shape[0]

        def label_one(rng_i, gt_b, gt_v):
            matched_idx, match_labels = self._match(anchors, gt_b, gt_v)
            pos = match_labels == 1
            neg = match_labels == 0
            sel_pos, sel_neg = subsample_labels(
                rng_i, pos, neg, self.batch_size_per_image,
                self.positive_fraction,
            )
            matched_boxes = gt_b[matched_idx]
            return sel_pos, sel_neg, matched_boxes

        rngs = jax.random.split(rng, B)
        sel_pos, sel_neg, matched_boxes = jax.vmap(label_one)(
            rngs, gt_boxes, gt_valid
        )

        normalizer = float(self.batch_size_per_image * B)
        objness_targets = sel_pos.astype(jnp.float32)
        obj_loss = jnp.sum(
            jnp.where(sel_pos | sel_neg,
                      optax_sigmoid_ce(logits, objness_targets), 0.0)
        ) / normalizer

        safe_boxes = jnp.where(sel_pos[..., None], matched_boxes,
                               anchors[None] + 1.0)
        target_deltas = box_ops.get_deltas(
            jnp.broadcast_to(anchors[None], safe_boxes.shape), safe_boxes,
            weights=self.bbox_reg_weights,
        )
        reg_loss = jnp.sum(
            jnp.where(sel_pos[..., None],
                      smooth_l1_loss(deltas, target_deltas, self.smooth_l1_beta),
                      0.0)
        ) / normalizer

        return {
            "loss_rpn_cls": obj_loss * self.loss_weight,
            "loss_rpn_loc": reg_loss * self.loss_weight,
        }

    # ------------------------------------------------------------ proposals
    def proposals(self, anchors_np, counts, logits, deltas, image_sizes,
                  train: bool, with_anchors: bool = False):
        """-> (B, K, 4) proposal boxes in image coords, (B, K) scores,
        (B, K) valid; K = POST_NMS_TOPK.

        with_anchors=True additionally returns each kept proposal's SOURCE
        anchor (B, K, 4), carried through topk and NMS exactly like the
        reference's `find_top_rpn_proposals_anchors`
        (proposal_utils.py:11-130: topk_anchors gathered with topk_idx,
        filtered/NMS-kept with the same indices, clipped to the image).
        """
        pre_k = self.pre_nms_topk[train]
        post_k = self.post_nms_topk[train]
        offsets = np.concatenate([[0], np.cumsum(counts)])

        cand_boxes, cand_scores, cand_levels, cand_anchors = [], [], [], []
        for lvl in range(len(counts)):
            sl = slice(offsets[lvl], offsets[lvl + 1])
            lvl_logits = logits[:, sl]
            lvl_deltas = deltas[:, sl]
            lvl_anchors = jnp.asarray(anchors_np[sl])
            k = min(pre_k, counts[lvl])
            top_scores, top_idx = jax.lax.top_k(lvl_logits, k)
            sel_deltas = jnp.take_along_axis(lvl_deltas, top_idx[..., None], axis=1)
            sel_anchors = lvl_anchors[top_idx]
            boxes = box_ops.apply_deltas(sel_deltas, sel_anchors,
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
            bx = box_ops.clip(bx, hw[0], hw[1])
            wh_ok = ((bx[:, 2] - bx[:, 0]) > self.min_size) & (
                (bx[:, 3] - bx[:, 1]) > self.min_size
            )
            keep_idx, keep_valid = batched_nms(
                bx, sc, lv, self.nms_thresh, post_k, valid=wh_ok
            )
            kept_anchors = box_ops.clip(an[keep_idx], hw[0], hw[1])
            return bx[keep_idx], sc[keep_idx], keep_valid, kept_anchors

        pb, ps, pv, pa = jax.vmap(one_image)(
            boxes, scores, levels, anchors, image_sizes.astype(jnp.float32)
        )
        if with_anchors:
            return pb, ps, pv, pa
        return pb, ps, pv
