"""Standard ROI heads (box branch), TPU-native.

Counterpart of d2 StandardROIHeads + the reference's ProposalVisibleHead
(`slender_det/modeling/rcnn/pvrcnn.py:66-97`) and
FastRCNNOutputLayersWithAnchor plumbing (`roi_heads/fast_rcnn.py:16-136`).

Fixed-shape redesign: proposal sampling (512 @ 0.25 with gt append,
d2 label_and_sample_proposals) packs the selected rows into a dense
(num_samples,) index tensor via stable argsort on the selection mask, so
pooling/box-head always see the same shapes.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import smooth_l1_loss
from ...ops.nms import batched_nms
from ...ops.roi_align import (
    multilevel_roi_align,
    multilevel_roi_align_fused,
    multilevel_roi_align_train,
)

# SLENDER_TRAIN_POOLER=alllevel restores the pool-every-level-and-select
# pooler in TRAINING (the A/B "before" side of the fused single-gather
# train pooler, VERDICT r3 #3a; family_train_bench numbers in
# VALIDATION.md round-4 notes).
_ALLLEVEL_TRAIN_POOLER = (
    os.environ.get("SLENDER_TRAIN_POOLER", "") == "alllevel")
from ...structures import boxes as box_ops
from ..matchers import iou_matcher
from ..sampling import subsample_labels


class FastRCNNConvFCHead(nn.Module):
    num_fc: int = 2
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (R, P, P, C)
        r = x.shape[0]
        x = x.reshape(r, -1)
        for i in range(self.num_fc):
            x = nn.relu(
                nn.Dense(self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i + 1}")(x)
            )
        return x


class FastRCNNOutputLayers(nn.Module):
    num_classes: int
    cls_agnostic: bool = False
    box_dim: int = 4               # 5 for RROIHeads (XYWHA, d2 parity)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (R, D)
        cls_init = nn.initializers.normal(stddev=0.01)
        box_init = nn.initializers.normal(stddev=0.001)
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          param_dtype=jnp.float32, kernel_init=cls_init,
                          name="cls_score")(x).astype(jnp.float32)
        num_box = 1 if self.cls_agnostic else self.num_classes
        deltas = nn.Dense(num_box * self.box_dim, dtype=self.dtype,
                          param_dtype=jnp.float32, kernel_init=box_init,
                          name="bbox_pred")(x).astype(jnp.float32)
        return scores, deltas


class ROIBoxModule(nn.Module):
    """box head + output layers over pooled features, vmapped over batch."""

    head: FastRCNNConvFCHead
    outputs: FastRCNNOutputLayers

    def __call__(self, pooled):  # (B, R, P, P, C)
        def one(p):
            return self.outputs(self.head(p))

        return jax.vmap(one)(pooled) if pooled.ndim == 5 else one(pooled)


def sample_proposals(
    rng,
    proposals: jnp.ndarray,      # (R, 4)
    prop_valid: jnp.ndarray,     # (R,)
    gt_boxes: jnp.ndarray,       # (G, 4)
    gt_classes: jnp.ndarray,     # (G,)
    gt_valid: jnp.ndarray,       # (G,)
    num_samples: int,
    positive_fraction: float,
    iou_thresholds: Sequence[float],
    iou_labels: Sequence[int],
    num_classes: int,
    append_gt: bool = True,
):
    """d2 label_and_sample_proposals, masked. Returns dense sampled rows:
    rois (S,4), classes (S,) [C = background], reg target boxes (S,4),
    row_valid (S,)."""
    if append_gt:
        proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
        prop_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    matched_idx, match_labels = iou_matcher(
        proposals, gt_boxes, gt_valid, iou_thresholds, iou_labels,
        allow_low_quality_matches=False,
    )
    pos = (match_labels == 1) & prop_valid
    neg = (match_labels == 0) & prop_valid
    sel_pos, sel_neg = subsample_labels(
        rng, pos, neg, num_samples, positive_fraction
    )
    selected = sel_pos | sel_neg

    # pack selected rows to the front (stable: keeps random-selection order).
    # A config may offer fewer candidates than num_samples (e.g. small
    # POST_NMS_TOPK_TRAIN): clamp — subsample_labels can then have selected
    # at most `candidates` rows, so no valid row is dropped.
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


class StandardROIHeads:
    def __init__(self, cfg, strides: Sequence[int], dtype=jnp.float32):
        h = cfg.MODEL.ROI_HEADS
        b = cfg.MODEL.ROI_BOX_HEAD
        self.num_classes = h.NUM_CLASSES
        self.in_features = list(h.IN_FEATURES)
        self.strides = list(strides)
        self.batch_size_per_image = h.BATCH_SIZE_PER_IMAGE
        self.positive_fraction = h.POSITIVE_FRACTION
        self.iou_thresholds = list(h.IOU_THRESHOLDS)
        self.iou_labels = list(h.IOU_LABELS)
        self.append_gt = h.PROPOSAL_APPEND_GT
        self.score_thresh = h.SCORE_THRESH_TEST
        self.nms_thresh = h.NMS_THRESH_TEST
        self.pooler_resolution = b.POOLER_RESOLUTION
        self.sampling_ratio = max(b.POOLER_SAMPLING_RATIO, 2)
        self.bbox_reg_weights = tuple(b.BBOX_REG_WEIGHTS)
        self.smooth_l1_beta = b.SMOOTH_L1_BETA
        self.cls_agnostic = b.CLS_AGNOSTIC_BBOX_REG
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE

        self.module = ROIBoxModule(
            head=FastRCNNConvFCHead(num_fc=max(b.NUM_FC, 1), fc_dim=b.FC_DIM,
                                    dtype=dtype),
            outputs=FastRCNNOutputLayers(num_classes=self.num_classes,
                                         cls_agnostic=self.cls_agnostic,
                                         dtype=dtype),
        )

    def pool(self, feats_per_image: List[jnp.ndarray], rois: jnp.ndarray,
             fused: bool = False):
        """feats: list of (H,W,C) for ONE image; rois (R,4).

        Both paths use the single-gather flattened-level pooler (4x fewer
        gathered bytes than pool-every-level-and-select, numerically
        identical). fused=False (training) adds the custom VJP whose
        feature adjoint is the per-level separable MXU-matmul pair
        (ops/roi_align.py multilevel_roi_align_train).

        Memory note: rois are chunked via lax.map so the gathered transient
        stays bounded (unchunked, batch 8 x 512 rois x 4 levels exceeded
        HBM)."""
        if fused:
            fn = multilevel_roi_align_fused
        elif _ALLLEVEL_TRAIN_POOLER:
            fn = multilevel_roi_align
        else:
            fn = multilevel_roi_align_train
        return fn(
            feats_per_image, self.strides, rois,
            output_size=self.pooler_resolution,
            sampling_ratio=self.sampling_ratio,
        )

    # ----------------------------------------------------------------- loss
    def losses(self, rng, variables, feats, proposals, prop_valid,
               gt_boxes, gt_classes, gt_valid) -> Dict[str, jnp.ndarray]:
        """feats: list of (B,H,W,C); proposals (B,R,4)."""
        B = proposals.shape[0]
        rngs = jax.random.split(rng, B)
        rois, classes, target_boxes, row_valid = jax.vmap(
            lambda r, p, pv, gb, gc, gv: sample_proposals(
                r, p, pv, gb, gc, gv,
                self.batch_size_per_image, self.positive_fraction,
                self.iou_thresholds, self.iou_labels, self.num_classes,
                self.append_gt,
            )
        )(rngs, proposals, prop_valid, gt_boxes, gt_classes, gt_valid)

        pooled = jax.vmap(
            lambda *args: self.pool(list(args[:-1]), args[-1])
        )(*feats, rois)

        scores, deltas = self.module.apply(variables, pooled)  # (B,S,C+1),(B,S,4C)

        fg = (classes < self.num_classes) & row_valid
        num_valid = jnp.maximum(jnp.sum(row_valid), 1.0)

        # softmax CE, mean over sampled rows (d2 cross_entropy 'mean')
        logp = jax.nn.log_softmax(scores, axis=-1)
        ce = -jnp.take_along_axis(logp, classes[..., None], axis=-1).squeeze(-1)
        cls_loss = jnp.sum(jnp.where(row_valid, ce, 0.0)) / num_valid

        # class-specific deltas of the gt class
        safe_targets = jnp.where(fg[..., None], target_boxes, rois + 1.0)
        tgt_deltas = box_ops.get_deltas(rois, safe_targets,
                                        weights=self.bbox_reg_weights)
        if self.cls_agnostic:
            sel_deltas = deltas
        else:
            d = deltas.reshape(*deltas.shape[:-1], self.num_classes, 4)
            cls_idx = jnp.clip(classes, 0, self.num_classes - 1)
            sel_deltas = jnp.take_along_axis(
                d, cls_idx[..., None, None].repeat(4, -1), axis=-2
            ).squeeze(-2)
        reg = smooth_l1_loss(sel_deltas, tgt_deltas, self.smooth_l1_beta)
        reg_loss = jnp.sum(jnp.where(fg[..., None], reg, 0.0)) / num_valid

        return {"loss_cls": cls_loss, "loss_box_reg": reg_loss,
                "num_fg": jnp.sum(fg)}

    # ------------------------------------------------------------ inference
    def inference(self, variables, feats, proposals, prop_valid,
                  scales, orig_sizes,
                  prop_anchors=None) -> Dict[str, jnp.ndarray]:
        """prop_anchors (B,R,4), if given, enables the WithAnchor diagnosis
        path (reference fast_rcnn.py:109-115): every final detection carries
        its source proposal and that proposal's source anchor, gathered with
        the same row indices through score-filter and NMS."""
        pooled = jax.vmap(
            lambda *args: self.pool(list(args[:-1]), args[-1], fused=True)
        )(*feats, proposals)
        scores, deltas = self.module.apply(variables, pooled)
        probs = jax.nn.softmax(scores, axis=-1)[..., :-1]   # (B,R,C)

        B, R, C = probs.shape
        if self.cls_agnostic:
            boxes = box_ops.apply_deltas(deltas, proposals,
                                         weights=self.bbox_reg_weights)
            boxes = jnp.broadcast_to(boxes[:, :, None, :], (B, R, C, 4))
        else:
            # apply_deltas supports (..., K*4) deltas on (..., 4) boxes
            boxes = box_ops.apply_deltas(
                deltas, proposals, weights=self.bbox_reg_weights
            ).reshape(B, R, C, 4)

        flat_scores = jnp.where(prop_valid[..., None], probs, 0.0).reshape(B, R * C)
        flat_boxes = boxes.reshape(B, R * C, 4)
        cls_ids = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, None, :], (B, R, C)
        ).reshape(B, R * C)

        k = min(1000, R * C)
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)
        sel_boxes = jnp.take_along_axis(
            flat_boxes, top_idx[..., None], axis=1
        )
        sel_cls = jnp.take_along_axis(cls_ids, top_idx, axis=1)
        valid = top_scores > self.score_thresh
        row_idx = top_idx // C                                  # (B, k)

        sources = None
        if prop_anchors is not None:
            sources = (
                jnp.take_along_axis(proposals, row_idx[..., None], axis=1),
                jnp.take_along_axis(prop_anchors, row_idx[..., None], axis=1),
            )

        def one(bx, sc, cl, vl, scale, orig_hw, src_prop, src_anc):
            keep_idx, keep_valid = batched_nms(
                bx, sc, cl, self.nms_thresh, self.max_dets, valid=vl
            )
            kb = box_ops.clip(bx[keep_idx] / scale, orig_hw[0], orig_hw[1])
            kp = box_ops.clip(src_prop[keep_idx] / scale, orig_hw[0], orig_hw[1])
            ka = box_ops.clip(src_anc[keep_idx] / scale, orig_hw[0], orig_hw[1])
            return kb, sc[keep_idx], cl[keep_idx], keep_valid, kp, ka

        zeros = jnp.zeros_like(sel_boxes)
        src_prop, src_anc = sources if sources is not None else (zeros, zeros)
        ob, os_, oc, ov, op, oa = jax.vmap(one)(
            sel_boxes, top_scores, sel_cls, valid,
            scales.astype(jnp.float32), orig_sizes.astype(jnp.float32),
            src_prop, src_anc,
        )
        out = {"boxes": ob, "scores": os_, "classes": oc, "valid": ov}
        if sources is not None:
            out["det_proposals"] = op
            out["anchors"] = oa
        return out
