"""Anchor/proposal matchers as pure vmappable functions.

Counterparts of detectron2 `Matcher` and the reference's `TopKMatcher`
(`slender_det/modeling/matchers/topk_matcher.py:7-86`, built via
`build_matcher(cfg)`), redesigned for fixed shapes: gt tensors are padded
with a validity mask, outputs are per-anchor (matched_idx, label) with
label semantics taken from cfg IOU_LABELS (e.g. 0=bg, -1=ignore, 1=fg).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops


def iou_matcher(
    anchors: jnp.ndarray,          # (N, 4) — or (N, 5) XYWHA w/ pairwise_fn
    gt_boxes: jnp.ndarray,         # (G, 4) — or (G, 5)
    gt_valid: jnp.ndarray,         # (G,)
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality_matches: bool = True,
    pairwise_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 Matcher semantics on padded gt.

    pairwise_fn(gt, anchors) -> (G, N) overrides the similarity (e.g.
    ops.rotated.pairwise_rotated_iou for XYWHA boxes, as d2's RRPN/RROIHeads
    plug pairwise_iou_rotated into the same Matcher).

    Returns:
        matched_idx: (N,) int32 index into gt (0 when no valid gt)
        match_labels: (N,) int8 from `labels` per threshold bin
    """
    if pairwise_fn is None:
        pairwise_fn = box_ops.pairwise_iou
    iou = pairwise_fn(gt_boxes, anchors)                   # (G, N)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)

    matched_vals = jnp.max(iou, axis=0)                    # (N,)
    matched_idx = jnp.argmax(iou, axis=0).astype(jnp.int32)

    match_labels = jnp.full(matched_vals.shape, labels[0], jnp.int8)
    edges = list(thresholds)
    for lo, label in zip(edges, labels[1:]):
        match_labels = jnp.where(matched_vals >= lo, jnp.int8(label), match_labels)

    if allow_low_quality_matches:
        # anchors achieving the per-gt maximum IoU become foreground
        highest_per_gt = jnp.max(iou, axis=1, keepdims=True)  # (G, 1)
        is_best = (iou == highest_per_gt) & gt_valid[:, None] & (highest_per_gt > 0)
        lq = jnp.any(is_best, axis=0)
        match_labels = jnp.where(lq, jnp.int8(labels[-1]), match_labels)

    # with no valid gt everything is background
    any_gt = jnp.any(gt_valid)
    match_labels = jnp.where(any_gt, match_labels, jnp.int8(labels[0]))
    return matched_idx, match_labels


def topk_matcher(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    thresholds: Sequence[float],
    labels: Sequence[int],
    k: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference TopKMatcher: in addition to the threshold rule, the top-k
    highest-IoU anchors of each gt are foreground (a denser version of
    low-quality matching; topk_matcher.py:48-86)."""
    iou = box_ops.pairwise_iou(gt_boxes, anchors)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)

    matched_vals = jnp.max(iou, axis=0)
    matched_idx = jnp.argmax(iou, axis=0).astype(jnp.int32)

    match_labels = jnp.full(matched_vals.shape, labels[0], jnp.int8)
    for lo, label in zip(list(thresholds), labels[1:]):
        match_labels = jnp.where(matched_vals >= lo, jnp.int8(label), match_labels)

    # top-k anchors per gt -> foreground
    k = min(k, iou.shape[1])
    topk_val, topk_idx = jax.lax.top_k(iou, k)             # (G, k)
    fg = jnp.zeros(iou.shape[1], bool)
    valid_top = (topk_val > 0) & gt_valid[:, None]
    fg = fg.at[topk_idx.reshape(-1)].max(valid_top.reshape(-1))
    match_labels = jnp.where(fg, jnp.int8(labels[-1]), match_labels)

    any_gt = jnp.any(gt_valid)
    match_labels = jnp.where(any_gt, match_labels, jnp.int8(labels[0]))
    return matched_idx, match_labels


def build_matcher(cfg):
    """Factory mirroring `slender_det.modeling.matchers.build_matcher`."""
    mtype = cfg.MODEL.RPN.MATCHER.TYPE
    thresholds = cfg.MODEL.RPN.IOU_THRESHOLDS
    labels = cfg.MODEL.RPN.IOU_LABELS
    if mtype == "Origin":
        def match(anchors, gt_boxes, gt_valid):
            return iou_matcher(anchors, gt_boxes, gt_valid, thresholds, labels)
        return match
    if mtype == "TopK":
        k = cfg.MODEL.RPN.MATCHER.TOPK

        def match(anchors, gt_boxes, gt_valid):
            return topk_matcher(anchors, gt_boxes, gt_valid, thresholds, labels, k)
        return match
    raise ValueError(f"Unknown matcher type {mtype!r}")
