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


def _matcher_core_chunked(anchors, gt_boxes, gt_valid, pairwise_fn,
                          allow_low_quality_matches, chunk):
    """(matched_vals, matched_idx, lq) streamed over anchor chunks so the
    full (G, N) IoU matrix never lives at once.

    SINGLE pass: each chunk's IoU is computed once; per-anchor max/argmax
    over gt are chunk-local, the per-gt maximum combines across chunks
    (max is order-exact), and the low-quality tie set is derived from the
    SAME computed values via
        iou == global_max  <=>  (iou == chunk_max) & (chunk_max == global_max)
    (exact, since iou <= chunk_max <= global_max elementwise). A
    recompute-in-a-second-pass design was tried first and is WRONG: two
    jitted bodies may compile the identical IoU expression with different
    association (e.g. a1+a2-inter), and a 1-ulp difference silently drops
    exact-tie anchors from the low-quality set (caught by
    tests/test_matchers.py on random float boxes)."""
    N = anchors.shape[0]
    pad = (-N) % chunk
    if pad:
        anchors = jnp.concatenate(
            [anchors, jnp.zeros((pad,) + anchors.shape[1:], anchors.dtype)])
    achunks = anchors.reshape(-1, chunk, anchors.shape[1])
    # pad anchors are masked out of the per-gt max (their IoU from an
    # arbitrary pairwise_fn on zero boxes could even be NaN — rotated)
    avalid = (jnp.arange(achunks.shape[0] * chunk) < N).reshape(-1, chunk)

    def body(cv):
        c, v = cv
        iou = pairwise_fn(gt_boxes, c)                     # (G, C)
        iou = jnp.where(gt_valid[:, None], iou, -1.0)
        iou = jnp.where(v[None, :], iou, -1.0)
        chunk_pg = jnp.max(iou, axis=1)                    # (G,)
        # (G, C) bool — N*G bits across all chunks, vs N*G fp32 one-shot
        best = iou == chunk_pg[:, None]
        return (jnp.max(iou, axis=0), jnp.argmax(iou, axis=0),
                chunk_pg, best)

    mv, mi, pg, best = jax.lax.map(body, (achunks, avalid))
    matched_vals = mv.reshape(-1)[:N]
    matched_idx = mi.reshape(-1)[:N].astype(jnp.int32)

    lq = None
    if allow_low_quality_matches:
        global_pg = jnp.max(pg, axis=0)                    # (G,)
        contrib = best & (pg == global_pg[None, :])[:, :, None]
        contrib = (contrib & gt_valid[None, :, None]
                   & (global_pg > 0)[None, :, None])
        lq = jnp.any(contrib, axis=1).reshape(-1)[:N]      # (K, C) -> (N,)
    return matched_vals, matched_idx, lq


def iou_matcher(
    anchors: jnp.ndarray,          # (N, 4) — or (N, 5) XYWHA w/ pairwise_fn
    gt_boxes: jnp.ndarray,         # (G, 4) — or (G, 5)
    gt_valid: jnp.ndarray,         # (G,)
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality_matches: bool = True,
    pairwise_fn=None,
    chunk: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 Matcher semantics on padded gt.

    pairwise_fn(gt, anchors) -> (G, N) overrides the similarity (e.g.
    ops.rotated.pairwise_rotated_iou for XYWHA boxes, as d2's RRPN/RROIHeads
    plug pairwise_iou_rotated into the same Matcher).

    chunk > 0 streams the match over anchor chunks of that size — the
    identical algorithm from one single-pass computation of each chunk's
    IoU (tests/test_matchers.py pins chunked == one-shot bitwise on
    exactly-representable integer-pixel boxes). Use for
    N x G spaces whose live (G, N) matrix would blow the memory peak:
    the vmapped B=16 x (100 gt x ~268k RPN anchors) match phase was the
    round-5 R-CNN runtime OOM (VALIDATION round 5); MODEL.RPN.MATCHER
    .CHUNK wires it for the RPN.

    Returns:
        matched_idx: (N,) int32 index into gt (0 when no valid gt)
        match_labels: (N,) int8 from `labels` per threshold bin
    """
    if pairwise_fn is None:
        pairwise_fn = box_ops.pairwise_iou
    if chunk and anchors.shape[0] > chunk:
        matched_vals, matched_idx, lq = _matcher_core_chunked(
            anchors, gt_boxes, gt_valid, pairwise_fn,
            allow_low_quality_matches, chunk)
    else:
        iou = pairwise_fn(gt_boxes, anchors)               # (G, N)
        iou = jnp.where(gt_valid[:, None], iou, -1.0)
        matched_vals = jnp.max(iou, axis=0)                # (N,)
        matched_idx = jnp.argmax(iou, axis=0).astype(jnp.int32)
        lq = None
        if allow_low_quality_matches:
            # anchors achieving the per-gt maximum IoU become foreground
            highest_per_gt = jnp.max(iou, axis=1, keepdims=True)  # (G, 1)
            is_best = ((iou == highest_per_gt)
                       & gt_valid[:, None] & (highest_per_gt > 0))
            lq = jnp.any(is_best, axis=0)

    match_labels = jnp.full(matched_vals.shape, labels[0], jnp.int8)
    edges = list(thresholds)
    for lo, label in zip(edges, labels[1:]):
        match_labels = jnp.where(matched_vals >= lo, jnp.int8(label), match_labels)

    if lq is not None:
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
