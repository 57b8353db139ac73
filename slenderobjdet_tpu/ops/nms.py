"""Fixed-shape greedy NMS for TPU.

The reference relies on detectron2's CUDA `batched_nms`
(`slender_det/modeling/meta_arch/fcos/fcos.py:455`, `proposal_utils.py`).
CUDA NMS returns a variable-length keep list — impossible under XLA's static
shapes — so this is a ground-up redesign:

- `nms_select`: greedy selection loop. Each of `max_out` iterations picks the
  current argmax-score box and suppresses everything with IoU > threshold.
  This yields *exactly* the first `max_out` survivors of classic greedy NMS
  (greedy NMS keeps boxes in score order), in fixed shape, with a validity
  mask for slots beyond the number of survivors. O(max_out * N) vector work,
  no N×N materialization — TPU-friendly (argmax/elementwise on the VPU).
- `batched_nms`: class-aware via the coordinate-offset trick (boxes of
  different classes shifted to disjoint regions), same as detectron2's
  batched_nms semantics.

All inputs are single-image; callers vmap over the batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def nms_select(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning fixed-size indices.

    Args:
        boxes: (N, 4) XYXY.
        scores: (N,).
        iou_threshold: suppress boxes with IoU > threshold w.r.t. a kept box.
        max_out: number of output slots.
        valid: optional (N,) bool; invalid boxes can never be selected.

    Returns:
        keep_idx: (max_out,) int32 indices into the input (0 where invalid).
        keep_valid: (max_out,) bool mask of real selections.
    """
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    live_scores = (
        jnp.where(jnp.asarray(valid), scores, NEG_INF) if valid is not None else scores
    )

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    def body(state, _):
        live = state
        i = jnp.argmax(live)
        best = live[i]
        is_valid = best > NEG_INF / 2

        bx1, by1, bx2, by2 = x1[i], y1[i], x2[i], y2[i]
        barea = areas[i]
        iw = jnp.clip(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0, None)
        ih = jnp.clip(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0, None)
        inter = iw * ih
        iou = inter / jnp.maximum(areas + barea - inter, 1e-12)

        suppress = iou > iou_threshold  # includes the selected box itself
        live = jnp.where(is_valid & suppress, NEG_INF, live)
        live = live.at[i].set(NEG_INF)
        return live, (i.astype(jnp.int32), is_valid)

    _, (keep_idx, keep_valid) = jax.lax.scan(
        body, live_scores, None, length=max_out
    )
    keep_idx = jnp.where(keep_valid, keep_idx, 0)
    return keep_idx, keep_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class/level-aware NMS: boxes with different `idxs` never suppress each
    other. Implemented by offsetting each group's coordinates into a disjoint
    region (the standard trick, matching detectron2 batched_nms semantics)."""
    boxes = jnp.asarray(boxes)
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = jnp.asarray(idxs).astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_select(shifted, scores, iou_threshold, max_out, valid=valid)
