"""Box math as pure functions on arrays (TPU-first: no box container objects in
the compiled path; everything is (N, 4) XYXY absolute-coordinate arrays).

Covers the box operations the reference gets from detectron2
(`detectron2.structures.Boxes`, `pairwise_iou`, `Box2BoxTransform`) and from
`slender_det/layers/iou_loss.py` decode helpers. Works with both jnp and np
inputs (module chosen from the input type), so the same functions serve the
jitted model and the host-side evaluator.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(x):
    return jnp if isinstance(x, jnp.ndarray) else np


def area(boxes):
    """(N,4) XYXY -> (N,) area."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def clip(boxes, h, w):
    xp = _xp(boxes)
    x1 = xp.clip(boxes[..., 0], 0, w)
    y1 = xp.clip(boxes[..., 1], 0, h)
    x2 = xp.clip(boxes[..., 2], 0, w)
    y2 = xp.clip(boxes[..., 3], 0, h)
    return xp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes, threshold: float = 0.0):
    return ((boxes[..., 2] - boxes[..., 0]) > threshold) & (
        (boxes[..., 3] - boxes[..., 1]) > threshold
    )


def xywh_to_xyxy(boxes):
    xp = _xp(boxes)
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return xp.stack([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes):
    xp = _xp(boxes)
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return xp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def pairwise_intersection(boxes1, boxes2):
    """(N,4),(M,4) -> (N,M) intersection areas.

    Computed as four separate (N, M) coordinate planes — never a stacked
    (N, M, 2) lt/rb tensor. Under the TPU tiled layout a minor dim of 2
    pads to 128 lanes (64x memory) the moment XLA materializes the temp
    instead of fusing it: at RPN-matcher scale (G=100 padded gt x ~268k
    anchors) one such copy is ~13.7 GB/image. Same pathology as the
    round-5 FCOS (L, G, 4) assignment OOM; identical fp ops either way."""
    xp = _xp(boxes1)
    ix1 = xp.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    iy1 = xp.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    ix2 = xp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    iy2 = xp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    w = xp.clip(ix2 - ix1, 0, None)
    h = xp.clip(iy2 - iy1, 0, None)
    return w * h


def pairwise_iou(boxes1, boxes2):
    """(N,4),(M,4) XYXY -> (N,M) IoU."""
    xp = _xp(boxes1)
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    return xp.where(union > 0, inter / xp.maximum(union, 1e-12), 0.0)


def pairwise_ioa(boxes1, boxes2):
    """Intersection over area of boxes2: (N,M)."""
    xp = _xp(boxes1)
    inter = pairwise_intersection(boxes1, boxes2)
    a2 = area(boxes2)[None, :]
    return xp.where(a2 > 0, inter / xp.maximum(a2, 1e-12), 0.0)


def elementwise_iou(boxes1, boxes2, eps: float = 1e-7):
    """(...,4),(...,4) -> (...,) IoU of corresponding boxes."""
    xp = _xp(boxes1)
    lt = xp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = xp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = xp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return inter / xp.maximum(union, eps)


# ------------------------------------------------------------------ deltas
# Box2BoxTransform semantics (R-CNN/RPN/RetinaNet delta encoding):
# d2 reference behavior: get_deltas / apply_deltas with per-coordinate weights
# and dw/dh clamped at log(1000/16) when decoding.

SCALE_CLAMP = float(np.log(1000.0 / 16.0))


def get_deltas(src_boxes, target_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    xp = _xp(src_boxes)
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    eps = 1e-7
    dx = wx * (tgt_cx - src_cx) / xp.maximum(src_w, eps)
    dy = wy * (tgt_cy - src_cy) / xp.maximum(src_h, eps)
    dw = ww * xp.log(xp.maximum(tgt_w, eps) / xp.maximum(src_w, eps))
    dh = wh * xp.log(xp.maximum(tgt_h, eps) / xp.maximum(src_h, eps))
    return xp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """deltas (...,K*4) applied to boxes (...,4) -> (...,K*4)."""
    xp = _xp(deltas)
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    wx, wy, ww, wh = weights
    shape = deltas.shape
    d = deltas.reshape(shape[:-1] + (-1, 4))
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = xp.clip(d[..., 2] / ww, None, SCALE_CLAMP)
    dh = xp.clip(d[..., 3] / wh, None, SCALE_CLAMP)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = xp.exp(dw) * w[..., None]
    pred_h = xp.exp(dh) * h[..., None]

    out = xp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(shape)


# ------------------------------------------------------------ FCOS ltrb
def ltrb_from_locations(locations, boxes):
    """locations (L,2) xy, boxes (G,4) -> (L,G,4) left/top/right/bottom."""
    xp = _xp(locations)
    xs = locations[:, 0][:, None]
    ys = locations[:, 1][:, None]
    l = xs - boxes[None, :, 0]
    t = ys - boxes[None, :, 1]
    r = boxes[None, :, 2] - xs
    b = boxes[None, :, 3] - ys
    return xp.stack([l, t, r, b], axis=-1)


def decode_ltrb(locations, ltrb):
    """locations (...,2), ltrb (...,4) -> XYXY boxes."""
    xp = _xp(locations)
    x1 = locations[..., 0] - ltrb[..., 0]
    y1 = locations[..., 1] - ltrb[..., 1]
    x2 = locations[..., 0] + ltrb[..., 2]
    y2 = locations[..., 1] + ltrb[..., 3]
    return xp.stack([x1, y1, x2, y2], axis=-1)
