"""Rotated-box geometry: exact IoU, NMS, delta transforms (XYWHA).

Replaces the detectron2 CUDA kernels the reference's rotated path uses
(`configs/rotated/Base-RRCNN-FPN.yaml`: RotatedAnchorGenerator + RRPN +
RROIHeads; `meta_arch/retina/retina_rotated.py`: rotated RetinaNet with
`Box2BoxTransformRotated`).

Representation: (cx, cy, w, h, angle_deg) with angle counterclockwise in
image coordinates (y down) — the detectron2 RotatedBoxes convention.

IoU is the exact convex-polygon intersection (Sutherland–Hodgman clip of one
rectangle by the other's 4 half-planes) in fixed-size 16-vertex buffers:
pure VPU arithmetic under vmap, no data-dependent shapes — the TPU-native
equivalent of the CUDA pairwise kernel.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nms import NEG_INF


def rotated_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) XYWHA -> (..., 4, 2) corner points (CCW order)."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    theta = a * (math.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx = jnp.stack([-w / 2, w / 2, w / 2, -w / 2], axis=-1)
    dy = jnp.stack([-h / 2, -h / 2, h / 2, h / 2], axis=-1)
    # y-down CCW rotation (d2 RotatedBoxes)
    gx = cx[..., None] + dx * c[..., None] + dy * s[..., None]
    gy = cy[..., None] - dx * s[..., None] + dy * c[..., None]
    return jnp.stack([gx, gy], axis=-1)


def _polygon_area(pts: jnp.ndarray) -> jnp.ndarray:
    """Shoelace over a fixed-size vertex ring; duplicate consecutive
    vertices contribute zero, so forward-filled buffers are safe."""
    x, y = pts[..., 0], pts[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * yn - xn * y, axis=-1))


def _clip_polygon(pts, valid, e0, e1):
    """Clip (16,2) polygon with validity mask by half-plane left of edge
    e0->e1. Returns new (pts, valid); order-preserving, forward-filled."""
    n = pts.shape[0]
    edge = e1 - e0
    # signed area: positive = inside (left of edge for CCW clipper)
    d = edge[0] * (pts[:, 1] - e0[1]) - edge[1] * (pts[:, 0] - e0[0])

    # valid slots are contiguous from 0 (construction invariant), so the
    # polygon ring is 0..count-1 and the wrap edge goes count-1 -> 0
    idx = jnp.arange(n)
    count = jnp.sum(valid)
    nxt = jnp.where(idx == count - 1, 0, (idx + 1) % n)
    d_next = d[nxt]
    pts_next = pts[nxt]

    inside = d >= 0
    inside_next = d_next >= 0
    seg_valid = idx < count

    t = d / jnp.where(jnp.abs(d - d_next) < 1e-12, 1e-12, d - d_next)
    inter = pts + t[:, None] * (pts_next - pts)

    # each input vertex emits up to 2 outputs: [curr if inside, inter if edge crosses]
    out_pts = jnp.zeros((2 * n, 2), pts.dtype)
    out_valid = jnp.zeros((2 * n,), bool)
    out_pts = out_pts.at[0::2].set(pts)
    out_valid = out_valid.at[0::2].set(valid & inside)
    out_pts = out_pts.at[1::2].set(inter)
    out_valid = out_valid.at[1::2].set(seg_valid & (inside != inside_next))

    # compact preserving order: stable sort by (not valid)
    order = jnp.argsort(jnp.where(out_valid, 0, 1), stable=True)
    out_pts = out_pts[order][:n]
    out_valid = out_valid[order][:n]

    # forward-fill invalid slots with the last valid vertex (shoelace-neutral)
    def ff(carry, xv):
        pt, ok = xv
        pt = jnp.where(ok, pt, carry)
        return pt, pt

    first = out_pts[0]
    _, filled = jax.lax.scan(ff, first, (out_pts, out_valid))
    return filled, out_valid


def _pair_intersection_area(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """c1, c2: (4, 2) corner sets (consistent winding) -> intersection area."""
    n = 16
    pts = jnp.zeros((n, 2), c1.dtype).at[:4].set(c1)
    # forward fill initial buffer
    pts = pts.at[4:].set(jnp.broadcast_to(c1[3], (n - 4, 2)))
    valid = jnp.arange(n) < 4

    # our corner order is clockwise in (x, y-down) screen algebra; make the
    # half-plane test consistent by iterating edges in that order
    for i in range(4):
        pts, valid = _clip_polygon(pts, valid, c2[i], c2[(i + 1) % 4])
    area = _polygon_area(pts)
    return jnp.where(jnp.sum(valid) >= 3, area, 0.0)


def pairwise_rotated_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N,5),(M,5) XYWHA -> (N,M) exact IoU."""
    c1 = rotated_to_corners(boxes1)
    c2 = rotated_to_corners(boxes2)
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]

    inter = jax.vmap(
        lambda ca: jax.vmap(lambda cb: _pair_intersection_area(ca, cb))(c2)
    )(c1)
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def rotated_nms(
    boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
    max_out: int, valid=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy rotated NMS with fixed output slots (mirrors ops.nms.nms_select
    but with exact rotated IoU)."""
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    live = jnp.where(jnp.asarray(valid), scores, NEG_INF) if valid is not None \
        else scores
    corners = rotated_to_corners(boxes)
    areas = boxes[:, 2] * boxes[:, 3]

    def body(state, _):
        live_scores = state
        i = jnp.argmax(live_scores)
        ok = live_scores[i] > NEG_INF / 2
        ci = corners[i]
        inter = jax.vmap(lambda cb: _pair_intersection_area(ci, cb))(corners)
        iou = inter / jnp.maximum(areas[i] + areas - inter, 1e-12)
        live_scores = jnp.where(ok & (iou > iou_threshold), NEG_INF, live_scores)
        live_scores = live_scores.at[i].set(NEG_INF)
        return live_scores, (i.astype(jnp.int32), ok)

    _, (keep_idx, keep_valid) = jax.lax.scan(body, live, None, length=max_out)
    return jnp.where(keep_valid, keep_idx, 0), keep_valid


# --------------------------------------------------- rotated delta transform
def get_rotated_deltas(src, target, weights=(1.0, 1.0, 1.0, 1.0, 1.0)):
    """Box2BoxTransformRotated.get_deltas (d2 semantics: da normalized to
    (-180, 180], scaled by pi/180)."""
    wx, wy, ww, wh, wa = weights
    eps = 1e-7
    dx = wx * (target[..., 0] - src[..., 0]) / jnp.maximum(src[..., 2], eps)
    dy = wy * (target[..., 1] - src[..., 1]) / jnp.maximum(src[..., 3], eps)
    dw = ww * jnp.log(jnp.maximum(target[..., 2], eps) / jnp.maximum(src[..., 2], eps))
    dh = wh * jnp.log(jnp.maximum(target[..., 3], eps) / jnp.maximum(src[..., 3], eps))
    da = target[..., 4] - src[..., 4]
    da = (da + 180.0) % 360.0 - 180.0
    da = da * (math.pi / 180.0) * wa
    return jnp.stack([dx, dy, dw, dh, da], axis=-1)


def apply_rotated_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh, wa = weights
    clamp = math.log(1000.0 / 16.0)
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, None, clamp)
    dh = jnp.clip(deltas[..., 3] / wh, None, clamp)
    da = deltas[..., 4] / wa * (180.0 / math.pi)

    cx = dx * boxes[..., 2] + boxes[..., 0]
    cy = dy * boxes[..., 3] + boxes[..., 1]
    w = jnp.exp(dw) * boxes[..., 2]
    h = jnp.exp(dh) * boxes[..., 3]
    a = boxes[..., 4] + da
    a = (a + 180.0) % 360.0 - 180.0
    return jnp.stack([cx, cy, w, h, a], axis=-1)
