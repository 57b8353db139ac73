"""Border / center / size map rendering from polygons (host-side numpy).

Counterpart of the reference's `BorderMasks`
(`slender_det/structures/borders.py:195-400`): per instance, the convex hull
is dilated by 10% of sqrt(area) and a score map is rendered that is 1 at the
hull center decaying to 0 at the (dilated) border — used by FCOSV3's
mask-based center sampling (fcosv3.py:129-142) and the BorderMaskMapper.

Implementation note: the reference renders per-triangle affine ramps
(cv2 warps) and offsets polygons with pyclipper. For a convex polygon with
interior center O those ramps equal the closed-form radial fraction
t(p) = max_e <n_e, p-O> / <n_e, v_e-O>  (n_e = outward edge normal), so we
compute that directly — vectorized over pixels, no pyclipper dependency.
score = 1 - t ("linear") or exp(-t^2 / (2 sigma^2)) ("gaussian").
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def convex_hull(points: np.ndarray) -> Optional[np.ndarray]:
    pts = points.reshape(-1, 2).astype(np.float32)
    hull = cv2.convexHull(pts, clockwise=False).reshape(-1, 2)
    return hull if hull.shape[0] >= 3 else None


def offset_convex_polygon(hull: np.ndarray, dist: float) -> np.ndarray:
    """Exact outward offset of a convex polygon: move each edge along its
    outward normal by `dist` and intersect adjacent offset edges."""
    k = hull.shape[0]
    center = hull.mean(0)
    out = []
    lines = []
    for i in range(k):
        a, b = hull[i], hull[(i + 1) % k]
        e = b - a
        n = np.array([e[1], -e[0]], np.float64)
        n /= max(np.linalg.norm(n), 1e-12)
        if np.dot(n, a - center) < 0:
            n = -n
        lines.append((a + n * dist, b + n * dist))
    for i in range(k):
        p1, p2 = lines[(i - 1) % k]
        p3, p4 = lines[i]
        d1 = p2 - p1
        d2 = p4 - p3
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-9:
            out.append(p3)
            continue
        t = ((p3[0] - p1[0]) * d2[1] - (p3[1] - p1[1]) * d2[0]) / denom
        out.append(p1 + t * d1)
    return np.array(out, np.float64)


def radial_fraction(hull: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                    center: Optional[np.ndarray] = None) -> np.ndarray:
    """t(p) in [0, inf): 0 at center, 1 on the hull boundary, >1 outside."""
    if center is None:
        center = hull.mean(0)
    k = hull.shape[0]
    t = np.full(xs.shape, -np.inf, np.float64)
    for i in range(k):
        a, b = hull[i], hull[(i + 1) % k]
        e = b - a
        n = np.array([e[1], -e[0]], np.float64)
        if np.dot(n, a - center) < 0:
            n = -n
        h = np.dot(n, a - center)
        if h <= 1e-9:
            continue
        t = np.maximum(t, (n[0] * (xs - center[0]) + n[1] * (ys - center[1])) / h)
    return np.clip(t, 0.0, None)


class BorderMasks:
    """Per-image polygon container with map-rendering methods."""

    def __init__(self, polygons: List[List[np.ndarray]]):
        # polygons[i] = list of flat [x0,y0,...] arrays for instance i
        self.polygons = [
            [np.asarray(p, np.float64) for p in inst] for inst in polygons
        ]

    def __len__(self):
        return len(self.polygons)

    def _instance_geometry(self, inst):
        pts = np.concatenate(inst).reshape(-1, 2)
        hull = convex_hull(pts)
        if hull is None:
            return None
        area = cv2.contourArea(hull.astype(np.float32))
        if area <= 1:
            return None
        dilated = offset_convex_polygon(hull.astype(np.float64),
                                        np.sqrt(area) * 0.1)
        return hull, dilated

    def center_masks(self, mask_size: Tuple[int, int], standard: str = "gaussian",
                     sigma: float = 0.5) -> np.ndarray:
        """(H, W) float map: max over instances of the center score."""
        H, W = mask_size
        out = np.zeros((H, W), np.float32)
        for inst in self.polygons:
            geo = self._instance_geometry(inst)
            if geo is None:
                continue
            _, dilated = geo
            x0 = int(max(0, np.floor(dilated[:, 0].min())))
            y0 = int(max(0, np.floor(dilated[:, 1].min())))
            x1 = int(min(W, np.ceil(dilated[:, 0].max()) + 1))
            y1 = int(min(H, np.ceil(dilated[:, 1].max()) + 1))
            if x1 <= x0 or y1 <= y0:
                continue
            xs, ys = np.meshgrid(np.arange(x0, x1, dtype=np.float64),
                                 np.arange(y0, y1, dtype=np.float64))
            t = radial_fraction(dilated, xs, ys)
            if standard == "linear":
                score = np.clip(1.0 - t, 0.0, 1.0)
            else:
                score = np.where(t <= 1.0, np.exp(-(t ** 2) / (2 * sigma ** 2)),
                                 0.0)
            out[y0:y1, x0:x1] = np.fmax(out[y0:y1, x0:x1],
                                        score.astype(np.float32))
        return out

    def border_masks(self, mask_size: Tuple[int, int]
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (border (H,W): 1 at the border decaying inward,
        sizes (H,W,2): (h,w) of the covering instance)."""
        H, W = mask_size
        border = np.zeros((H, W), np.float32)
        sizes = np.zeros((H, W, 2), np.float32)
        for inst in self.polygons:
            geo = self._instance_geometry(inst)
            if geo is None:
                continue
            hull, dilated = geo
            x0 = int(max(0, np.floor(dilated[:, 0].min())))
            y0 = int(max(0, np.floor(dilated[:, 1].min())))
            x1 = int(min(W, np.ceil(dilated[:, 0].max()) + 1))
            y1 = int(min(H, np.ceil(dilated[:, 1].max()) + 1))
            if x1 <= x0 or y1 <= y0:
                continue
            xs, ys = np.meshgrid(np.arange(x0, x1, dtype=np.float64),
                                 np.arange(y0, y1, dtype=np.float64))
            t = radial_fraction(dilated, xs, ys)
            inside = t <= 1.0
            score = np.where(inside, t, 0.0).astype(np.float32)
            border[y0:y1, x0:x1] = np.fmax(border[y0:y1, x0:x1], score)
            h = hull[:, 1].max() - hull[:, 1].min()
            w = hull[:, 0].max() - hull[:, 0].min()
            patch = sizes[y0:y1, x0:x1]
            patch[inside] = (h, w)
            sizes[y0:y1, x0:x1] = patch
        return border, sizes
