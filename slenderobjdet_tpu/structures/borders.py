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

from . import native as _native

# set False to force the pure-numpy renderer (the oracle for the C kernel)
USE_NATIVE = True


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


def _min_edge_distance(hull: np.ndarray, xs: np.ndarray, ys: np.ndarray
                       ) -> np.ndarray:
    """Min distance from each pixel to any hull edge SEGMENT (the
    reference's compute_distance, borders.py:167-192: perpendicular distance
    where the foot falls on the segment, else nearest-endpoint distance)."""
    k = hull.shape[0]
    best = np.full(xs.shape, np.inf, np.float64)
    for i in range(k):
        a, b = hull[i], hull[(i + 1) % k]
        d1sq = (xs - a[0]) ** 2 + (ys - a[1]) ** 2
        d2sq = (xs - b[0]) ** 2 + (ys - b[1]) ** 2
        absq = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
        denom = 2.0 * np.sqrt(np.maximum(d1sq * d2sq, 1e-12))
        cosin = (absq - d1sq - d2sq) / denom
        sinsq = np.clip(1.0 - cosin ** 2, 0.0, None)
        perp = np.sqrt(d1sq * d2sq * sinsq / max(absq, 1e-12))
        d = np.where(cosin < 0, np.sqrt(np.minimum(d1sq, d2sq)), perp)
        best = np.minimum(best, d)
    return best


def _triangle_fan_sizes(hull: np.ndarray, o: np.ndarray, xs: np.ndarray,
                        ys: np.ndarray) -> np.ndarray:
    """(Hc, Wc, 2) size map: each fan triangle (o, v_i, v_i+1) filled with
    |midpoint - o| per axis; the closing triangle (v_k-1, v_0) with the
    scalar L2 norm in both channels (the reference's distance_in_triangle
    loop + tail, borders.py:90-115). fmax-combined like cv2.fillPoly
    overwrites under np.maximum."""
    k = hull.shape[0]
    out = np.zeros((*xs.shape, 2), np.float32)
    for i in range(k):
        a, b = hull[i], hull[(i + 1) % k]
        m = (a + b) / 2.0
        if i < k - 1:
            val = np.abs(m - o)                      # (|dx|, |dy|)
        else:
            val = np.full(2, np.sqrt(np.square(m - o).sum()))
        # point-in-triangle (o, a, b) via signed areas
        d1 = (xs - a[0]) * (o[1] - a[1]) - (ys - a[1]) * (o[0] - a[0])
        d2 = (xs - b[0]) * (a[1] - b[1]) - (ys - b[1]) * (a[0] - b[0])
        d3 = (xs - o[0]) * (b[1] - o[1]) - (ys - o[1]) * (b[0] - o[0])
        neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
        pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
        inside = ~(neg & pos)
        out = np.where(inside[..., None],
                       np.maximum(out, val.astype(np.float32)), out)
    return out


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
        # float64 hull so the numpy and native renderers see identical edge
        # geometry (float32 edge subtraction flips inside/outside at the
        # boundary between the two otherwise)
        hull = hull.astype(np.float64)
        dilated = offset_convex_polygon(hull, np.sqrt(area) * 0.1)
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
            hull, dilated = geo
            x0 = int(max(0, np.floor(dilated[:, 0].min())))
            y0 = int(max(0, np.floor(dilated[:, 1].min())))
            x1 = int(min(W, np.ceil(dilated[:, 0].max()) + 1))
            y1 = int(min(H, np.ceil(dilated[:, 1].max()) + 1))
            if x1 <= x0 or y1 <= y0:
                continue
            if (USE_NATIVE and _native.available()
                    and _native.render_center_score(
                        hull.astype(np.float64), hull.mean(0), standard,
                        sigma, (x0, y0, x1, y1), out)):
                continue
            xs, ys = np.meshgrid(np.arange(x0, x1, dtype=np.float64),
                                 np.arange(y0, y1, dtype=np.float64))
            # the reference ramps over the HULL fan (center_masks,
            # borders.py:233-263), the dilation only widens the crop window
            t = radial_fraction(hull, xs, ys)
            if standard == "linear":
                score = np.clip(1.0 - t, 0.0, 1.0)
            else:
                score = np.where(t <= 1.0, np.exp(-(t ** 2) / (2 * sigma ** 2)),
                                 0.0)
            out[y0:y1, x0:x1] = np.fmax(out[y0:y1, x0:x1],
                                        score.astype(np.float32))
        return out

    def masks(self, mask_size: Tuple[int, int]
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Renders the reference's three supervision maps
        (`BorderMasks.masks`/`border_masks`, borders.py:291-390):

        - border (H, W): fmax of (a) the border-proximity band
          clip(1 - d_edge/dilate_dist, 0, 1) over the dilated window
          (draw_border_map, :125-164) and (b) the inside linear ramp
          0@center -> 1@hull-boundary (mask_in_triangle reverse=False);
        - center (H, W): the reverse linear ramp 1@center -> 0@boundary;
        - size (H, W, 2): per triangle (O, v_i, v_i+1) of the hull fan, the
          per-axis |midpoint(v_i, v_i+1) - O| — with the reference's quirk
          that the closing triangle is filled with the scalar L2 distance in
          BOTH channels (distance_in_triangle, :90-115).
        """
        H, W = mask_size
        border = np.zeros((H, W), np.float32)
        center = np.zeros((H, W), np.float32)
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
            o = hull.mean(0)
            area = cv2.contourArea(hull.astype(np.float32))
            if (USE_NATIVE and _native.available()
                    and _native.render_instance_maps(
                        hull.astype(np.float64), o,
                        np.sqrt(max(area, 0.0)) * 0.1, (x0, y0, x1, y1),
                        border, center, sizes)):
                continue
            xs, ys = np.meshgrid(np.arange(x0, x1, dtype=np.float64),
                                 np.arange(y0, y1, dtype=np.float64))
            t = radial_fraction(hull, xs, ys, center=o)
            inside = t <= 1.0

            # (a) border-proximity band over the dilated window
            dilate_dist = np.sqrt(max(area, 0.0)) * 0.1
            d_edge = _min_edge_distance(hull, xs, ys)
            band = np.clip(1.0 - d_edge / max(dilate_dist, 1e-9), 0.0, 1.0)
            # (b) inside ramp
            ramp = np.where(inside, t, 0.0)
            border[y0:y1, x0:x1] = np.fmax(
                border[y0:y1, x0:x1],
                np.fmax(band, ramp).astype(np.float32),
            )

            center[y0:y1, x0:x1] = np.fmax(
                center[y0:y1, x0:x1],
                np.where(inside, 1.0 - t, 0.0).astype(np.float32),
            )

            size_inst = _triangle_fan_sizes(hull, o, xs, ys)
            sizes[y0:y1, x0:x1] = np.fmax(sizes[y0:y1, x0:x1], size_inst)
        return border, center, sizes

    def border_masks(self, mask_size: Tuple[int, int]
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """(border, sizes) pair — see masks()."""
        border, _, sizes = self.masks(mask_size)
        return border, sizes
