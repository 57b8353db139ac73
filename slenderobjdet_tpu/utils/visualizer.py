"""Detection visualizer with slenderness-ratio grouping (cv2-based).

Counterpart of the reference's `slender_det/utils/visualizer.py` (d2
Visualizer subclass that draws proposals/anchors separately and groups
objects by ratio ranges, visualizer.py:149-178)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

RATIO_RANGES = [(0.0, 1 / 5), (1 / 5, 1 / 3), (1 / 3, 3.0), (3.0, 5.0),
                (5.0, 1e5)]
RATIO_COLORS = [(0, 0, 255), (0, 128, 255), (0, 255, 0), (255, 128, 0),
                (255, 0, 0)]  # BGR: red = most slender


def ratio_group(w: float, h: float) -> int:
    r = w / max(h, 1e-6)
    for i, (lo, hi) in enumerate(RATIO_RANGES):
        if lo <= r < hi:
            return i
    return len(RATIO_RANGES) - 1


class Visualizer:
    def __init__(self, image_bgr: np.ndarray,
                 class_names: Optional[Sequence[str]] = None):
        self.img = image_bgr.copy()
        self.class_names = class_names

    def draw_boxes(self, boxes: np.ndarray, scores=None, classes=None,
                   color_by_ratio: bool = True, thickness: int = 1
                   ) -> np.ndarray:
        """boxes: (N, 4) XYXY."""
        for i, box in enumerate(np.asarray(boxes)):
            x1, y1, x2, y2 = [int(v) for v in box]
            color = (
                RATIO_COLORS[ratio_group(x2 - x1, y2 - y1)]
                if color_by_ratio else (0, 255, 0)
            )
            cv2.rectangle(self.img, (x1, y1), (x2, y2), color, thickness)
            label = ""
            if classes is not None:
                c = int(np.asarray(classes)[i])
                label = (self.class_names[c] if self.class_names
                         and c < len(self.class_names) else str(c))
            if scores is not None:
                label += f" {float(np.asarray(scores)[i]):.2f}"
            if label:
                cv2.putText(self.img, label, (x1, max(y1 - 2, 8)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.35, color, 1)
        return self.img

    def draw_rotated_boxes(self, rboxes: np.ndarray, thickness: int = 1
                           ) -> np.ndarray:
        for box in np.asarray(rboxes):
            cx, cy, w, h, a = [float(v) for v in box]
            pts = cv2.boxPoints(((cx, cy), (w, h), -a)).astype(np.int32)
            color = RATIO_COLORS[ratio_group(w, h)]
            cv2.polylines(self.img, [pts], True, color, thickness)
        return self.img

    def draw_proposals(self, proposals: np.ndarray, max_n: int = 50
                       ) -> np.ndarray:
        for box in np.asarray(proposals)[:max_n]:
            x1, y1, x2, y2 = [int(v) for v in box]
            cv2.rectangle(self.img, (x1, y1), (x2, y2), (180, 180, 180), 1)
        return self.img

    def draw_anchors(self, anchors: np.ndarray, max_n: int = 50
                     ) -> np.ndarray:
        """Anchors drawn dashed-style (corner ticks) in yellow so they are
        visually distinct from proposals (reference visualizer draws
        proposals and anchors as separate overlays, visualizer.py:149-178)."""
        for box in np.asarray(anchors)[:max_n]:
            x1, y1, x2, y2 = [int(v) for v in box]
            t = max(2, min(x2 - x1, y2 - y1) // 4)
            color = (0, 220, 220)
            for (cx, cy, dx, dy) in ((x1, y1, 1, 1), (x2, y1, -1, 1),
                                     (x1, y2, 1, -1), (x2, y2, -1, -1)):
                cv2.line(self.img, (cx, cy), (cx + dx * t, cy), color, 1)
                cv2.line(self.img, (cx, cy), (cx, cy + dy * t), color, 1)
        return self.img

    def draw_instances(self, boxes: Optional[np.ndarray] = None,
                       masks: Optional[List] = None, scores=None,
                       classes=None, alpha: float = 0.45,
                       color_by_ratio: bool = True) -> np.ndarray:
        """Full instance rendering — the counterpart of the reference's
        `draw_instance_predictions` (d2-Visualizer subclass,
        /root/reference/slender_det/utils/visualizer.py:180-220): filled
        polygon masks (alpha-blended), box outlines and class/score labels,
        all colored by the instance's slenderness group (the paper-figure
        style of visualize_slender_results).

        masks: list of polygon lists — each instance a list of (K, 2) float
        arrays in absolute xy pixel coordinates (COCO 'segmentation' flattened
        pairs are accepted too).
        """
        n = len(boxes) if boxes is not None else len(masks)
        boxes = np.asarray(boxes) if boxes is not None else None
        overlay = self.img.copy()
        colors = []
        for i in range(n):
            if boxes is not None:
                x1, y1, x2, y2 = boxes[i]
                w, h = x2 - x1, y2 - y1
            elif masks is not None and len(masks[i]):
                pts = _as_polygons(masks[i])
                allp = np.concatenate(pts, axis=0)
                w = allp[:, 0].max() - allp[:, 0].min()
                h = allp[:, 1].max() - allp[:, 1].min()
            else:
                w = h = 1.0
            color = (RATIO_COLORS[ratio_group(float(w), float(h))]
                     if color_by_ratio else (0, 255, 0))
            colors.append(color)
            if masks is not None and i < len(masks) and len(masks[i]):
                polys = [p.astype(np.int32) for p in _as_polygons(masks[i])]
                cv2.fillPoly(overlay, polys, color)
                cv2.polylines(self.img, polys, True, color, 1)
        # alpha-blend the filled masks
        self.img = cv2.addWeighted(overlay, alpha, self.img, 1.0 - alpha, 0)

        for i in range(n):
            color = colors[i]
            label = ""
            if classes is not None:
                c = int(np.asarray(classes)[i])
                label = (self.class_names[c] if self.class_names
                         and c < len(self.class_names) else str(c))
            if scores is not None:
                label += f" {float(np.asarray(scores)[i]):.2f}"
            if boxes is not None:
                x1, y1, x2, y2 = [int(v) for v in boxes[i]]
                cv2.rectangle(self.img, (x1, y1), (x2, y2), color, 1)
                if label:
                    cv2.putText(self.img, label, (x1, max(y1 - 2, 8)),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.35, color, 1)
        return self.img

    def get(self) -> np.ndarray:
        return self.img


def _as_polygons(polys) -> List[np.ndarray]:
    """Normalize COCO-style segmentation (flat [x0,y0,x1,y1,...] lists) or
    (K, 2) arrays into a list of (K, 2) float arrays."""
    out = []
    for p in polys:
        a = np.asarray(p, np.float64)
        if a.ndim == 1:
            a = a.reshape(-1, 2)
        out.append(a)
    return out


def group_by(object_list: Sequence, values: Sequence[float],
             ranges_dic: Dict[str, Sequence[Tuple[float, float]]]
             ) -> Dict[str, List]:
    """Group objects by whether their value falls in any of a key's ranges —
    counterpart of reference visualizer.py:149-163 (`group_by`): an object
    may land in multiple groups since ranges may overlap."""
    grouped: Dict[str, List] = {k: [] for k in ranges_dic}
    for obj, v in zip(object_list, values):
        for key, ranges in ranges_dic.items():
            rs = ranges if isinstance(ranges[0], (list, tuple)) else [ranges]
            if any(lo <= v < hi for lo, hi in rs):
                grouped[key].append(obj)
    return grouped


def smart_concatenate(images: List[np.ndarray], num_rows: Optional[int] = None,
                      num_columns: Optional[int] = None,
                      out_shape: Optional[Tuple[int, int]] = None
                      ) -> np.ndarray:
    """Tile same-shaped images into a grid canvas (reference
    visualizer.py:31-69 `smart_concatenate`)."""
    import math

    n = len(images)
    assert n > 0 and all(im.shape == images[0].shape for im in images)
    if num_rows is None and num_columns is None:
        num_columns = int(math.sqrt(n)) or 1
        num_rows = int(math.ceil(n / num_columns))
    elif num_rows is None:
        num_rows = int(math.ceil(n / num_columns))
    elif num_columns is None:
        num_columns = int(math.ceil(n / num_rows))

    canvas = np.zeros_like(images[0])
    if out_shape is not None:
        canvas = cv2.resize(canvas, out_shape[::-1])
    h = canvas.shape[0] // num_rows
    w = canvas.shape[1] // num_columns
    for r in range(num_rows):
        for c in range(num_columns):
            idx = r * num_columns + c
            if idx >= n:
                break
            canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = cv2.resize(
                images[idx], (w, h))
    return canvas
