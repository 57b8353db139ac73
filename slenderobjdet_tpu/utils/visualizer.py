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

    def get(self) -> np.ndarray:
        return self.img
