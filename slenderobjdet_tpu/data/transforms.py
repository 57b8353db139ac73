"""Host-side image transforms (numpy/cv2) with deterministic RNG.

Counterpart of the reference's transform stack (d2 ResizeShortestEdge +
RandomFlip, `slender_det/data/utils.py:29-49`, plus ResizeLongestEdge from
`data/transforms/augmentation_impl.py`). Boxes are XYXY absolute and
transformed alongside the image. All randomness flows through an explicit
numpy Generator so the pipeline is reproducible per (seed, image index).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def resize_shortest_edge(
    image: np.ndarray,
    boxes: np.ndarray,
    short: int,
    max_size: int,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Scale so the shortest edge == short, capped so the longest <= max_size.
    Returns (image, boxes, scale)."""
    h, w = image.shape[:2]
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if (nh, nw) != (h, w):
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    # d2 transforms boxes by the exact ratio of the new/old sizes
    sx, sy = nw / w, nh / h
    boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
    return image, boxes, scale


def resize_longest_edge(
    image: np.ndarray, boxes: np.ndarray, long: int
) -> Tuple[np.ndarray, np.ndarray, float]:
    h, w = image.shape[:2]
    scale = long / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    sx, sy = nw / w, nh / h
    boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
    return image, boxes, scale


def horizontal_flip(
    image: np.ndarray, boxes: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    w = image.shape[1]
    image = image[:, ::-1]
    flipped = boxes.copy()
    flipped[:, 0] = w - boxes[:, 2]
    flipped[:, 2] = w - boxes[:, 0]
    return image, flipped


def pad_to(image: np.ndarray, pad_hw: Tuple[int, int]) -> np.ndarray:
    """Zero-pad bottom/right to a fixed shape (the fixed-shape replacement of
    detectron2's size-divisibility ImageList padding)."""
    h, w = image.shape[:2]
    ph, pw = pad_hw
    assert h <= ph and w <= pw, f"image {h}x{w} exceeds pad shape {ph}x{pw}"
    out = np.zeros((ph, pw) + image.shape[2:], dtype=image.dtype)
    out[:h, :w] = image
    return out


def choose_train_size(
    rng: np.random.Generator,
    min_sizes: Sequence[int],
    sampling: str = "choice",
) -> int:
    if sampling == "range" and len(min_sizes) == 2:
        return int(rng.integers(min_sizes[0], min_sizes[1] + 1))
    return int(min_sizes[rng.integers(len(min_sizes))])
