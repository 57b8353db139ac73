from . import boxes
from .masks import compute_ann_ratio, ratio_of_bbox_xyxy, ratio_of_polygon, rbox_from_polygon

__all__ = [
    "boxes",
    "compute_ann_ratio",
    "ratio_of_bbox_xyxy",
    "ratio_of_polygon",
    "rbox_from_polygon",
]
