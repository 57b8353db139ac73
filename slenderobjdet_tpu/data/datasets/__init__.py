from .coco import load_coco_json, register_coco_instances
from .rotated_coco import load_rotated_coco_json, register_rotated_coco_instances

__all__ = [
    "load_coco_json",
    "register_coco_instances",
    "load_rotated_coco_json",
    "register_rotated_coco_instances",
]
