from .losses import (
    iou_loss_boxes,
    iou_loss_ltrb,
    optax_sigmoid_ce,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from .nms import batched_nms, nms_select

__all__ = [
    "iou_loss_boxes",
    "iou_loss_ltrb",
    "optax_sigmoid_ce",
    "sigmoid_focal_loss",
    "smooth_l1_loss",
    "batched_nms",
    "nms_select",
]
