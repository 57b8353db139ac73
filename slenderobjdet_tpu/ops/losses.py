"""Detection losses as pure jnp functions.

Parity targets in the reference:
- sigmoid focal loss: fvcore's `sigmoid_focal_loss` as used by FCOS/RetinaNet
  (`slender_det/modeling/meta_arch/fcos/fcos.py:284-317`)
- IoU family on (l,t,r,b) distances: `slender_det/layers/iou_loss.py:4-69`
  ("iou" = -log(iou), "linear_iou" = 1-iou, "giou" = 1-giou)
- IoU family on XYXY boxes: `slender_det/layers/iou_loss.py` box variant
- smooth-L1: `slender_det/layers/smooth_l1_loss_with_weight.py`

All functions are reduction-free (return per-element losses); callers apply
masks and normalizers so everything stays fixed-shape under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Per-element focal loss.

    logits, targets: same shape; targets in {0,1} (float).
    """
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * jnp.power(1.0 - p_t, gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid binary cross-entropy (elementwise)."""
    # max(x,0) - x*z + log(1 + exp(-|x|))
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def smooth_l1_loss(pred, target, beta: float):
    """Per-element smooth-L1 (Huber) loss; beta == 0 degenerates to L1."""
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def _ltrb_iou_terms(pred, target):
    """pred/target (...,4) as (l,t,r,b) distances from a shared location."""
    pred_l, pred_t, pred_r, pred_b = (pred[..., i] for i in range(4))
    tgt_l, tgt_t, tgt_r, tgt_b = (target[..., i] for i in range(4))

    tgt_area = (tgt_l + tgt_r) * (tgt_t + tgt_b)
    pred_area = (pred_l + pred_r) * (pred_t + pred_b)

    w_inter = jnp.minimum(pred_l, tgt_l) + jnp.minimum(pred_r, tgt_r)
    h_inter = jnp.minimum(pred_t, tgt_t) + jnp.minimum(pred_b, tgt_b)
    w_inter = jnp.clip(w_inter, 0.0, None)
    h_inter = jnp.clip(h_inter, 0.0, None)

    g_w = jnp.maximum(pred_l, tgt_l) + jnp.maximum(pred_r, tgt_r)
    g_h = jnp.maximum(pred_t, tgt_t) + jnp.maximum(pred_b, tgt_b)

    inter = w_inter * h_inter
    union = tgt_area + pred_area - inter
    enclose = g_w * g_h
    return inter, union, enclose


def iou_loss_ltrb(pred, target, loss_type: str = "iou"):
    """IoU loss on (l,t,r,b) regression targets. Returns per-row loss (...,)."""
    inter, union, enclose = _ltrb_iou_terms(pred, target)
    ious = (inter + 1.0) / (union + 1.0)
    if loss_type == "iou":
        return -jnp.log(ious)
    if loss_type == "linear_iou":
        return 1.0 - ious
    if loss_type == "giou":
        gious = ious - (enclose - union) / jnp.maximum(enclose, 1e-7)
        return 1.0 - gious
    raise ValueError(f"Unknown iou loss type {loss_type!r}")


def iou_loss_boxes(pred, target, loss_type: str = "giou", eps: float = 1e-7):
    """IoU loss on XYXY boxes. Returns per-row loss (...,)."""
    px1, py1, px2, py2 = (pred[..., i] for i in range(4))
    tx1, ty1, tx2, ty2 = (target[..., i] for i in range(4))

    pred_area = jnp.clip(px2 - px1, 0, None) * jnp.clip(py2 - py1, 0, None)
    tgt_area = jnp.clip(tx2 - tx1, 0, None) * jnp.clip(ty2 - ty1, 0, None)

    iw = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0, None)
    ih = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0, None)
    inter = iw * ih
    union = pred_area + tgt_area - inter
    ious = inter / jnp.maximum(union, eps)

    if loss_type == "iou":
        return -jnp.log(jnp.clip(ious, eps, None))
    if loss_type == "linear_iou":
        return 1.0 - ious
    if loss_type == "giou":
        ew = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
        eh = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
        enclose = ew * eh
        gious = ious - (enclose - union) / jnp.maximum(enclose, eps)
        return 1.0 - gious
    raise ValueError(f"Unknown iou loss type {loss_type!r}")
