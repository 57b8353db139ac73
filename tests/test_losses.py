import numpy as np
import jax.numpy as jnp

from slenderobjdet_tpu.ops.losses import (
    iou_loss_boxes,
    iou_loss_ltrb,
    optax_sigmoid_ce,
    sigmoid_focal_loss,
    smooth_l1_loss,
)


def test_focal_loss_reduces_to_ce_at_gamma0():
    logits = jnp.array([[0.5, -1.0, 2.0]])
    targets = jnp.array([[1.0, 0.0, 1.0]])
    fl = sigmoid_focal_loss(logits, targets, alpha=-1.0, gamma=0.0)
    ce = optax_sigmoid_ce(logits, targets)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(ce), atol=1e-6)


def test_focal_loss_matches_manual():
    # manual per-element focal loss
    logits = np.array([1.5, -0.3, 0.0], np.float32)
    targets = np.array([1.0, 0.0, 1.0], np.float32)
    p = 1 / (1 + np.exp(-logits))
    ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    pt = p * targets + (1 - p) * (1 - targets)
    alpha, gamma = 0.25, 2.0
    at = alpha * targets + (1 - alpha) * (1 - targets)
    expected = at * ce * (1 - pt) ** gamma
    got = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), alpha, gamma)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_iou_loss_perfect_prediction():
    t = jnp.array([[3.0, 4.0, 5.0, 6.0]])
    # iou variant: -log((I+1)/(U+1)) == 0 when pred == target
    np.testing.assert_allclose(np.asarray(iou_loss_ltrb(t, t, "iou")), [0.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(iou_loss_ltrb(t, t, "linear_iou")),
        [1.0 - (8 * 10 + 1) / (8 * 10 + 1)],
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(iou_loss_ltrb(t, t, "giou")), [0.0], atol=1e-5)


def test_iou_loss_ltrb_known_value():
    pred = jnp.array([[1.0, 1.0, 1.0, 1.0]])    # 2x2 box around location
    tgt = jnp.array([[1.0, 1.0, 3.0, 3.0]])     # 4x4 box
    inter = 2 * 2  # w_inter = min(1,1)+min(1,3)=2; h same
    union = 16 + 4 - 4
    expected = -np.log((inter + 1) / (union + 1))
    got = iou_loss_ltrb(pred, tgt, "iou")
    np.testing.assert_allclose(np.asarray(got), [expected], atol=1e-5)


def test_iou_loss_boxes_giou_disjoint():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[2.0, 2.0, 3.0, 3.0]])
    # IoU=0, enclose=9, union=2 -> giou = 0 - 7/9; loss = 1 + 7/9
    np.testing.assert_allclose(
        np.asarray(iou_loss_boxes(a, b, "giou")), [1 + 7 / 9], atol=1e-5
    )


def test_smooth_l1():
    pred = jnp.array([0.0, 0.0, 0.0])
    tgt = jnp.array([0.05, 0.5, -2.0])
    beta = 0.1
    expected = np.array([0.5 * 0.05 ** 2 / beta, 0.5 - 0.05, 2.0 - 0.05])
    np.testing.assert_allclose(
        np.asarray(smooth_l1_loss(pred, tgt, beta)), expected, atol=1e-6
    )
    # beta=0 degenerates to L1
    np.testing.assert_allclose(
        np.asarray(smooth_l1_loss(pred, tgt, 0.0)), [0.05, 0.5, 2.0], atol=1e-6
    )
