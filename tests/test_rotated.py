import math

import numpy as np
import jax.numpy as jnp

from slenderobjdet_tpu.ops.rotated import (
    apply_rotated_deltas,
    get_rotated_deltas,
    pairwise_rotated_iou,
    rotated_nms,
    rotated_to_corners,
)


def axis_aligned_iou(b1, b2):
    """Oracle for angle=0 boxes via ordinary IoU."""
    def to_xyxy(b):
        return [b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2]

    a, b = to_xyxy(b1), to_xyxy(b2)
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    u = b1[2] * b1[3] + b2[2] * b2[3] - inter
    return inter / u if u > 0 else 0.0


def test_corners_identity():
    c = np.asarray(rotated_to_corners(jnp.asarray([[10.0, 20.0, 4.0, 2.0, 0.0]])))
    np.testing.assert_allclose(
        c[0], [[8, 19], [12, 19], [12, 21], [8, 21]], atol=1e-5
    )


def test_corners_rot90_swaps_extent():
    c = np.asarray(rotated_to_corners(jnp.asarray([[0.0, 0.0, 4.0, 2.0, 90.0]])))
    xs, ys = c[0, :, 0], c[0, :, 1]
    assert np.ptp(xs) == np.testing.assert_allclose(np.ptp(xs), 2.0, atol=1e-5) or True
    np.testing.assert_allclose(np.ptp(xs), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.ptp(ys), 4.0, atol=1e-5)


def test_iou_axis_aligned_matches_oracle(rng):
    n, m = 8, 6
    b1 = np.stack([
        rng.rand(n) * 50 + 20, rng.rand(n) * 50 + 20,
        rng.rand(n) * 30 + 5, rng.rand(n) * 30 + 5, np.zeros(n)
    ], 1).astype(np.float32)
    b2 = np.stack([
        rng.rand(m) * 50 + 20, rng.rand(m) * 50 + 20,
        rng.rand(m) * 30 + 5, rng.rand(m) * 30 + 5, np.zeros(m)
    ], 1).astype(np.float32)
    got = np.asarray(pairwise_rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(n):
        for j in range(m):
            assert abs(got[i, j] - axis_aligned_iou(b1[i], b2[j])) < 1e-4


def test_iou_rotation_invariance():
    # same box rotated by the same angle: IoU must be 1
    a = jnp.asarray([[10.0, 10.0, 8.0, 3.0, 37.0]])
    np.testing.assert_allclose(
        np.asarray(pairwise_rotated_iou(a, a)), [[1.0]], atol=1e-5
    )
    # 45-degree square overlapping an axis-aligned square: known value
    sq = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    rot = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 45.0]])
    # intersection is a regular octagon: area = 8*(sqrt(2)-1) ≈ 3.3137
    inter = 8 * (math.sqrt(2) - 1)
    expected = inter / (8 - inter)
    np.testing.assert_allclose(
        np.asarray(pairwise_rotated_iou(sq, rot)), [[expected]], atol=1e-4
    )


def test_iou_90deg_wh_swap():
    a = jnp.asarray([[0.0, 0.0, 6.0, 2.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 2.0, 6.0, 90.0]])
    np.testing.assert_allclose(
        np.asarray(pairwise_rotated_iou(a, b)), [[1.0]], atol=1e-4
    )


def test_rotated_nms():
    boxes = jnp.asarray([
        [10.0, 10.0, 8.0, 4.0, 30.0],
        [10.5, 10.0, 8.0, 4.0, 30.0],   # near-duplicate
        [40.0, 40.0, 6.0, 6.0, 0.0],
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, valid = rotated_nms(boxes, scores, 0.5, max_out=3)
    kept = list(np.asarray(idx)[np.asarray(valid)])
    assert kept == [0, 2]


def test_rotated_deltas_roundtrip(rng):
    src = np.stack([
        rng.rand(10) * 50, rng.rand(10) * 50,
        rng.rand(10) * 20 + 2, rng.rand(10) * 20 + 2,
        rng.rand(10) * 360 - 180,
    ], 1).astype(np.float32)
    tgt = np.stack([
        rng.rand(10) * 50, rng.rand(10) * 50,
        rng.rand(10) * 20 + 2, rng.rand(10) * 20 + 2,
        rng.rand(10) * 170 - 85,
    ], 1).astype(np.float32)
    d = get_rotated_deltas(jnp.asarray(src), jnp.asarray(tgt))
    rec = np.asarray(apply_rotated_deltas(d, jnp.asarray(src)))
    np.testing.assert_allclose(rec[:, :4], tgt[:, :4], atol=1e-3)
    da = (rec[:, 4] - tgt[:, 4] + 180) % 360 - 180
    np.testing.assert_allclose(da, np.zeros(10), atol=1e-3)
