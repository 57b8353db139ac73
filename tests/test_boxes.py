import numpy as np

from slenderobjdet_tpu.structures import boxes as B


def random_boxes(rng, n, size=100.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.5 + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def brute_iou(b1, b2):
    out = np.zeros((len(b1), len(b2)), np.float32)
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
            iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
            inter = ix * iy
            ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
            out[i, j] = inter / ua if ua > 0 else 0.0
    return out


def test_pairwise_iou_matches_bruteforce(rng):
    b1 = random_boxes(rng, 13)
    b2 = random_boxes(rng, 7)
    np.testing.assert_allclose(B.pairwise_iou(b1, b2), brute_iou(b1, b2), atol=1e-5)


def test_deltas_roundtrip(rng):
    src = random_boxes(rng, 20)
    tgt = random_boxes(rng, 20)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = B.get_deltas(src, tgt, weights=w)
    rec = B.apply_deltas(deltas, src, weights=w)
    np.testing.assert_allclose(rec, tgt, atol=1e-3)


def test_ltrb_roundtrip(rng):
    locs = rng.rand(10, 2).astype(np.float32) * 50
    boxes = random_boxes(rng, 10)
    ltrb = np.stack(
        [
            locs[:, 0] - boxes[:, 0],
            locs[:, 1] - boxes[:, 1],
            boxes[:, 2] - locs[:, 0],
            boxes[:, 3] - locs[:, 1],
        ],
        axis=-1,
    )
    rec = B.decode_ltrb(locs, ltrb)
    np.testing.assert_allclose(rec, boxes, atol=1e-5)


def test_clip_and_area():
    boxes = np.array([[-5.0, -5.0, 10.0, 10.0], [0.0, 0.0, 200.0, 50.0]], np.float32)
    clipped = B.clip(boxes, 40, 60)
    np.testing.assert_allclose(clipped, [[0, 0, 10, 10], [0, 0, 60, 40]])
    np.testing.assert_allclose(B.area(clipped), [100.0, 2400.0])
