import numpy as np

from slenderobjdet_tpu.ops.nms import batched_nms, nms_select


def greedy_nms_oracle(boxes, scores, thresh, valid=None):
    """Classic O(n^2) greedy NMS in numpy (test oracle)."""
    order = np.argsort(-scores)
    if valid is not None:
        order = [i for i in order if valid[i]]
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clip(0) * (boxes[:, 3] - boxes[:, 1]).clip(0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ix1 = np.maximum(boxes[i, 0], boxes[:, 0])
        iy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        ix2 = np.minimum(boxes[i, 2], boxes[:, 2])
        iy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = (ix2 - ix1).clip(0) * (iy2 - iy1).clip(0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        suppressed |= iou > thresh
    return keep


def random_boxes_scores(rng, n):
    xy = rng.rand(n, 2).astype(np.float32) * 80
    wh = rng.rand(n, 2).astype(np.float32) * 40 + 4
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def test_nms_matches_oracle(rng):
    for trial in range(5):
        boxes, scores = random_boxes_scores(rng, 64)
        expected = greedy_nms_oracle(boxes, scores, 0.5)
        idx, valid = nms_select(boxes, scores, 0.5, max_out=64)
        got = list(np.asarray(idx)[np.asarray(valid)])
        assert got == expected, f"trial {trial}"


def test_nms_max_out_truncates(rng):
    boxes, scores = random_boxes_scores(rng, 64)
    expected = greedy_nms_oracle(boxes, scores, 0.5)
    k = max(1, len(expected) - 2)
    idx, valid = nms_select(boxes, scores, 0.5, max_out=k)
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == expected[:k]


def test_nms_respects_valid_mask(rng):
    boxes, scores = random_boxes_scores(rng, 32)
    valid = rng.rand(32) > 0.5
    expected = greedy_nms_oracle(boxes, scores, 0.5, valid=valid)
    idx, keep_valid = nms_select(boxes, scores, 0.5, max_out=32, valid=valid)
    got = list(np.asarray(idx)[np.asarray(keep_valid)])
    assert got == expected


def test_batched_nms_separates_classes(rng):
    # identical overlapping boxes with different class ids must all survive
    boxes = np.tile(np.array([[10.0, 10.0, 30.0, 30.0]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    classes = np.arange(4, dtype=np.int32)
    idx, valid = batched_nms(boxes, scores, classes, 0.5, max_out=8)
    assert int(np.asarray(valid).sum()) == 4

    # same class: only the best survives
    idx, valid = batched_nms(boxes, scores, np.zeros(4, np.int32), 0.5, max_out=8)
    kept = np.asarray(idx)[np.asarray(valid)]
    assert list(kept) == [0]
