"""SlenderCOCOeval correctness against hand-computable oracles."""

import numpy as np
import pytest

from slenderobjdet_tpu.evaluation.coco_api import COCO
from slenderobjdet_tpu.evaluation.slender_cocoeval import (
    SlenderCOCOeval,
    bbox_iou_xywh,
)


def make_gt(anns, num_images=2, cats=(1, 2)):
    return COCO(
        {
            "images": [
                {"id": i + 1, "height": 100, "width": 100, "file_name": f"{i}.jpg"}
                for i in range(num_images)
            ],
            "annotations": anns,
            "categories": [{"id": c, "name": f"c{c}"} for c in cats],
        }
    )


def ann(ann_id, img, cat, bbox, iscrowd=0):
    return {
        "id": ann_id,
        "image_id": img,
        "category_id": cat,
        "bbox": list(map(float, bbox)),
        "area": float(bbox[2] * bbox[3]),
        "iscrowd": iscrowd,
    }


def det(img, cat, bbox, score):
    return {
        "image_id": img,
        "category_id": cat,
        "bbox": list(map(float, bbox)),
        "score": score,
    }


def run_eval(gt, dets):
    coco_dt = gt.loadRes(dets)
    e = SlenderCOCOeval(gt, coco_dt, "bbox")
    e.evaluate()
    e.accumulate()
    return e.summarize()


def test_bbox_iou_crowd():
    d = np.array([[0, 0, 10, 10]])
    g = np.array([[0, 0, 20, 20]])
    np.testing.assert_allclose(bbox_iou_xywh(d, g, [0]), [[100 / 400]])
    # crowd: intersection over dt area
    np.testing.assert_allclose(bbox_iou_xywh(d, g, [1]), [[1.0]])


def test_perfect_predictions_ap1():
    gt = make_gt([
        ann(1, 1, 1, [10, 10, 30, 30]),
        ann(2, 1, 2, [50, 50, 20, 20]),
        ann(3, 2, 1, [5, 5, 40, 40]),
    ])
    dets = [
        det(1, 1, [10, 10, 30, 30], 0.9),
        det(1, 2, [50, 50, 20, 20], 0.8),
        det(2, 1, [5, 5, 40, 40], 0.95),
    ]
    stats = run_eval(gt, dets)
    assert stats[0] == pytest.approx(1.0)   # AP
    assert stats[1] == pytest.approx(1.0)   # AP50
    assert stats[10] == pytest.approx(1.0)  # AR@100
    # ratio bucket 1/3-3 has all the gt (square-ish boxes)
    assert stats[5] == pytest.approx(1.0)
    # slender buckets have no gt -> -1
    assert stats[3] == -1 and stats[4] == -1


def test_one_missed_gt_half_recall():
    gt = make_gt([
        ann(1, 1, 1, [10, 10, 30, 30]),
        ann(2, 1, 1, [60, 60, 20, 20]),
    ])
    dets = [det(1, 1, [10, 10, 30, 30], 0.9)]
    stats = run_eval(gt, dets)
    # 101-pt interpolation: precision 1 for recall <= 0.5 -> AP = 51/101
    assert stats[0] == pytest.approx(51 / 101, abs=1e-6)
    assert stats[10] == pytest.approx(0.5)


def test_false_positive_before_tp():
    gt = make_gt([ann(1, 1, 1, [10, 10, 30, 30])])
    dets = [
        det(1, 1, [70, 70, 10, 10], 0.95),   # FP, higher score
        det(1, 1, [10, 10, 30, 30], 0.9),    # TP
    ]
    stats = run_eval(gt, dets)
    # precision at recall>0: TP at rank 2 -> p=0.5 for all recall points
    assert stats[0] == pytest.approx(0.5, abs=1e-6)


def test_localization_quality_thresholds():
    # 20x20 gt, det shifted by 5 px: IoU = (15*20)/(2*400-300) = 0.6
    gt = make_gt([ann(1, 1, 1, [10, 10, 20, 20])])
    dets = [det(1, 1, [15, 10, 20, 20], 0.9)]
    stats = run_eval(gt, dets)
    # matches at IoU thr 0.5,0.55,0.6 -> 3/10 thresholds count
    assert stats[1] == pytest.approx(1.0)       # AP50
    assert stats[2] == pytest.approx(0.0)       # AP75
    assert stats[0] == pytest.approx(0.3, abs=1e-6)


def test_slender_bucket_assignment():
    # slender gt: 50x5 box with rectangle segmentation -> oriented ratio 0.1
    slender = ann(1, 1, 1, [10, 10, 50, 5])
    slender["segmentation"] = [[10, 10, 60, 10, 60, 15, 10, 15]]
    square = ann(2, 2, 1, [10, 10, 20, 20])
    square["segmentation"] = [[10, 10, 30, 10, 30, 30, 10, 30]]
    gt = make_gt([slender, square])
    dets = [
        det(1, 1, [10, 10, 50, 5], 0.9),
        det(2, 1, [10, 10, 20, 20], 0.9),
    ]
    stats = run_eval(gt, dets)
    assert stats[0] == pytest.approx(1.0)
    assert stats[3] == pytest.approx(1.0)   # AP 0-1/5 (the slender gt)
    assert stats[5] == pytest.approx(1.0)   # AP 1/3-3 (the square gt)
    assert stats[11] == pytest.approx(1.0)  # AR 0-1/5


def test_crowd_gt_not_counted():
    gt = make_gt([
        ann(1, 1, 1, [10, 10, 30, 30]),
        ann(2, 1, 1, [50, 50, 40, 40], iscrowd=1),
    ])
    dets = [det(1, 1, [10, 10, 30, 30], 0.9)]
    stats = run_eval(gt, dets)
    # crowd gt is ignore -> full recall with the single TP
    assert stats[0] == pytest.approx(1.0)
    assert stats[10] == pytest.approx(1.0)


def test_detections_matched_in_score_order():
    # two dets on one gt: higher score wins the match, lower becomes FP
    gt = make_gt([ann(1, 1, 1, [10, 10, 30, 30])])
    dets = [
        det(1, 1, [10, 10, 30, 30], 0.6),
        det(1, 1, [11, 11, 30, 30], 0.9),
    ]
    stats = run_eval(gt, dets)
    # the 0.9 det matches (IoU>0.9), the 0.6 is an unmatched duplicate FP.
    # AP: recall 1 reached at rank 1 with precision 1 -> AP = 1 at IoU .5
    assert stats[1] == pytest.approx(1.0)
