"""Native slender-eval matching kernel: exact parity with the numpy
evaluateImg on randomized (image, category) pairs, plus the end-to-end
equality of full evaluate() runs with the kernel on and off."""

import numpy as np
import pytest

from slenderobjdet_tpu.evaluation import native
from slenderobjdet_tpu.evaluation.slender_cocoeval import (
    SlenderCOCOeval,
    SlenderParams,
    bbox_iou_xywh,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler for the native kernel"
)


def _random_pair(rng, D, G):
    gt = []
    for i in range(G):
        w, h = rng.rand() * 60 + 2, rng.rand() * 60 + 2
        gt.append({
            "id": i + 1,
            "bbox": [rng.rand() * 200, rng.rand() * 200, w, h],
            "iscrowd": int(rng.rand() < 0.15),
            "ratio": float(10 ** (rng.rand() * 2 - 1.3)),  # ~0.05..5
        })
        gt[-1]["ignore"] = 1 if gt[-1]["iscrowd"] else 0
    dt = []
    for i in range(D):
        src = gt[rng.randint(G)] if G and rng.rand() < 0.7 else None
        if src is not None:
            x, y, w, h = src["bbox"]
            bbox = [x + rng.randn() * 4, y + rng.randn() * 4,
                    max(w + rng.randn() * 4, 1), max(h + rng.randn() * 4, 1)]
        else:
            bbox = [rng.rand() * 200, rng.rand() * 200,
                    rng.rand() * 60 + 2, rng.rand() * 60 + 2]
        dt.append({"id": 1000 + i, "bbox": bbox,
                   "score": float(rng.rand())})
    return gt, dt


@pytest.mark.parametrize("seed", range(8))
def test_match_pair_matches_python_oracle(seed):
    rng = np.random.RandomState(seed)
    D, G = int(rng.randint(1, 25)), int(rng.randint(1, 12))
    gt, dt = _random_pair(rng, D, G)

    p = SlenderParams()
    ev = SlenderCOCOeval.__new__(SlenderCOCOeval)
    ev.params = p
    ev._gts = {(1, 1): gt}
    ev._dts = {(1, 1): dt}
    # score-sorted dt + ious exactly as evaluate() prepares them
    inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
    dts = [dt[i] for i in inds][: p.maxDets[-1]]
    ious = bbox_iou_xywh(
        np.array([d["bbox"] for d in dts]),
        np.array([g["bbox"] for g in gt]),
        [g["iscrowd"] for g in gt],
    )
    ev.ious = {(1, 1): ious}

    lo = np.array([r[0] for r in p.aptrtoRng])
    hi = np.array([r[1] for r in p.aptrtoRng])
    dtm, gtm, dt_ig, gt_ig, gt_order = native.match_pair(
        p.iouThrs, lo, hi, ious,
        np.array([g["ratio"] for g in gt]),
        np.array([g["iscrowd"] for g in gt], np.uint8),
        np.array([g["ignore"] for g in gt], np.uint8),
        np.array([g["id"] for g in gt], np.int64),
        np.array([d["id"] for d in dts], np.int64),
        np.array([d["bbox"][2] / d["bbox"][3] if d["bbox"][3] > 0 else 0.0
                  for d in dts]),
    )

    for a, aRng in enumerate(p.aptrtoRng):
        want = ev.evaluateImg(1, 1, aRng, p.maxDets[-1])
        np.testing.assert_array_equal(dtm[a], want["dtMatches"], err_msg=f"a={a}")
        np.testing.assert_array_equal(gtm[a], want["gtMatches"], err_msg=f"a={a}")
        np.testing.assert_array_equal(
            dt_ig[a].astype(bool), want["dtIgnore"].astype(bool),
            err_msg=f"a={a}")
        np.testing.assert_array_equal(gt_ig[a], want["gtIgnore"],
                                      err_msg=f"a={a}")
        sorted_ids = [gt[i]["id"] for i in gt_order[a]]
        assert sorted_ids == want["gtIds"], f"a={a}"


def test_full_evaluate_native_equals_numpy():
    """evaluate()+accumulate()+summarize() must be bit-identical with the
    native kernel enabled vs the pure-numpy path."""
    from slenderobjdet_tpu.evaluation.coco_api import COCO

    rng = np.random.RandomState(3)
    images = [{"id": i, "height": 240, "width": 320} for i in range(1, 13)]
    cats = [{"id": c, "name": str(c)} for c in (1, 3, 7)]
    anns, aid = [], 1
    for i in range(1, 13):
        for _ in range(rng.randint(1, 6)):
            w, h = rng.rand() * 80 + 4, rng.rand() * 80 + 4
            anns.append({
                "id": aid, "image_id": i, "category_id": int(rng.choice([1, 3, 7])),
                "bbox": [rng.rand() * 200, rng.rand() * 140, w, h],
                "area": w * h, "iscrowd": int(rng.rand() < 0.1),
                "segmentation": [],
            })
            aid += 1
    gt = COCO()
    gt.dataset = {"images": images, "annotations": anns, "categories": cats}
    gt.createIndex()
    dets = []
    for a in anns:
        x, y, w, h = a["bbox"]
        dets.append({"image_id": a["image_id"], "category_id": a["category_id"],
                     "bbox": [x + rng.randn() * 3, y + rng.randn() * 3, w, h],
                     "score": float(rng.rand())})
        dets.append({"image_id": a["image_id"],
                     "category_id": int(rng.choice([1, 3, 7])),
                     "bbox": [rng.rand() * 200, rng.rand() * 140, 30, 20],
                     "score": float(rng.rand() * 0.5)})
    dt = gt.loadRes(dets)

    def run(use_native):
        ev = SlenderCOCOeval(gt, dt, "bbox")
        ev.use_native = use_native
        ev.evaluate()
        ev.accumulate()
        return ev.summarize()

    np.testing.assert_array_equal(run(True), run(False))
