"""Rotated-box COCO evaluation (evaluator_type "rcoco").

Counterpart of detectron2's RotatedCOCOEvaluator as used by the reference's
rotated configs: the COCO protocol with the bbox IoU replaced by the exact
rotated IoU. Host-side rotated IoU uses cv2.rotatedRectangleIntersection
(the same geometry the device kernel in ops/rotated.py computes).
"""

from __future__ import annotations

import math
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..data.catalog import MetadataCatalog
from .coco_api import COCO
from .slender_cocoeval import SlenderCOCOeval


def rotated_iou_np(dt: np.ndarray, gt: np.ndarray, iscrowd) -> np.ndarray:
    """dt (D,5), gt (G,5) XYWHA -> (D,G) exact rotated IoU via cv2.
    Note: cv2 RotatedRect angle is clockwise; ours is CCW (d2), so negate."""
    D, G = len(dt), len(gt)
    out = np.zeros((D, G), np.float64)

    def rect(b):
        return ((float(b[0]), float(b[1])), (float(b[2]), float(b[3])),
                float(-b[4]))

    for i in range(D):
        r1 = rect(dt[i])
        a1 = dt[i][2] * dt[i][3]
        for j in range(G):
            r2 = rect(gt[j])
            a2 = gt[j][2] * gt[j][3]
            ret, pts = cv2.rotatedRectangleIntersection(r1, r2)
            inter = 0.0
            if ret != cv2.INTERSECT_NONE and pts is not None and len(pts) >= 3:
                inter = cv2.contourArea(cv2.convexHull(pts))
            denom = a1 if iscrowd[j] else (a1 + a2 - inter)
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


class RotatedSlenderCOCOeval(SlenderCOCOeval):
    """COCOeval fork whose IoU is rotated; annotations carry 5-elem 'bbox'."""

    def computeIoU(self, imgId, catId):
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds][: self.params.maxDets[-1]]
        g = np.array([x["bbox"] for x in gt], np.float64).reshape(-1, 5)
        d = np.array([x["bbox"] for x in dt], np.float64).reshape(-1, 5)
        iscrowd = [int(x.get("iscrowd", 0)) for x in gt]
        return rotated_iou_np(d, g, iscrowd)

    # evaluateImg inherits unchanged: the dt ratio bucketing reads
    # bbox[2]/bbox[3], which is w/h for XYWHA boxes too.


class RotatedCOCOEvaluator:
    """Gathers rotated predictions (XYWHA) and evaluates rotated AP."""

    def __init__(self, dataset_name: str, cfg=None,
                 output_dir: Optional[str] = None):
        self._metadata = MetadataCatalog.get(dataset_name)
        self._output_dir = output_dir
        self._coco_api = COCO(self._metadata.get("json_file"))
        id_map = self._metadata.get("thing_dataset_id_to_contiguous_id")
        if id_map is None:
            cat_ids = sorted(self._coco_api.getCatIds())
            id_map = {v: i for i, v in enumerate(cat_ids)}
        self._contig_to_ds = {v: k for k, v in id_map.items()}
        # gt annotations gain rotated 'bbox' from their rbox (or AA fallback)
        for ann in self._coco_api.anns.values():
            if "rbox" in ann:
                ann["bbox"] = list(ann["rbox"])
            elif len(ann["bbox"]) == 4:
                x, y, w, h = ann["bbox"]
                ann["bbox"] = [x + w / 2, y + h / 2, w, h, 0.0]
        self.reset()

    def reset(self):
        self._predictions: List[Dict] = []

    def process(self, batch, outputs):
        boxes = np.asarray(outputs["boxes"])      # (B, D, 5) XYWHA
        scores = np.asarray(outputs["scores"])
        classes = np.asarray(outputs["classes"])
        valid = np.asarray(outputs["valid"])
        batch_valid = batch.get("batch_valid", [True] * len(batch["image_id"]))
        for i, image_id in enumerate(batch["image_id"]):
            if not batch_valid[i]:
                continue
            insts = []
            for j in range(boxes.shape[1]):
                if not valid[i, j]:
                    continue
                insts.append({
                    "image_id": int(image_id),
                    "category_id": self._contig_to_ds[int(classes[i, j])],
                    "bbox": [float(v) for v in boxes[i, j]],
                    "score": float(scores[i, j]),
                })
            insts.sort(key=lambda d: -d["score"])
            self._predictions.append(
                {"image_id": int(image_id), "instances": insts}
            )

    def evaluate(self):
        import jax

        if jax.process_count() > 1:
            # cross-process prediction gather (reference comm.gather,
            # coco_evaluation.py:81-87); non-main returns empty
            from ..parallel.multihost import all_gather_objects, is_main_process

            gathered = all_gather_objects(self._predictions)
            if not is_main_process():
                self._predictions = []
                return OrderedDict()
            self._predictions = [p for ps in gathered for p in ps]
        results: OrderedDict = OrderedDict()
        coco_results = [
            i for p in self._predictions for i in p["instances"]
        ]
        if not coco_results:
            results["bbox"] = {"AP": float("nan"), "AP50": float("nan")}
            return results

        coco_dt = self._coco_api.loadRes(coco_results)
        # loadRes computes area from bbox[2]*bbox[3] which still holds (w*h)
        e = RotatedSlenderCOCOeval(self._coco_api, coco_dt, "bbox")
        e.params.imgIds = sorted({p["image_id"] for p in self._predictions})
        e.evaluate()
        e.accumulate()
        stats = e.summarize()
        from .coco_evaluation import STATS_NAMES

        results["bbox"] = {
            n: float(stats[i] * 100) for i, n in enumerate(STATS_NAMES)
        }
        return results
