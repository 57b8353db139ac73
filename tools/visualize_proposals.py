#!/usr/bin/env python
"""Visualize saved RPN proposals (with their source anchors) against final
predictions and ground truth (counterpart of
/root/reference/tools/visualize_proposals.py:42-118: proposals from
box_proposals.pkl thresholded by sigmoid(objectness), predictions from the
result json, side-by-side panels per image).

Usage:
  python tools/visualize_proposals.py --proposal box_proposals.pkl \
      --result coco_instances_results.json --gt-json instances.json \
      --image-root images/ --output vis_props [--conf-threshold 0.5]
"""

import argparse
import json
import os
import pickle
import sys
from collections import defaultdict

import cv2
import numpy as np

sys.path.insert(0, ".")

from slenderobjdet_tpu.evaluation.coco_api import COCO  # noqa: E402
from slenderobjdet_tpu.utils.visualizer import Visualizer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proposal", required=True,
                    help="box_proposals.pkl from COCOEvaluatorWithAnchors")
    ap.add_argument("--result", required=True)
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--conf-threshold", type=float, default=0.5)
    ap.add_argument("--proposal-threshold", type=float, default=0.5,
                    help="sigmoid(objectness) threshold for drawn proposals")
    ap.add_argument("--max-images", type=int, default=20)
    args = ap.parse_args()

    with open(args.proposal, "rb") as f:
        data = pickle.load(f)
    prop_by_image = {}
    for img_id, boxes, anchors, logits in zip(
            data["ids"], data["boxes"], data["anchors"],
            data["objectness_logits"]):
        prop_by_image[img_id] = (np.asarray(boxes),
                                 None if anchors is None else np.asarray(anchors),
                                 np.asarray(logits))

    with open(args.result) as f:
        preds = json.load(f)
    pred_by_image = defaultdict(list)
    for p in preds:
        pred_by_image[p["image_id"]].append(p)

    coco = COCO(args.gt_json)
    os.makedirs(args.output, exist_ok=True)
    done = 0
    for img_id, info in sorted(coco.imgs.items()):
        if done >= args.max_images or img_id not in prop_by_image:
            continue
        path = os.path.join(args.image_root, info["file_name"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            continue

        boxes, anchors, logits = prop_by_image[img_id]
        scores = 1.0 / (1.0 + np.exp(-logits))
        keep = scores > args.proposal_threshold
        vis_prop = Visualizer(img)
        vis_prop.draw_proposals(boxes[keep])
        if anchors is not None:
            vis_prop.draw_anchors(anchors[keep])

        dets = [p for p in pred_by_image.get(img_id, [])
                if p["score"] > args.conf_threshold]
        vis_pred = Visualizer(img)
        if dets:
            db = np.array([p["bbox"] for p in dets], np.float32)
            db[:, 2:] += db[:, :2]
            vis_pred.draw_boxes(db, scores=[p["score"] for p in dets])

        vis_gt = Visualizer(img)
        anns = coco.imgToAnns.get(img_id, [])
        if anns:
            gtb = np.array([a["bbox"] for a in anns], np.float32)
            gtb[:, 2:] += gtb[:, :2]
            vis_gt.draw_boxes(gtb)

        concat = np.concatenate(
            [vis_prop.get(), vis_pred.get(), vis_gt.get()], axis=1)
        cv2.imwrite(os.path.join(args.output, info["file_name"]), concat)
        done += 1
    print(f"wrote {done} proposal|pred|gt panels to {args.output}")


if __name__ == "__main__":
    main()
