#!/usr/bin/env python
"""Visualize COCO-format json predictions next to ground truth
(counterpart of /root/reference/tools/visualize_json_results.py:1-95:
per image, draw thresholded predictions and the dataset dict side by side).

Usage:
  python tools/visualize_json_results.py --result coco_instances_results.json \
      --gt-json instances.json --image-root images/ --output vis_out \
      [--conf-threshold 0.5] [--max-images 20]
"""

import argparse
import json
import os
import sys
from collections import defaultdict

import cv2
import numpy as np

sys.path.insert(0, ".")

from slenderobjdet_tpu.evaluation.coco_api import COCO  # noqa: E402
from slenderobjdet_tpu.utils.visualizer import Visualizer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--result", required=True,
                    help="json produced by COCOEvaluator")
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--conf-threshold", type=float, default=0.5)
    ap.add_argument("--max-images", type=int, default=20)
    args = ap.parse_args()

    coco = COCO(args.gt_json)
    with open(args.result) as f:
        preds = json.load(f)
    by_image = defaultdict(list)
    for p in preds:
        by_image[p["image_id"]].append(p)

    names = {c["id"]: c.get("name", str(c["id"]))
             for c in coco.dataset.get("categories", [])}
    os.makedirs(args.output, exist_ok=True)
    done = 0
    for img_id, info in sorted(coco.imgs.items()):
        if done >= args.max_images:
            break
        path = os.path.join(args.image_root, info["file_name"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            continue

        dets = [p for p in by_image.get(img_id, [])
                if p["score"] > args.conf_threshold]
        vis_pred = Visualizer(img, class_names=None)
        if dets:
            boxes = np.array([p["bbox"] for p in dets], np.float32)
            boxes[:, 2:] += boxes[:, :2]             # XYWH -> XYXY
            vis_pred.draw_boxes(
                boxes,
                scores=[p["score"] for p in dets],
                classes=None,
            )

        vis_gt = Visualizer(img)
        anns = coco.imgToAnns.get(img_id, [])
        if anns:
            gtb = np.array([a["bbox"] for a in anns], np.float32)
            gtb[:, 2:] += gtb[:, :2]
            vis_gt.draw_boxes(gtb)
            for a, b in zip(anns, gtb):
                cv2.putText(vis_gt.img, names.get(a["category_id"], "?"),
                            (int(b[0]), max(int(b[1]) - 2, 8)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.35, (255, 255, 255), 1)

        concat = np.concatenate([vis_pred.get(), vis_gt.get()], axis=1)
        cv2.imwrite(os.path.join(args.output, info["file_name"]), concat)
        done += 1
    print(f"wrote {done} pred|gt comparisons to {args.output}")


if __name__ == "__main__":
    main()
