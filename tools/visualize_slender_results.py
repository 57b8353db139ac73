#!/usr/bin/env python
"""Draw detections on images, colored by slenderness bucket (counterpart of
/root/reference/tools/visualize_slender_results.py — the paper-figure tool).

Usage:
  python tools/visualize_slender_results.py \
      --results output/coco_instances_results.json \
      --gt-json .../instances_val2017.json --image-root .../val2017 \
      --out-dir vis/ [--score-thresh 0.3] [--max-images 20]
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
    ap.add_argument("--results", required=True)
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--out-dir", default="vis")
    ap.add_argument("--score-thresh", type=float, default=0.3)
    ap.add_argument("--max-images", type=int, default=20)
    args = ap.parse_args()

    coco = COCO(args.gt_json)
    names = {c["id"]: c["name"] for c in coco.cats.values()}
    with open(args.results) as f:
        dets = json.load(f)
    by_image = defaultdict(list)
    for d in dets:
        if d["score"] >= args.score_thresh:
            by_image[d["image_id"]].append(d)

    os.makedirs(args.out_dir, exist_ok=True)
    for i, (img_id, ds) in enumerate(sorted(by_image.items())):
        if i >= args.max_images:
            break
        info = coco.imgs[img_id]
        img = cv2.imread(os.path.join(args.image_root, info["file_name"]))
        if img is None:
            continue
        vis = Visualizer(img)
        boxes = np.array([
            [d["bbox"][0], d["bbox"][1],
             d["bbox"][0] + d["bbox"][2], d["bbox"][1] + d["bbox"][3]]
            for d in ds
        ])
        scores = [d["score"] for d in ds]
        labels = [names.get(d["category_id"], str(d["category_id"]))
                  for d in ds]
        out = vis.draw_boxes(boxes, scores=scores)
        for (x1, y1, _, _), lab in zip(boxes.astype(int), labels):
            cv2.putText(out, lab, (x1, max(y1 - 12, 8)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.35, (255, 255, 255), 1)
        cv2.imwrite(os.path.join(args.out_dir, f"{img_id:012d}.jpg"), out)

        # paper-figure panel: gt instances rendered with filled polygon
        # masks, colored by slenderness group (reference
        # visualizer.py:149-220 draw_instance_predictions + group_by)
        anns = coco.loadAnns(coco.getAnnIds(imgIds=[img_id]))
        polys = [a.get("segmentation") or [] for a in anns]
        if any(len(p) for p in polys):
            gt_img = cv2.imread(
                os.path.join(args.image_root, info["file_name"]))
            gvis = Visualizer(gt_img)
            gt_boxes = np.array([
                [a["bbox"][0], a["bbox"][1],
                 a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
                for a in anns
            ])
            gt_cls = [a["category_id"] for a in anns]
            gout = gvis.draw_instances(boxes=gt_boxes, masks=polys,
                                       classes=None)
            for (x1, y1, _, _), cid in zip(gt_boxes.astype(int), gt_cls):
                cv2.putText(gout, names.get(cid, str(cid)),
                            (x1, max(y1 - 12, 8)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.35,
                            (255, 255, 255), 1)
            cv2.imwrite(
                os.path.join(args.out_dir, f"{img_id:012d}_gt.jpg"), gout)
    print("wrote visualizations to", args.out_dir)


if __name__ == "__main__":
    main()
