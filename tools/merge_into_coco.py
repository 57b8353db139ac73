#!/usr/bin/env python
"""Merge detection results back into a COCO json as annotations
(counterpart of /root/reference/tools/merge_into_coco.py — used to build
pseudo-label / merged datasets).

Usage:
  python tools/merge_into_coco.py --gt-json base.json \
      --results coco_instances_results.json --out merged.json \
      [--score-thresh 0.5]
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--results", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--score-thresh", type=float, default=0.5)
    args = ap.parse_args()

    with open(args.gt_json) as f:
        data = json.load(f)
    with open(args.results) as f:
        dets = json.load(f)

    next_id = max((a["id"] for a in data.get("annotations", [])), default=0) + 1
    added = 0
    for d in dets:
        if d["score"] < args.score_thresh:
            continue
        x, y, w, h = d["bbox"]
        data["annotations"].append({
            "id": next_id,
            "image_id": d["image_id"],
            "category_id": d["category_id"],
            "bbox": [x, y, w, h],
            "area": w * h,
            "iscrowd": 0,
            "score": d["score"],
            "segmentation": [[x, y, x + w, y, x + w, y + h, x, y + h]],
        })
        next_id += 1
        added += 1
    with open(args.out, "w") as f:
        json.dump(data, f)
    print(f"merged {added} detections into {args.out}")


if __name__ == "__main__":
    main()
