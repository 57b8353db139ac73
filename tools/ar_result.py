#!/usr/bin/env python
"""AR by aspect-ratio bucket from saved predictions.

Counterpart of `/root/reference/tools/ar_result.py:15-50`: loads
coco_instances_results.json (dumped by COCOEvaluator), greedily matches to
gt, and prints the recall matrix per ratio/area bucket.

Usage:
  python tools/ar_result.py --results output/coco_instances_results.json \
      --gt-json datasets/coco/annotations/instances_val2017.json [--limit 100]
"""

import argparse
import json
import sys
from collections import defaultdict

sys.path.insert(0, ".")

from slenderobjdet_tpu.evaluation.ar_recall import (  # noqa: E402
    AREAS,
    ASPECT_RATIOS,
    evaluate_predictions_ar,
)
from slenderobjdet_tpu.evaluation.coco_api import COCO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True)
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--limit", type=int, default=100)
    args = ap.parse_args()

    coco = COCO(args.gt_json)
    with open(args.results) as f:
        dets = json.load(f)

    by_image = defaultdict(list)
    for d in dets:
        by_image[d["image_id"]].append(d)
    predictions = [
        {"image_id": k, "instances": sorted(v, key=lambda x: -x["score"])}
        for k, v in by_image.items()
    ]
    cat_ids = sorted(coco.getCatIds())
    id_map = {v: i for i, v in enumerate(cat_ids)}

    stats = evaluate_predictions_ar(predictions, coco, id_map,
                                    limit=args.limit)
    recalls = stats["recalls"]
    print(f"AR@{args.limit}: {stats['ar'] * 100:.2f}  "
          f"mAR@{args.limit}: {stats['mar'] * 100:.2f}")
    print("\nby aspect ratio (class-agnostic):")
    for i, key in enumerate(ASPECT_RATIOS):
        print(f"  {key:>12s}: AR {recalls[:, -1, i, 0].mean() * 100:6.2f}")
    print("by area (class-agnostic):")
    for i, key in enumerate(AREAS):
        print(f"  {key:>12s}: AR {recalls[:, -1, 0, i].mean() * 100:6.2f}")


if __name__ == "__main__":
    main()
