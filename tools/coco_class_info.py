#!/usr/bin/env python
"""Per-class instance counts and slenderness stats (counterpart of
/root/reference/tools/coco_class_info.py).

Usage:
  python tools/coco_class_info.py --gt-json .../instances_val2017.json
"""

import argparse
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

from slenderobjdet_tpu.evaluation.coco_api import COCO  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--sort-by", default="slender",
                    choices=["slender", "count", "name"])
    args = ap.parse_args()
    coco = COCO(args.gt_json)

    per_class = defaultdict(list)
    for a in coco.anns.values():
        if not a.get("iscrowd", 0):
            per_class[a["category_id"]].append(a["ratio"])

    rows = []
    for cid, ratios in per_class.items():
        r = np.array(ratios)
        rows.append((coco.cats[cid]["name"], len(r), float(np.median(r)),
                     float((r < 1 / 3).mean() * 100)))
    key = {"slender": lambda x: -x[3], "count": lambda x: -x[1],
           "name": lambda x: x[0]}[args.sort_by]
    rows.sort(key=key)
    print(f"{'class':>20s} {'count':>7s} {'med-ratio':>10s} {'%slender':>9s}")
    for name, n, med, slender in rows:
        print(f"{name:>20s} {n:7d} {med:10.3f} {slender:8.1f}%")


if __name__ == "__main__":
    main()
