#!/usr/bin/env python
"""Dataset slenderness statistics (counterpart of
/root/reference/tools/data_statistic.py): ratio histogram + per-bucket
instance counts of a COCO json.

Usage:
  python tools/data_statistic.py --gt-json .../instances_val2017.json
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from slenderobjdet_tpu.evaluation.coco_api import COCO  # noqa: E402

BUCKETS = [(0, 1 / 5), (1 / 5, 1 / 3), (1 / 3, 3), (3, 5), (5, 1e5)]
NAMES = ["XS(0-1/5)", "S(1/5-1/3)", "M(1/3-3)", "L(3-5)", "XL(5-INF)"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-json", required=True)
    args = ap.parse_args()
    coco = COCO(args.gt_json)

    ratios = np.array([a["ratio"] for a in coco.anns.values()
                       if not a.get("iscrowd", 0)])
    print(f"{len(ratios)} instances, {len(coco.imgs)} images")
    print(f"ratio: mean {ratios.mean():.3f} median {np.median(ratios):.3f}")
    total = len(ratios)
    for (lo, hi), name in zip(BUCKETS, NAMES):
        n = int(((ratios >= lo) & (ratios < hi)).sum())
        print(f"  {name:>12s}: {n:7d} ({100 * n / total:5.1f}%)")


if __name__ == "__main__":
    main()
