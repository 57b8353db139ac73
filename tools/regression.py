#!/usr/bin/env python
"""Linear regression of AP against aspect ratio (the paper's ratio-vs-AP
diagnosis; counterpart of /root/reference/tools/regression.py).

Two modes:
- per-category (reference parity, regression.py:38-71): x = each category's
  ratio statistic computed from the gt annotations (the reference reads a
  prepared std_ratio CSV; we compute mean/std slenderness directly from the
  dataset json via the forked COCO api), y = that category's AP from the
  evaluator's "AP-per-category" output. Enabled with --coco-json.
- aggregate buckets (fallback): regress the 3 populated ratio-bucket APs.

Usage:
  python tools/regression.py --metrics output/evaluate_metrics.json \
      [--coco-json path/to/instances.json] [--stat mean|std]
"""

import argparse
import json
import os
import sys

import numpy as np
import scipy.stats as st

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BUCKETS = ["AP-0-1/5", "AP-1/5-1/3", "AP-1/3-3"]
BUCKET_X = [0.1, 0.27, 1.0]  # representative ratios


def regression(x, y) -> str:
    slope, intercept, r_value, p_value, std_err = st.linregress(x, y)
    return (f"slope    : {slope}\nintercept: {intercept}\n"
            f"r_value  : {r_value}")


def category_ratio_stats(coco_json: str, stat: str = "mean"):
    """Per-category slenderness statistic from the gt annotations, using the
    same per-annotation `ratio` the forked COCO api attaches (coco_api.py)."""
    from slenderobjdet_tpu.evaluation.coco_api import COCO

    api = COCO(coco_json)
    out = {}
    for cat_id in api.getCatIds():
        anns = api.loadAnns(api.getAnnIds(catIds=[cat_id]))
        ratios = [a["ratio"] for a in anns if a.get("ratio") is not None]
        if not ratios:
            continue
        name = api.loadCats([cat_id])[0]["name"]
        out[name] = (float(np.mean(ratios)) if stat == "mean"
                     else float(np.std(ratios)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True,
                    help="evaluate_metrics.json from COCOEvaluator")
    ap.add_argument("--coco-json", default=None,
                    help="gt json: enables the per-category regression")
    ap.add_argument("--stat", default="mean", choices=["mean", "std"],
                    help="per-category ratio statistic used as x")
    args = ap.parse_args()
    with open(args.metrics) as f:
        m = json.load(f)["bbox"]

    per_cat = m.get("AP-per-category")
    if args.coco_json and per_cat:
        stats = category_ratio_stats(args.coco_json, args.stat)
        xs, ys, names = [], [], []
        for name, ratio in sorted(stats.items()):
            apv = per_cat.get(name)
            if apv is not None and np.isfinite(apv):
                xs.append(ratio)
                ys.append(apv)
                names.append(name)
        print(f"{len(xs)} categories; x = {args.stat} slenderness, y = AP")
        for n, x, y in zip(names, xs, ys):
            print(f"  {n:24s} ratio={x:.4f}  AP={y:.2f}")
        if len(xs) >= 2:
            print(regression(np.asarray(xs), np.asarray(ys)))
        else:
            print("not enough categories for a regression")
        return

    xs, ys = [], []
    for b, x in zip(BUCKETS, BUCKET_X):
        v = m.get(b)
        if v is not None and v >= 0:
            xs.append(x)
            ys.append(v)
    print({b: m.get(b) for b in BUCKETS})
    if len(xs) >= 2:
        print(regression(np.log(xs), ys))
    else:
        print("not enough populated buckets for a regression")


if __name__ == "__main__":
    main()
