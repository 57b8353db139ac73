#!/usr/bin/env python
"""Linear regression of AP against aspect-ratio bucket (the paper's
ratio-vs-AP diagnosis; counterpart of /root/reference/tools/regression.py).

Usage:
  python tools/regression.py --metrics output/evaluate_metrics.json
"""

import argparse
import json

import numpy as np
import scipy.stats as st

BUCKETS = ["AP-0-1/5", "AP-1/5-1/3", "AP-1/3-3"]
BUCKET_X = [0.1, 0.27, 1.0]  # representative ratios


def regression(x, y) -> str:
    slope, intercept, r_value, p_value, std_err = st.linregress(x, y)
    return (f"slope    : {slope}\nintercept: {intercept}\n"
            f"r_value  : {r_value}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True,
                    help="evaluate_metrics.json from COCOEvaluator")
    args = ap.parse_args()
    with open(args.metrics) as f:
        m = json.load(f)["bbox"]
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
