#!/usr/bin/env python
"""Bar plot of AP/AR per aspect-ratio bucket from evaluate_metrics.json
(counterpart of /root/reference/tools/plot_evaluation.py).

Usage:
  python tools/plot_evaluation.py --metrics output/evaluate_metrics.json \
      [--out ap_by_ratio.png]
"""

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

BUCKETS = ["AP-0-1/5", "AP-1/5-1/3", "AP-1/3-3", "AP-3-5", "AP-5-INF"]
AR_BUCKETS = ["AR-0-1/5", "AR-1/5-1/3", "AR-1/3-3", "AR-3-5", "AR-5-INF"]
LABELS = ["0-1/5", "1/5-1/3", "1/3-3", "3-5", "5-INF"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--out", default="evaluation_by_ratio.png")
    args = ap.parse_args()
    with open(args.metrics) as f:
        m = json.load(f)["bbox"]

    aps = [max(m.get(b, 0), 0) for b in BUCKETS]
    ars = [max(m.get(b, 0), 0) for b in AR_BUCKETS]

    x = range(len(LABELS))
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar([i - 0.2 for i in x], aps, width=0.4, label="AP")
    ax.bar([i + 0.2 for i in x], ars, width=0.4, label="AR@100")
    ax.set_xticks(list(x))
    ax.set_xticklabels(LABELS)
    ax.set_xlabel("aspect-ratio bucket (w/h)")
    ax.set_ylabel("%")
    ax.legend()
    ax.set_title("detection quality by slenderness")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
