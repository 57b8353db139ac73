#!/usr/bin/env python
"""Paper bar/line plots of mAP/mAR per ratio bucket across detectors
(counterpart of /root/reference/tools/plot.py:1-169: a hardcoded table of
headline numbers rendered as grouped plots; the table here mirrors the
reference's _setup() values and can be overridden with --metrics-json from
evaluate_metrics.json files).

Usage:
  python tools/plot.py [--out plot.png] [--metrics-json name=path ...]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

TAGS = ["mAP", "mAP0", "mAP1", "mAP2", "mAR", "mAR0", "mAR1", "mAR2",
        "AR", "AR0", "AR1", "AR2"]
# the reference's hardcoded paper numbers (tools/plot.py:24-31)
REFERENCE_DATA = {
    "reppoints-50": [38.0905, 28.8, 38.3, 37.6, 52.3019, 26.034, 43.425,
                     53.047, 57.0442, 40.189, 53.105, 59.234],
    "faster-50": [37.8081, 27.7, 37.3, 37.2, 52.2889, 24.546, 41.744,
                  52.868, 56.1357, 38.225, 51.787, 58.495],
    "fcos-50": [37.6416, 27.4, 37.2, 37.5, 55.5287, 24.412, 43.134,
                56.962, 57.8819, 34.712, 51.434, 61.096],
    "retina-50": [36.2174, 26.7, 35.5, 36.3, 53.2837, 22.769, 40.566,
                  54.607, 57.2151, 35.141, 51.116, 60.268],
}


def row_from_metrics(path):
    """Map an evaluate_metrics.json into the TAGS row (best-effort)."""
    with open(path) as f:
        m = json.load(f)
    bbox = m.get("bbox", {})
    ar = m.get("ar", {})
    return [
        bbox.get("AP", float("nan")),
        bbox.get("AP-0-1/5", float("nan")),
        bbox.get("AP-1/5-1/3", float("nan")),
        bbox.get("AP-1/3-3", float("nan")),
        ar.get("mAR@100", float("nan")),
        ar.get("mAR-0-1/5@100", float("nan")),
        ar.get("mAR-1/5-1/3@100", float("nan")),
        ar.get("mAR-1/3-3@100", float("nan")),
        ar.get("AR@100", float("nan")),
        ar.get("AR-0-1/5@100", float("nan")),
        ar.get("AR-1/5-1/3@100", float("nan")),
        ar.get("AR-1/3-3@100", float("nan")),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plot.png")
    ap.add_argument("--metrics-json", nargs="*", default=[],
                    help="name=path pairs of evaluate_metrics.json to add")
    args = ap.parse_args()

    data = dict(REFERENCE_DATA)
    for spec in args.metrics_json:
        name, path = spec.split("=", 1)
        data[name] = row_from_metrics(path)

    x = np.arange(len(TAGS))
    width = 0.8 / max(len(data), 1)
    fig, ax = plt.subplots(figsize=(14, 5))
    for i, (name, row) in enumerate(sorted(data.items())):
        ax.bar(x + i * width, row, width, label=name)
    ax.set_xticks(x + 0.4)
    ax.set_xticklabels(TAGS, rotation=30)
    ax.set_ylabel("metric value")
    ax.legend()
    ax.set_title("AP/AR by slenderness bucket (0=XS, 1=S, 2=M)")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
