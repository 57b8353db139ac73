#!/usr/bin/env python
"""IoU-vs-L1 behavior figure for morphing box pairs (counterpart of
/root/reference/tools/visulize_iou.py:1-81 — yes, the reference filename is
misspelled; kept for parity). Interpolates box_1 toward box_2 over `steps`,
plotting IoU (with the l2/area or l1/perimeter "distance") against L1 loss.

Usage:
  python tools/visulize_iou.py [--out-dir vis_iou] [--serve]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def l2(p1, p2):
    return p1 * p2


def l1(p1, p2):
    return p1 + p2


def iou(box_1, box_2, distance=l2):
    """IoU generalized by the side-combiner: l2 = area (real IoU), l1 =
    perimeter (the reference's ablation)."""
    area_1 = distance(box_1[2] - box_1[0], box_1[3] - box_1[1])
    area_2 = distance(box_2[2] - box_2[0], box_2[3] - box_2[1])
    wh = -np.maximum(box_1[:2], box_2[:2]) + np.minimum(box_1[2:], box_2[2:])
    wh = (wh > 0) * wh
    intersection = distance(wh[0], wh[1])
    union = area_1 + area_2 - intersection
    return intersection / union


def vis_boxes(box_1, box_2, steps=100, distance=l2):
    box_1 = box_1.copy()
    diff = (box_2 - box_1) / steps
    xs, ious, losses = [], [], []
    fig, iou_scores = plt.subplots()
    max_val = max(box_1.max(), box_2.max()) * 4
    iou_scores.set_xlim(-0.5, 1.5)
    loss_scores = iou_scores.twinx()
    iou_scores.set_ylabel("IoU with %s" % distance.__name__)
    loss_scores.set_ylabel("L1 Loss")

    for i in range(steps):
        xs.append(i / steps)
        ious.append(iou(box_1, box_2, distance))
        losses.append(np.abs(box_1 - box_2).sum())
        if i % (steps // 3) == 0:
            for b in (box_1, box_2):
                iou_scores.add_patch(plt.Rectangle(
                    (i / steps, 0), width=(b[2] - b[0]) / max_val,
                    height=(b[3] - b[1]) / max_val, fill=False))
        box_1 += diff

    iou_scores.plot(xs, ious, "r", label="IoU")
    loss_scores.plot(xs, np.array(losses), "b", label="L1 loss")
    iou_scores.legend(loc="lower right")
    loss_scores.legend()
    return fig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="vis_iou")
    ap.add_argument("--serve", action="store_true",
                    help="also serve figures via webcv2")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    cases = [
        (np.array([0, 0, 20, 20], float), np.array([0, 0, 10, 80], float), l2),
        (np.array([0, 0, 10, 80], float), np.array([0, 0, 10, 10], float), l1),
    ]
    for i, (b1, b2, dist) in enumerate(cases):
        fig = vis_boxes(b1, b2, distance=dist)
        path = os.path.join(args.out_dir, f"iou_{dist.__name__}_{i}.png")
        fig.savefig(path, dpi=120)
        if args.serve:
            from slenderobjdet_tpu.utils import webcv2

            fig.canvas.draw()
            img = np.asarray(fig.canvas.buffer_rgba())[..., 2::-1]
            webcv2.imshow(f"iou_{i}", np.ascontiguousarray(img))
        plt.close(fig)
        print("wrote", path)


if __name__ == "__main__":
    main()
