#!/usr/bin/env python
"""Visualize the anchor grid over sample images (counterpart of
/root/reference/tools/visualize_anchors.py).

Usage:
  python tools/visualize_anchors.py --config-file configs/retina/... \
      --out-dir vis_anchors [--num-images 4] [--per-level 20]
"""

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--out-dir", default="vis_anchors")
    ap.add_argument("--num-images", type=int, default=4)
    ap.add_argument("--per-level", type=int, default=20)
    args = ap.parse_args()

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import build_detection_test_loader
    from slenderobjdet_tpu.models.anchors import AnchorGeneratorSpec
    from slenderobjdet_tpu.utils.visualizer import Visualizer

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.freeze()
    feats = (cfg.MODEL.RETINANET.IN_FEATURES
             if "RetinaNet" in cfg.MODEL.META_ARCHITECTURE
             else cfg.MODEL.RPN.IN_FEATURES)
    strides = [2 ** int(f[1:]) for f in feats]
    spec = AnchorGeneratorSpec(cfg, strides)

    os.makedirs(args.out_dir, exist_ok=True)
    loader = build_detection_test_loader(cfg, cfg.DATASETS.TEST[0],
                                         batch_size=1)
    rng = np.random.default_rng(0)
    for i, batch in enumerate(loader):
        if i >= args.num_images:
            continue
        img = np.asarray(batch["image"][0]).astype(np.uint8).copy()
        anchors, counts = spec.anchors(img.shape[:2])
        vis = Visualizer(img)
        off = 0
        for c in counts:
            pick = rng.choice(c, min(args.per_level, c), replace=False) + off
            vis.draw_proposals(anchors[pick], max_n=args.per_level)
            off += c
        cv2.imwrite(os.path.join(args.out_dir, f"anchors_{i}.jpg"), vis.get())
    print("wrote", args.out_dir)


if __name__ == "__main__":
    main()
