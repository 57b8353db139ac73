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
    ap.add_argument("--proposals-pkl", default="",
                    help="box_proposals.pkl from COCOEvaluatorWithAnchors: "
                         "draw each proposal with its SOURCE anchor instead "
                         "of the raw grid")
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

    saved = {}
    if args.proposals_pkl:
        import pickle

        with open(args.proposals_pkl, "rb") as f:
            data = pickle.load(f)
        saved = {img_id: (bx, an) for img_id, bx, an in
                 zip(data["ids"], data["boxes"], data["anchors"])}

    rng = np.random.default_rng(0)
    for i, batch in enumerate(loader):
        if i >= args.num_images:
            continue
        img = np.asarray(batch["image"][0]).astype(np.uint8).copy()
        vis = Visualizer(img)
        img_id = int(batch["image_id"][0])
        if saved:
            if img_id not in saved:
                continue
            bx, an = saved[img_id]
            n = min(args.per_level, len(bx))
            scale = float(batch["scale"][0])  # pkl is in original coords
            vis.draw_proposals(np.asarray(bx[:n]) * scale)
            if an is not None:
                vis.draw_anchors(np.asarray(an[:n]) * scale)
        else:
            anchors, counts = spec.anchors(img.shape[:2])
            off = 0
            for c in counts:
                pick = rng.choice(c, min(args.per_level, c), replace=False) + off
                vis.draw_proposals(anchors[pick], max_n=args.per_level)
                off += c
        cv2.imwrite(os.path.join(args.out_dir, f"anchors_{i}.jpg"), vis.get())
    print("wrote", args.out_dir)


if __name__ == "__main__":
    main()
