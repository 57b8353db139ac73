#!/usr/bin/env python
"""Visualize ground truth as seen by the training dataloader (counterpart of
/root/reference/tests/test_dataloader.py's webcv2 flow, batch-file output).

Usage:
  python tools/visualize_dataloader.py --config-file configs/fcos/... \
      --out-dir vis_gt [--num-batches 2] [--serve]
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
    ap.add_argument("--out-dir", default="vis_gt")
    ap.add_argument("--num-batches", type=int, default=2)
    ap.add_argument("--serve", action="store_true",
                    help="also serve via webcv2 on :8888")
    args = ap.parse_args()

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import build_detection_train_loader
    from slenderobjdet_tpu.utils.visualizer import Visualizer

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.freeze()
    os.makedirs(args.out_dir, exist_ok=True)
    it = iter(build_detection_train_loader(cfg))
    for b in range(args.num_batches):
        batch = next(it)
        for i in range(batch["image"].shape[0]):
            img = np.asarray(batch["image"][i]).astype(np.uint8).copy()
            n = int(batch["gt_valid"][i].sum())
            vis = Visualizer(img)
            out = vis.draw_boxes(batch["gt_boxes"][i][:n],
                                 classes=batch["gt_classes"][i][:n])
            name = f"b{b}_i{i}_id{batch['image_id'][i]}"
            cv2.imwrite(os.path.join(args.out_dir, name + ".jpg"), out)
            if args.serve:
                from slenderobjdet_tpu.utils import webcv2

                webcv2.imshow(name, out)
    print("wrote", args.out_dir)
    if args.serve:
        input("serving on :8888, press enter to exit")


if __name__ == "__main__":
    main()
