#!/usr/bin/env python
"""Pre-render border/center/size maps for a dataset (counterpart of
/root/reference/tools/generate_border_maps.py; the reference packed them
into nori+redis — here they are saved as .npz next to the output dir).

Usage:
  python tools/generate_border_maps.py --gt-json instances.json \
      --out-dir border_maps [--max-images 100]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from slenderobjdet_tpu.evaluation.coco_api import COCO  # noqa: E402
from slenderobjdet_tpu.structures.borders import BorderMasks  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--max-images", type=int, default=100)
    args = ap.parse_args()

    coco = COCO(args.gt_json)
    os.makedirs(args.out_dir, exist_ok=True)
    done = 0
    for img_id, info in sorted(coco.imgs.items()):
        anns = [a for a in coco.imgToAnns.get(img_id, [])
                if not a.get("iscrowd", 0)]
        polys = [
            [np.asarray(p, np.float64) for p in a["segmentation"]
             if len(p) >= 6]
            for a in anns if isinstance(a.get("segmentation"), list)
        ]
        polys = [p for p in polys if p]
        if not polys:
            continue
        masks = BorderMasks(polys)
        hw = (info["height"], info["width"])
        center = masks.center_masks(hw, standard="gaussian", sigma=0.5)
        border, sizes = masks.border_masks(hw)
        np.savez_compressed(
            os.path.join(args.out_dir, f"{img_id:012d}.npz"),
            center=center, border=border, sizes=sizes,
        )
        done += 1
        if done >= args.max_images:
            break
    print(f"rendered maps for {done} images into {args.out_dir}")


if __name__ == "__main__":
    main()
