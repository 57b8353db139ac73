#!/usr/bin/env python
"""Add oriented rbox fields to a COCO json from segmentations (counterpart
of /root/reference/tools/mask_to_rbox.py — builds the rotated-COCO jsons).

Usage:
  python tools/mask_to_rbox.py --gt-json instances_val2017.json \
      --out rcoco_val2017.json
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from slenderobjdet_tpu.structures.masks import rbox_from_polygon  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    with open(args.gt_json) as f:
        data = json.load(f)
    n_ok = 0
    for ann in data.get("annotations", []):
        segm = ann.get("segmentation")
        polys = ([p for p in segm if len(p) % 2 == 0 and len(p) >= 6]
                 if isinstance(segm, list) else [])
        if polys and not ann.get("iscrowd", 0):
            ann["rbox"] = rbox_from_polygon(polys)
            n_ok += 1
        else:
            x, y, w, h = ann["bbox"]
            ann["rbox"] = [x + w / 2, y + h / 2, w, h, 0.0]
    with open(args.out, "w") as f:
        json.dump(data, f)
    print(f"wrote {args.out} ({n_ok} oriented rboxes)")


if __name__ == "__main__":
    main()
