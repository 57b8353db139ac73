#!/usr/bin/env python
"""Visualize dataset annotations or loader outputs + ratio statistics
(counterpart of /root/reference/tools/visualize_data.py:40-128: --source
annotation draws raw dataset dicts and counts empty/problematic
segmentations with their slenderness ratios; --source dataloader draws the
mapper's padded gt as the model will see it).

Usage:
  python tools/visualize_data.py --source annotation --config-file cfg.yaml \
      --gt-json inst.json --image-root images/ [--output-dir vis] [--serve]
"""

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=["annotation", "dataloader"],
                    required=True)
    ap.add_argument("--config-file", default="")
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--output-dir", default="vis_data")
    ap.add_argument("--max-images", type=int, default=20)
    ap.add_argument("--serve", action="store_true")
    args = ap.parse_args()

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.structures.masks import compute_ann_ratio
    from slenderobjdet_tpu.utils.visualizer import Visualizer

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)

    name = "_visualize_data"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, args.gt_json, args.image_root)
    dicts = DatasetCatalog.get(name)
    os.makedirs(args.output_dir, exist_ok=True)

    def output(img, fname):
        if args.serve:
            from slenderobjdet_tpu.utils import webcv2

            webcv2.imshow(fname, img)
        cv2.imwrite(os.path.join(args.output_dir, fname), img)

    if args.source == "dataloader":
        cfg.defrost()
        cfg.DATASETS.TRAIN = (name,)
        cfg.freeze()
        from slenderobjdet_tpu.data import build_detection_train_loader

        loader = build_detection_train_loader(cfg)
        shown = 0
        for batch in loader:
            for i in range(len(batch["image"])):
                img = np.asarray(batch["image"][i]).astype(np.uint8).copy()
                vis = Visualizer(img)
                valid = np.asarray(batch["gt_valid"][i])
                vis.draw_boxes(np.asarray(batch["gt_boxes"][i])[valid],
                               classes=np.asarray(batch["gt_classes"][i])[valid])
                output(vis.get(), f"{int(batch['image_id'][i])}.jpg")
                shown += 1
                if shown >= args.max_images:
                    print(f"wrote {shown} loader views to {args.output_dir}")
                    return
        return

    all_count = empty_count = problematic_count = 0
    shown = 0
    for dic in dicts:
        ratios = []
        for obj in dic.get("annotations", []):
            all_count += 1
            seg = obj.get("segmentation")
            if not seg:
                empty_count += 1
                continue
            try:
                ratios.append(compute_ann_ratio(obj))
            except Exception:
                problematic_count += 1
        if shown < args.max_images:
            img = cv2.imread(dic["file_name"], cv2.IMREAD_COLOR)
            if img is not None:
                vis = Visualizer(img)
                boxes = np.array(
                    [o["bbox"] for o in dic.get("annotations", [])],
                    np.float32).reshape(-1, 4)
                boxes[:, 2:] += boxes[:, :2]
                vis.draw_boxes(boxes)
                output(vis.get(), os.path.basename(dic["file_name"]))
                shown += 1
    print("all", all_count)
    print("empty", empty_count)
    print("problematic", problematic_count)


if __name__ == "__main__":
    main()
