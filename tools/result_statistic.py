#!/usr/bin/env python
"""Re-evaluate a saved prediction file offline (counterpart of
/root/reference/tools/result_statistic.py:74-118: load predictions, run the
slender COCOEvaluator over them without a model, dump the metric dict next
to the prediction file, print the table).

Usage:
  python tools/result_statistic.py --prediction coco_instances_results.json \
      --gt-json instances.json [--out metrics.pkl]
"""

import argparse
import json
import os
import pickle
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prediction", required=True,
                    help="coco_instances_results.json from COCOEvaluator")
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--out", default="",
                    help="default: <prediction stem>.pkl next to it")
    args = ap.parse_args()

    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.evaluation import COCOEvaluator

    name = "_result_statistic"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, args.gt_json, image_root="")

    out_dir = os.path.dirname(os.path.abspath(args.prediction))
    evaluator = COCOEvaluator(name, output_dir=None)
    evaluator.reset()

    with open(args.prediction) as f:
        preds = json.load(f)
    by_image = defaultdict(list)
    for p in preds:
        by_image[p["image_id"]].append(p)

    # feed the evaluator through its fixed-shape process() interface
    id_map = evaluator._dataset_id_to_contiguous
    for img_id, insts in sorted(by_image.items()):
        insts = sorted(insts, key=lambda d: -d["score"])
        boxes = np.array([i["bbox"] for i in insts], np.float32).reshape(-1, 4)
        boxes[:, 2:] += boxes[:, :2]
        outputs = {
            "boxes": boxes[None],
            "scores": np.array([[i["score"] for i in insts]], np.float32),
            "classes": np.array(
                [[id_map[i["category_id"]] for i in insts]], np.int32),
            "valid": np.ones((1, len(insts)), bool),
        }
        evaluator.process({"image_id": [img_id]}, outputs)

    results = evaluator.evaluate()
    for task, metrics in results.items():
        # scalar metrics on one line; dict-valued entries (AP-per-category,
        # AP-ratios) nested below, matching the evaluator's round-3 schema
        scalars = {k: v for k, v in metrics.items()
                   if isinstance(v, (int, float, np.floating, np.integer))}
        print(f"[{task}] " + ", ".join(
            f"{k}={v:.3f}" for k, v in scalars.items()))
        for k, v in metrics.items():
            if isinstance(v, dict):
                print(f"  {k}: " + ", ".join(
                    f"{kk}={vv:.3f}" for kk, vv in v.items()
                    if isinstance(vv, (int, float, np.floating, np.integer))))

    out = args.out or os.path.join(
        out_dir, os.path.splitext(os.path.basename(args.prediction))[0] + ".pkl")
    with open(out, "wb") as f:
        pickle.dump(results, f)
    print("saved metrics to", out)


if __name__ == "__main__":
    main()
