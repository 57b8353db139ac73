#!/usr/bin/env python
"""Compare the Origin (IoU) and TopK matchers on live anchors/gt
(counterpart of /root/reference/tools/compare_matchers.py and
tests/test_topk_matcher.py): prints positive-anchor counts per strategy on a
dataset sample.

Usage:
  python tools/compare_matchers.py --config-file configs/faster/... \
      [--num-images 8] [--topk 10]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--num-images", type=int, default=8)
    ap.add_argument("--topk", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import build_detection_test_loader
    from slenderobjdet_tpu.models.anchors import AnchorGeneratorSpec
    from slenderobjdet_tpu.models.matchers import iou_matcher, topk_matcher

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.freeze()

    strides = [2 ** int(f[1:]) for f in cfg.MODEL.RPN.IN_FEATURES]
    spec = AnchorGeneratorSpec(cfg, strides)
    loader = build_detection_test_loader(cfg, cfg.DATASETS.TEST[0],
                                         batch_size=1)

    seen = 0
    stats = {"iou": [], "topk": []}
    for batch in loader:
        anchors, _ = spec.anchors(batch["image"].shape[1:3])
        gt = jnp.asarray(batch["gt_boxes"][0])
        gv = jnp.asarray(batch["gt_valid"][0])
        if not bool(np.asarray(gv).any()):
            continue
        _, lab_iou = iou_matcher(jnp.asarray(anchors), gt, gv,
                                 cfg.MODEL.RPN.IOU_THRESHOLDS,
                                 cfg.MODEL.RPN.IOU_LABELS)
        _, lab_topk = topk_matcher(jnp.asarray(anchors), gt, gv,
                                   cfg.MODEL.RPN.IOU_THRESHOLDS,
                                   cfg.MODEL.RPN.IOU_LABELS, k=args.topk)
        n_gt = int(np.asarray(gv).sum())
        stats["iou"].append(int((np.asarray(lab_iou) == 1).sum()) / n_gt)
        stats["topk"].append(int((np.asarray(lab_topk) == 1).sum()) / n_gt)
        seen += 1
        if seen >= args.num_images:
            break
    for k, v in stats.items():
        print(f"{k:>5s} matcher: {np.mean(v):.2f} positive anchors per gt "
              f"(over {seen} images)")


if __name__ == "__main__":
    main()
