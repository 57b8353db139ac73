#!/usr/bin/env python
"""Visualize the feature-adaption sampling points of a deformable detector
(counterpart of /root/reference/tools/vis_feat_adaption.py:1-33 — upstream
is an ipdb probe over the train loader + model; here the RepPoints-family
init offsets are actually rendered: for each of the top-scoring locations,
the P predicted points that drive the deformable conv).

Usage:
  python tools/vis_feat_adaption.py --config-file configs/rep-points/... \
      --gt-json inst.json --image-root images/ [--out-dir vis_adapt]
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
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--out-dir", default="vis_adapt")
    ap.add_argument("--weights", default="")
    ap.add_argument("--num-images", type=int, default=4)
    ap.add_argument("--top-locations", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import (
        DatasetCatalog,
        build_detection_test_loader,
    )
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.freeze()
    det = build_model(cfg)
    if not hasattr(det, "_centers"):
        raise SystemExit(
            "feat-adaption visualization needs a RepPoints-family model "
            f"(got {cfg.MODEL.META_ARCHITECTURE})")
    variables = det.init_variables(jax.random.PRNGKey(0))
    if args.weights:
        from slenderobjdet_tpu.checkpoint import DetectionCheckpointer

        ckpt = DetectionCheckpointer(os.path.dirname(args.weights) or ".")
        state = ckpt.load(args.weights, variables)
        variables = {"params": state["params"]}
        if state.get("buffers"):
            variables["buffers"] = state["buffers"]

    name = "_vis_feat_adaption"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, args.gt_json, args.image_root)
    loader = build_detection_test_loader(cfg, name, batch_size=1)

    @jax.jit
    def head_outputs(variables, images):
        return det.module.apply(det._module_variables(variables), images)

    os.makedirs(args.out_dir, exist_ok=True)
    done = 0
    for batch in loader:
        if done >= args.num_images:
            break
        images = jnp.asarray(batch["image"])
        outs = head_outputs(variables, images)
        logits_l, init_l = outs[0], outs[1]
        centers_np, counts, _ = det._centers(images.shape[1:3])
        offsets = np.concatenate([[0], np.cumsum(counts)])

        img = np.asarray(batch["image"][0]).astype(np.uint8).copy()
        # pick the globally top-scoring locations, draw their point sets
        scores = np.concatenate(
            [np.asarray(jax.nn.sigmoid(l)).max(-1)[0] for l in logits_l])
        top = np.argsort(-scores)[: args.top_locations]
        P = det.num_points
        for loc in top:
            lvl = int(np.searchsorted(offsets, loc, side="right")) - 1
            in_lvl = loc - offsets[lvl]
            deltas = np.asarray(init_l[lvl][0, in_lvl]).reshape(P, 2)
            c = centers_np[loc]
            pts = deltas * det.point_strides[lvl] + c
            color = (0, 255, 255)
            cv2.circle(img, (int(c[0]), int(c[1])), 3, (0, 0, 255), -1)
            for p in pts:
                cv2.circle(img, (int(p[0]), int(p[1])), 1, color, -1)
                cv2.line(img, (int(c[0]), int(c[1])),
                         (int(p[0]), int(p[1])), (120, 120, 120), 1)
        out_path = os.path.join(
            args.out_dir, f"adaption_{int(batch['image_id'][0])}.jpg")
        cv2.imwrite(out_path, img)
        done += 1
    print(f"wrote {done} feature-adaption views to {args.out_dir}")


if __name__ == "__main__":
    main()
