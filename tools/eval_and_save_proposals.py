#!/usr/bin/env python
"""Run a two-stage model over a dataset and save its RPN proposals
(counterpart of /root/reference/tools/eval_and_save_proposals.py +
COCOEvaluatorWithAnchors' box_proposals.pkl artifact).

Usage:
  python tools/eval_and_save_proposals.py --config-file configs/faster/... \
      --weights output/model_0001000 --out box_proposals.pkl [--max-images 100]
"""

import argparse
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--out", default="box_proposals.pkl")
    ap.add_argument("--max-images", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import build_detection_test_loader
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    if args.weights:
        from slenderobjdet_tpu.checkpoint import DetectionCheckpointer

        # restore params from an orbax checkpoint directory
        import os

        ckpt = DetectionCheckpointer(os.path.dirname(args.weights) or ".")
        state = ckpt.load(args.weights, variables)
        variables = {"params": state["params"]}
        if state.get("buffers"):
            variables["buffers"] = state["buffers"]

    predict = jax.jit(det.predict)
    loader = build_detection_test_loader(cfg, cfg.DATASETS.TEST[0],
                                         batch_size=4)
    boxes, anchors, logits, ids = [], [], [], []
    for batch in loader:
        dev = {k: jnp.asarray(batch[k]) for k in
               ("image", "scale", "orig_size", "image_size")
               if k in batch}
        out = predict(variables, dev)
        props = np.asarray(out["proposals"])
        scores = np.asarray(out["proposal_scores"])
        valid = np.asarray(out["proposal_valid"])
        prop_anchors = (np.asarray(out["proposal_anchors"])
                        if "proposal_anchors" in out else None)
        for i, img_id in enumerate(batch["image_id"]):
            if not batch["batch_valid"][i]:
                continue
            ids.append(int(img_id))
            boxes.append(props[i][valid[i]])
            logits.append(scores[i][valid[i]])
            anchors.append(prop_anchors[i][valid[i]]
                           if prop_anchors is not None else None)
        if len(ids) >= args.max_images:
            break
    # reference pkl schema (coco_evaluation_with_anchors.py:45-51)
    with open(args.out, "wb") as f:
        pickle.dump({"boxes": boxes, "anchors": anchors,
                     "objectness_logits": logits, "ids": ids,
                     "bbox_mode": "XYXY_ABS"}, f)
    print(f"saved {len(ids)} images of proposals to {args.out}")


if __name__ == "__main__":
    main()
