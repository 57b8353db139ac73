#!/usr/bin/env python
"""Eval-only driver for Objects365 (counterpart of
/root/reference/tools/inference_obj365.py:1-95: run a trained model over an
Objects365 split with the 365->COCO-80 class mapping and dump COCO-format
results chunk by chunk).

Usage:
  python tools/inference_obj365.py --config-file configs/fcos/... \
      --gt-json obj365_val.json --image-root images/ \
      [--weights ckpt] [--out-dir obj365_out] [--max-images N]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--out-dir", default="obj365_out")
    ap.add_argument("--max-images", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=500,
                    help="dump partial results every N images "
                         "(the reference's chunked save)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import (
        DatasetCatalog,
        build_detection_test_loader,
    )
    from slenderobjdet_tpu.data.datasets.objects365 import register_objects365
    from slenderobjdet_tpu.evaluation import COCOEvaluator

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.freeze()

    name = "_obj365_inference"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_objects365(name, args.gt_json, args.image_root)

    det = build_and_load(cfg, args.weights)
    predict = jax.jit(det.predict)

    os.makedirs(args.out_dir, exist_ok=True)
    evaluator = COCOEvaluator(name, output_dir=args.out_dir)
    evaluator.reset()

    loader = build_detection_test_loader(cfg, name,
                                         batch_size=args.batch_size)
    seen = chunk_id = 0
    for batch in loader:
        dev = {k: jnp.asarray(batch[k]) for k in
               ("image", "scale", "orig_size", "image_size") if k in batch}
        out = predict(det._variables, dev)
        evaluator.process(batch, {k: np.asarray(v) for k, v in out.items()})
        seen += int(np.sum(batch.get(
            "batch_valid", [True] * len(batch["image_id"]))))
        if seen and seen % args.chunk == 0:
            dump_partial(evaluator, args.out_dir, chunk_id)
            chunk_id += 1
        if args.max_images and seen >= args.max_images:
            break

    results = evaluator.evaluate()
    with open(os.path.join(args.out_dir, "obj365_metrics.json"), "w") as f:
        json.dump(results, f, default=float)
    print(json.dumps({k: dict(v) for k, v in results.items()},
                     default=float)[:2000])


def build_and_load(cfg, weights):
    import jax

    from slenderobjdet_tpu.models import build_model

    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    if weights:
        from slenderobjdet_tpu.checkpoint import DetectionCheckpointer

        ckpt = DetectionCheckpointer(os.path.dirname(weights) or ".")
        state = ckpt.load(weights, variables)
        variables = {"params": state["params"]}
        if state.get("buffers"):
            variables["buffers"] = state["buffers"]
    det._variables = variables
    return det


def dump_partial(evaluator, out_dir, chunk_id):
    insts = [i for p in evaluator._predictions for i in p["instances"]]
    with open(os.path.join(out_dir, f"results_chunk_{chunk_id:04d}.json"),
              "w") as f:
        json.dump(insts, f)
    print(f"dumped chunk {chunk_id} ({len(insts)} dets)")


if __name__ == "__main__":
    main()
