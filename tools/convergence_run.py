#!/usr/bin/env python
"""Synthetic-convergence harness: train any registered meta-arch for N steps
on generated visible-object COCO-format data and report the loss trajectory
plus held-out detection precision/recall. The evidence generator behind
VALIDATION.md's convergence records (FCOS/RetinaNet/R-CNN in round 1,
RepPoints family in round 2, CornerNet BN-vs-FrozenBN in round 3).

Usage:
  python tools/convergence_run.py --config-file configs/corner/corner_net_hourglass.yaml \
      --steps 800 [--hw 256 256] [--lr 2.5e-4] [opts ...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth_batch(rng, batch_size, hw, num_classes, max_gt=8):
    """Visible solid rectangles on dark noise, like tests/synthetic.py."""
    h, w = hw
    imgs = rng.randint(0, 40, (batch_size, h, w, 3)).astype(np.uint8)
    boxes = np.zeros((batch_size, max_gt, 4), np.float32)
    classes = np.zeros((batch_size, max_gt), np.int32)
    valid = np.zeros((batch_size, max_gt), bool)
    palette = np.stack([np.linspace(140, 255, num_classes)] * 3, 1)
    for i in range(batch_size):
        n = rng.randint(1, min(4, max_gt) + 1)
        for j in range(n):
            bw, bh = rng.randint(20, max(21, w // 3)), rng.randint(
                20, max(21, h // 3))
            x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
            c = rng.randint(0, num_classes)
            imgs[i, y:y + bh, x:x + bw] = palette[c] + rng.randint(-10, 10, 3)
            boxes[i, j] = (x, y, x + bw, y + bh)
            classes[i, j] = c
            valid[i, j] = True
    return {"image": imgs, "gt_boxes": boxes, "gt_classes": classes,
            "gt_valid": valid}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 256])
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--num-classes", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.engine.train_loop import (
        create_train_state, make_train_step)
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    for key in ("FCOS", "RETINANET", "CORNER_NET", "REPPOINTS"):
        node = getattr(cfg.MODEL, key, None)
        if node is not None and hasattr(node, "NUM_CLASSES"):
            node.NUM_CLASSES = args.num_classes
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = args.num_classes
    if args.lr is not None:
        cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.MAX_ITER = args.steps
    cfg.SOLVER.STEPS = (int(args.steps * 0.7), int(args.steps * 0.9))
    cfg.SOLVER.WARMUP_ITERS = min(100, args.steps // 5)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    det = build_model(cfg)
    tx = build_optimizer(cfg, None)
    hw = tuple(args.hw)
    state = create_train_state(det, tx, jax.random.PRNGKey(args.seed), hw,
                               args.batch)
    step = make_train_step(det, tx)

    rng = np.random.RandomState(args.seed)
    first = last = None
    t0 = time.time()
    for it in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in synth_batch(
            rng, args.batch, hw, args.num_classes).items()}
        state, metrics = step(state, batch)
        if it == 0 or (it + 1) % args.log_every == 0 or it == args.steps - 1:
            loss = float(metrics["total_loss"])
            if first is None:
                first = loss
            last = loss
            print(f"iter {it + 1}/{args.steps} loss={loss:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out precision/recall at IoU .5
    test_rng = np.random.RandomState(args.seed + 1)
    tp = fp = fn = 0
    predict = jax.jit(det.predict)
    for _ in range(4):
        batch = synth_batch(test_rng, args.batch, hw, args.num_classes)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        jb["scale"] = jnp.ones((args.batch,), jnp.float32)
        jb["orig_size"] = jnp.asarray([[hw[0], hw[1]]] * args.batch,
                                      jnp.float32)
        out = {k: np.asarray(v) for k, v in predict(
            {"params": state.params, **({"buffers": state.buffers}
                                        if state.buffers else {})},
            jb).items()}
        for i in range(args.batch):
            gt = batch["gt_boxes"][i][batch["gt_valid"][i]]
            keep = out["valid"][i] & (out["scores"][i] > 0.3)
            dets = out["boxes"][i][keep]
            matched = np.zeros(len(gt), bool)
            for d in dets:
                x1 = np.maximum(d[0], gt[:, 0]); y1 = np.maximum(d[1], gt[:, 1])
                x2 = np.minimum(d[2], gt[:, 2]); y2 = np.minimum(d[3], gt[:, 3])
                inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
                union = ((d[2] - d[0]) * (d[3] - d[1])
                         + (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
                         - inter)
                ious = inter / np.maximum(union, 1e-6)
                j = int(np.argmax(ious)) if len(gt) else -1
                if j >= 0 and ious[j] >= 0.5 and not matched[j]:
                    matched[j] = True
                    tp += 1
                else:
                    fp += 1
            fn += int((~matched).sum())

    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    print(json.dumps({
        "config": args.config_file, "steps": args.steps,
        "first_loss": first, "last_loss": last,
        "precision@0.5": round(precision, 3), "recall@0.5": round(recall, 3),
    }))


if __name__ == "__main__":
    main()
