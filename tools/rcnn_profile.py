"""Staged device-time profile of Faster R-CNN (ProposalVisibleRCNN) predict:
backbone+RPN-head forward / +RPN proposal selection (topk+NMS) / +ROIAlign
pooling / +box head / full predict. Same serialized in-graph reps protocol as
reppoints_profile.py (amortizes the ~28 ms axon-tunnel dispatch overhead).

Usage: python tools/rcnn_profile.py [--batch 8] [--reps 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, reps, iters=3):
    def program(z):
        def body(carry, _):
            out = fn(carry)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)
            return s * 1e-30, ()

        carry, _ = lax.scan(body, z, None, length=reps)
        return carry

    f = jax.jit(program)
    z = jnp.zeros((), jnp.float32)
    float(f(z))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(z))
    return (time.perf_counter() - t0) / iters / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--all-level-pool", action="store_true",
                    help="profile the pool-every-level path instead of the "
                         "fused single-gather inference pooler")
    args = ap.parse_args()
    B, K = args.batch, args.reps
    H, W = 800, 1344

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/faster/faster_rcnn_R_50_FPN_1x.yaml")
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0), (H, W), batch_size=B)
    img = jnp.zeros((B, H, W, 3), jnp.uint8)
    batch = {
        "image": img,
        "scale": jnp.full((B,), 800.0 / 1333.0, jnp.float32),
        "orig_size": jnp.asarray([[1333, 2000]] * B, jnp.float32),
    }

    main_vars, roi_vars = det._split_variables(variables)
    anchors_np, counts = det._rpn_anchors((H, W))
    image_sizes = jnp.broadcast_to(
        jnp.asarray((H, W), jnp.int32), (B, 2))

    def fwd(z):
        x = img + z.astype(img.dtype)
        return det.module.apply(main_vars, x)

    def props(z):
        logits_l, deltas_l, roi_feats = fwd(z)
        logits = jnp.concatenate(logits_l, axis=1)
        deltas = jnp.concatenate(deltas_l, axis=1)
        proposals, prop_scores, prop_valid = det.rpn.proposals(
            anchors_np, counts, logits, deltas, image_sizes, train=False)
        return proposals, prop_scores, prop_valid, roi_feats

    fused = not args.all_level_pool

    def pooled_feats(z):
        proposals, prop_scores, prop_valid, roi_feats = props(z)
        pooled = jax.vmap(
            lambda *a: det.roi_heads.pool(list(a[:-1]), a[-1], fused=fused)
        )(*roi_feats, proposals)
        return pooled, proposals, prop_valid

    def box_head(z):
        pooled, proposals, prop_valid = pooled_feats(z)
        scores, deltas = det.roi_heads.module.apply(roi_vars, pooled)
        return scores, deltas

    def full(z):
        b = dict(batch)
        b["image"] = img + z.astype(img.dtype)
        return det.predict(variables, b)

    t_fwd = timed(fwd, K)
    t_props = timed(props, K)
    t_pool = timed(pooled_feats, K)
    t_head = timed(box_head, K)
    t_full = timed(full, K)

    print(f"B={B} {H}x{W}:")
    print(f"  backbone+RPN fwd  {t_fwd * 1e3:8.2f} ms  ({t_fwd / B * 1e3:.2f} ms/img)")
    print(f"  +RPN proposals    {t_props * 1e3:8.2f} ms  (+{(t_props - t_fwd) / B * 1e3:.2f} ms/img)")
    print(f"  +ROIAlign pool    {t_pool * 1e3:8.2f} ms  (+{(t_pool - t_props) / B * 1e3:.2f} ms/img)")
    print(f"  +box head         {t_head * 1e3:8.2f} ms  (+{(t_head - t_pool) / B * 1e3:.2f} ms/img)")
    print(f"  full predict      {t_full * 1e3:8.2f} ms  (+{(t_full - t_head) / B * 1e3:.2f} ms/img final NMS)")
    print(f"  total             {t_full / B * 1e3:.2f} ms/img ({B / t_full:.1f} img/s)")


if __name__ == "__main__":
    main()
