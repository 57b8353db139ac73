"""Staged device-time profile of FCOS predict: forward / +candidates / +NMS.

Uses 32 serialized in-graph reps so the ~28 ms axon-tunnel program-dispatch
overhead (measured in round 3: total = ~28 ms + reps * op-time) amortizes to
<1 ms per rep.

Usage: python tools/predict_profile.py [--batch 32] [--reps 32]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()
    B, K = args.batch, args.reps
    H, W = 800, 1344

    from __graft_entry__ import _flagship_cfg
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.models.meta_arch.fcos import (
        _fcos_level_candidates)

    cfg = _flagship_cfg()
    det = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = det.init_variables(rng, (H, W), batch_size=B)
    img = jnp.zeros((B, H, W, 3), jnp.uint8)
    batch = {
        "image": img,
        "scale": jnp.full((B,), 800.0 / 1333.0, jnp.float32),
        "orig_size": jnp.asarray([[1333, 2000]] * B, jnp.float32),
    }

    def fwd(carry):
        x = img + carry.astype(jnp.uint8)
        return det.module.apply(variables, x, train=False)

    def fwd_cand(carry):
        x = img + carry.astype(jnp.uint8)
        logits_l, reg_l, ctr_l = det.module.apply(variables, x, train=False)
        locations_np, counts = det._locations((H, W))
        offsets = np.concatenate([[0], np.cumsum(counts)])
        outs = []
        for lvl in range(len(counts)):
            locs = jnp.asarray(locations_np[offsets[lvl]: offsets[lvl + 1]])
            outs.append(_fcos_level_candidates(
                logits_l[lvl], reg_l[lvl],
                ctr_l[lvl] if ctr_l is not None else None, locs,
                det.pre_nms_thresh, det.pre_nms_top_n,
                approx=det.approx_topk))
        return [jnp.concatenate([o[i] for o in outs], axis=1)
                for i in range(4)]

    def full(carry):
        b = dict(batch)
        b["image"] = img + carry.astype(jnp.uint8)
        return det.predict(variables, b)

    for name, fn in (("fwd", fwd), ("fwd+cand", fwd_cand), ("full", full)):
        t = timed(fn, K)
        print(f"{name:10s} {t * 1e3:8.2f} ms  ({B / t:.1f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
