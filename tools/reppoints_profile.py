"""Staged device-time profile of RepPoints predict: backbone+FPN / full head
forward / full predict, plus the shared deform gather in isolation on the
same shapes. Same serialized in-graph reps protocol as predict_profile.py
(amortizes the ~28 ms axon-tunnel dispatch overhead).

Usage: python tools/reppoints_profile.py [--batch 8] [--reps 8]
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
    ap.add_argument("--full", action="store_true",
                    help="also time full predict (one more big compile; "
                         "family_predict_bench already reports it)")
    args = ap.parse_args()
    B, K = args.batch, args.reps
    H, W = 800, 1344

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/rep-points/rep_points_detector_R_50_FPN_1x.yaml")
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0), (H, W), batch_size=B)
    img = jnp.zeros((B, H, W, 3), jnp.uint8)
    batch = {
        "image": img,
        "scale": jnp.full((B,), 800.0 / 1333.0, jnp.float32),
        "orig_size": jnp.asarray([[1333, 2000]] * B, jnp.float32),
    }

    mod_vars = det._module_variables(variables)
    bb = det.module.backbone
    mean = jnp.asarray(det.module.pixel_mean)
    std = jnp.asarray(det.module.pixel_std)
    dtype = det.module.dtype
    bb_vars = {"params": mod_vars["params"]["backbone"]}
    if "buffers" in mod_vars:
        bb_vars["buffers"] = mod_vars["buffers"].get("backbone", {})

    def backbone_only(z):
        x = (img.astype(jnp.float32) + z - mean) / std
        feats = bb.apply(bb_vars, x.astype(dtype))
        return [feats[f] for f in det.module.in_features]

    def head_fwd(z):
        b = dict(batch)
        b["image"] = img + z.astype(img.dtype)
        return det.module.apply(mod_vars, b["image"])

    def full_predict(z):
        b = dict(batch)
        b["image"] = img + z.astype(img.dtype)
        return det.predict(variables, b)

    t_bb = timed(backbone_only, K)
    t_head = timed(head_fwd, K)
    t_full = timed(full_predict, K) if args.full else t_head

    # the shared 2C-wide gather in isolation, P3 shape
    from slenderobjdet_tpu.ops.deform_conv import deform_sample_batched

    h3, w3, c2 = 100, 168, 512
    r = np.random.RandomState(0)
    cat = jnp.asarray(r.rand(B, h3, w3, c2), jnp.bfloat16)
    off = jnp.asarray(r.randn(B, h3, w3, 9, 2) * 3, jnp.float32)

    def gather_only(z):
        return deform_sample_batched(cat + z.astype(cat.dtype), off)

    t_gather = timed(gather_only, K)

    print(f"B={B} 800x1344:")
    print(f"  backbone+FPN      {t_bb * 1e3:8.2f} ms  ({t_bb / B * 1e3:.2f} ms/img)")
    print(f"  full head forward {t_head * 1e3:8.2f} ms  (+{(t_head - t_bb) / B * 1e3:.2f} ms/img head)")
    print(f"  full predict      {t_full * 1e3:8.2f} ms  (+{(t_full - t_head) / B * 1e3:.2f} ms/img post)")
    print(f"  P3 2C gather alone {t_gather * 1e3:7.2f} ms  ({t_gather / B * 1e3:.2f} ms/img)")


if __name__ == "__main__":
    main()
