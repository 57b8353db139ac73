"""Staged device-time profile of CornerNet predict: hourglass backbone /
full module forward (backbone + corner pools + heads) / full predict
(+decode/pairing/NMS). Same serialized in-graph reps protocol as
reppoints_profile.py.

Usage: python tools/corner_profile.py [--batch 4] [--reps 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, args_, reps, iters=3):
    def program(z, *a):
        def body(carry, _):
            out = fn(carry, *a)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)
            return s * 1e-30, ()

        carry, _ = lax.scan(body, z, None, length=reps)
        return carry

    f = jax.jit(program)
    z = jnp.zeros((), jnp.float32)
    float(f(z, *args_))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(z, *args_))
    return (time.perf_counter() - t0) / iters / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=(512, 768))
    args = ap.parse_args()
    B, K = args.batch, args.reps
    H, W = args.size

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/corner/corner_net_hourglass.yaml")
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0), (H, W), batch_size=B)
    img = jnp.zeros((B, H, W, 3), jnp.uint8)
    batch = {
        "image": img,
        "scale": jnp.full((B,), 1.0, jnp.float32),
        "orig_size": jnp.asarray([[H, W]] * B, jnp.float32),
    }

    mean = jnp.asarray(det.module.pixel_mean)
    std = jnp.asarray(det.module.pixel_std)
    dtype = det.module.dtype
    bb = det.backbone_spec.module

    def split_bb(variables):
        v = {"params": variables["params"]["backbone"]}
        if "buffers" in variables and "backbone" in variables["buffers"]:
            v["buffers"] = variables["buffers"]["backbone"]
        return v

    bb_vars = split_bb(variables)

    def backbone_only(z, bb_vars, img):
        x = (img.astype(jnp.float32) + z - mean) / std
        return bb.apply(bb_vars, x.astype(dtype))

    def full_fwd(z, variables, img):
        return det.module.apply(variables, img + z.astype(img.dtype))

    def full_predict(z, variables, img):
        b = dict(batch)
        b["image"] = img + z.astype(img.dtype)
        return det.predict(variables, b)

    t_bb = timed(backbone_only, (bb_vars, img), K)
    t_fwd = timed(full_fwd, (variables, img), K)
    t_full = timed(full_predict, (variables, img), K)

    print(f"B={B} {H}x{W}:")
    print(f"  hourglass backbone {t_bb * 1e3:8.2f} ms  ({t_bb / B * 1e3:.2f} ms/img)")
    print(f"  +pools/heads       {t_fwd * 1e3:8.2f} ms  (+{(t_fwd - t_bb) / B * 1e3:.2f} ms/img)")
    print(f"  full predict       {t_full * 1e3:8.2f} ms  (+{(t_full - t_fwd) / B * 1e3:.2f} ms/img decode)")
    print(f"  total              {t_full / B * 1e3:.2f} ms/img ({B / t_full:.1f} img/s)")


if __name__ == "__main__":
    main()
