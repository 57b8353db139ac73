"""On-chip A/B of TPU.PACK_HEAD_LEVELS (ops/level_pack.py): run the same
detector's predict with the per-level head vs the mosaic-packed head on
identical variables (the packing is an execution strategy — the parameter
trees are identical, tests/test_level_pack.py) and report the speedup.

Same serialized in-graph reps protocol as tools/predict_profile.py so the
~28 ms axon-tunnel dispatch overhead amortizes out.

Usage: python tools/headpack_probe.py [--config configs/...yaml]
                                      [--batch 32] [--reps 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
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
    print(f"  [compile t={time.perf_counter():.0f}]", file=sys.stderr,
          flush=True)
    float(f(z))
    print(f"  [timing  t={time.perf_counter():.0f}]", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(z))
    return (time.perf_counter() - t0) / iters / reps


def build(config, pack):
    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(config)
    cfg.TPU.PACK_HEAD_LEVELS = pack
    cfg.freeze()
    return build_model(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "configs/fcos/fcos_R_50_FPN_1x.yaml"))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()
    B, K = args.batch, args.reps
    H, W = 800, 1344

    det0 = build(args.config, False)
    det1 = build(args.config, True)
    variables = det0.init_variables(jax.random.PRNGKey(0), (H, W),
                                    batch_size=B)
    img = jnp.zeros((B, H, W, 3), jnp.uint8)
    batch = {
        "image": img,
        "scale": jnp.full((B,), 800.0 / 1333.0, jnp.float32),
        "orig_size": jnp.asarray([[1333, 2000]] * B, jnp.float32),
    }

    times = {}
    for name, det in (("per-level", det0), ("packed", det1)):
        def full(carry, det=det):
            b = dict(batch)
            b["image"] = img + carry.astype(jnp.uint8)
            return det.predict(variables, b)

        t = timed(full, K)
        times[name] = t
        print(f"{name:10s} {t * 1e3:8.2f} ms/batch  ({B / t:.1f} img/s)",
              flush=True)
    print(f"speedup {times['per-level'] / times['packed']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
