"""Predict throughput for any config (reference evaluator.py:42-85 protocol,
adapted to the axon tunnel: reps serialized in-graph so per-dispatch enqueue
overhead amortizes; one scalar fetch forces execution).

Usage:
  python tools/family_predict_bench.py configs/retina/retinanet_R_50_FPN_1x.yaml \
      [--batch 8] [--reps 8] [--iters 3] [--size 800 1344]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--size", type=int, nargs=2, default=(800, 1344))
    ap.add_argument("--int8", action="store_true",
                    help="TPU.INT8_PREDICT: dynamic int8 for the wide 3x3 "
                         "convs (ops/quant.py); add --opts TPU.INT8_SCALES "
                         "scales.json (tools/int8_calibrate.py) for the "
                         "static calibrated path — wider coverage, no "
                         "per-tensor max reductions")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="extra cfg dotted overrides")
    args = ap.parse_args()
    B = args.batch
    H, W = args.size

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if args.int8:
        cfg.TPU.INT8_PREDICT = True
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0), (H, W),
                                   batch_size=B)
    img = jnp.zeros((B, H, W, 3), jnp.uint8)
    batch = {
        "image": img,
        "scale": jnp.full((B,), 800.0 / 1333.0, jnp.float32),
        "orig_size": jnp.asarray([[1333, 2000]] * B, jnp.float32),
    }

    # variables is a jit ARGUMENT, not a closure: closed-over params are
    # baked into the StableHLO as constants, and for big backbones
    # (hourglass-104) the axon remote_compile endpoint rejects the payload
    # (HTTP 413).
    def program(z, image, variables):
        def body(carry, _):
            b = dict(batch)
            b["image"] = image + carry.astype(image.dtype)
            out = det.predict(variables, b)
            s = jnp.sum(out["scores"][..., :1].astype(jnp.float32))
            return s * 1e-30, ()

        carry, _ = lax.scan(body, z, None, length=args.reps)
        return carry

    del batch["image"]
    f = jax.jit(program)
    z = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    float(f(z, img, variables))
    print(f"compile+warm {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(f(z, img, variables))
    dt = (time.perf_counter() - t0) / args.iters / args.reps
    name = cfg.MODEL.META_ARCHITECTURE
    tag = " int8" if args.int8 else ""
    print(f"{name}{tag} B={B} {H}x{W}: {dt * 1e3 / B:.2f} ms/img "
          f"({B / dt:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
