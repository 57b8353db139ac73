"""Batch-size sweep of the headline FCOS predict protocol (bench.py).

Measures images/sec at several batch sizes with the same serialized
in-graph reps protocol to find the throughput-optimal B for the graded
bench. Usage: python tools/bench_sweep.py [--batches 32 48 64] [--reps 8]
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
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 48, 64])
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = _flagship_cfg()
    h, w = cfg.TPU.TEST_PAD_SHAPE
    det = build_model(cfg)

    for B in args.batches:
        variables = det.init_variables(jax.random.PRNGKey(0), (h, w),
                                       batch_size=B)
        r = np.random.RandomState(0)
        img = jnp.asarray(r.randint(0, 255, (B, h, w, 3)), jnp.uint8)
        batch = {
            "scale": jnp.full((B,), 800.0 / 1333.0, jnp.float32),
            "orig_size": jnp.asarray([[1333, 2000]] * B, jnp.float32),
        }

        def program(z, image, variables=variables, batch=batch):
            def body(carry, _):
                b = dict(batch)
                b["image"] = image + carry.astype(image.dtype)
                out = det.predict(variables, b)
                s = jnp.sum(out["scores"][..., :1].astype(jnp.float32))
                return s * 1e-30, ()

            carry, _ = lax.scan(body, z, None, length=args.reps)
            return carry

        f = jax.jit(program)
        z = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        float(f(z, img))
        print(f"B={B}: compile+warm {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            float(f(z, img))
        dt = (time.perf_counter() - t0) / iters / args.reps
        print(f"B={B}: {dt * 1e3:8.2f} ms/batch  {B / dt:7.1f} img/s")


if __name__ == "__main__":
    main()
