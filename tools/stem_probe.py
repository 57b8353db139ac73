"""On-chip A/B of the fused Pallas stem (ops/fused_stem.py) vs the plain
XLA conv+affine+relu+maxpool composition at the flagship bench shape.
The fused timing INCLUDES its XLA-side input relayout (_prep_input), which
is part of the op. Same serialized in-graph reps protocol as bench.py so
the axon-tunnel dispatch overhead amortizes.

Usage: python tools/stem_probe.py [--batch 32] [--reps 8] [--size 800 1344]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, x, args, reps, iters=3):
    def program(z):
        def body(carry, _):
            out = fn(x + carry.astype(x.dtype), *args)
            return jnp.sum(out[..., :1].astype(jnp.float32)) * 1e-30, ()

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=(800, 1344))
    args = ap.parse_args()
    B = args.batch
    H, W = args.size

    from slenderobjdet_tpu.ops.fused_stem import fused_stem, reference_stem

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, H, W, 3), jnp.bfloat16)
    w = jnp.asarray(r.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(r.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(r.randn(64).astype(np.float32) * 0.1)

    tx = timed(reference_stem, x, (w, scale, bias), args.reps)
    tf = timed(fused_stem, x, (w, scale, bias), args.reps)
    print(f"B={B} {H}x{W}: xla {tx * 1e3:7.2f} ms  "
          f"fused {tf * 1e3:7.2f} ms  speedup {tx / tf:.2f}x", flush=True)


if __name__ == "__main__":
    main()
