"""On-chip A/B of the deform-conv bilinear gather formulations on the DCN
access pattern (P3-scale, K=9): 4-tap flat gather (4 rows of C per sample)
vs pair-table gather (2 rows of 2C from a doubled table — measured LOSS,
VALIDATION.md round 3) vs pair-SLICE gather (2 dynamic-slices of (2, C)
consecutive rows of the original table, no table build). Serialized
in-graph reps amortize the axon-tunnel dispatch overhead.

Usage: python tools/gather_probe.py [--batch 8] [--reps 8] [--skip-pair]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, x, off, reps, iters=3):
    def program(z):
        def body(carry, _):
            out = fn(x + carry.astype(x.dtype), off)
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--skip-pair", action="store_true",
                    help="skip the pair-TABLE variant (a documented loser)")
    args = ap.parse_args()
    B, reps = args.batch, args.reps
    H, W, K = 100, 168, 9

    from slenderobjdet_tpu.ops import deform_conv as dc

    def flat(x, off):
        yy = jnp.arange(x.shape[1], dtype=off.dtype)[None, :, None, None] \
            + off[..., 0]
        xx = jnp.arange(x.shape[2], dtype=off.dtype)[None, None, :, None] \
            + off[..., 1]
        return dc._gather_bilinear_zeropad_batched(x, yy, xx)

    def pair(x, off):
        yy = jnp.arange(x.shape[1], dtype=off.dtype)[None, :, None, None] \
            + off[..., 0]
        xx = jnp.arange(x.shape[2], dtype=off.dtype)[None, None, :, None] \
            + off[..., 1]
        return dc._gather_bilinear_pair_batched(x, yy, xx)

    def pairslice(x, off):
        yy = jnp.arange(x.shape[1], dtype=off.dtype)[None, :, None, None] \
            + off[..., 0]
        xx = jnp.arange(x.shape[2], dtype=off.dtype)[None, None, :, None] \
            + off[..., 1]
        return dc._gather_bilinear_pairslice_batched(x, yy, xx)

    r = np.random.RandomState(0)
    off = jnp.asarray(r.randn(B, H, W, K, 2) * 3, jnp.float32)
    for C in (256, 512):
        x = jnp.asarray(r.rand(B, H, W, C), jnp.bfloat16)
        tf = timed(flat, x, off, reps)
        ts = timed(pairslice, x, off, reps)
        gb = B * H * W * K * 4 * C * 2 / 1e9
        line = (f"C={C}: flat {tf * 1e3:7.2f} ms ({gb / tf:.1f} GB/s)  "
                f"pairslice {ts * 1e3:7.2f} ms ({gb / ts:.1f} GB/s, "
                f"{tf / ts:.2f}x)")
        if not args.skip_pair:
            tp = timed(pair, x, off, reps)
            line += f"  pairtable {tp * 1e3:7.2f} ms ({tf / tp:.2f}x)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
