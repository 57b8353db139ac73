"""On-chip A/B of the fused RoIAlign tap gather formulations.

The fused pooler (ops/roi_align.py multilevel_roi_align_fused) reads 4
bilinear taps per sample as 4 independent row gathers of C*2 bytes (512 B at
C=256 bf16). Taps (y, x0) and (y, x0+1) are ADJACENT rows of the flattened
level table, so a slice-gather of 2 consecutive rows (1 KB contiguous)
fetches both x-taps with one descriptor: half the descriptors, half the
fetched bytes if HBM reads have a >=1 KB effective granule (the round-2/3
deform-conv experiments measured 512 B rows streaming well below the 1-2 KB
rates).

Variants on the ROI pool access pattern (1000 rois x 7x7x2x2 samples,
multi-level flat table of an 800x1344 P2-P5 pyramid):
  flat4 — current: 4 independent row gathers
  pair2 — 2 slice-gathers of (2, C) consecutive rows + in-register select

Usage: python tools/roi_gather_probe.py [--batch 8] [--c 256] [--reps 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, args, reps, iters=3):
    # args are jit ARGUMENTS: closed-over arrays get baked into the
    # StableHLO as constants and exceed the axon remote-compile payload
    # limit (HTTP 413)
    def program(z, *a):
        def body(carry, _):
            out = fn(carry, *a)
            s = jnp.sum(out[..., :1].astype(jnp.float32))
            return s * 1e-30, ()

        carry, _ = lax.scan(body, z, None, length=reps)
        return carry

    f = jax.jit(program)
    z = jnp.zeros((), jnp.float32)
    float(f(z, *args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(z, *args))
    return (time.perf_counter() - t0) / iters / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rois", type=int, default=1000)
    args = ap.parse_args()
    B, C, N = args.batch, args.c, args.rois

    # P2..P5 of 800x1344
    hw = [(200, 336), (100, 168), (50, 84), (25, 42)]
    R = sum(h * w for h, w in hw)
    P, S = 7, 2
    M = N * P * S * P * S                      # samples per image

    r = np.random.RandomState(0)
    flat = jnp.asarray(r.rand(B, R, C), jnp.bfloat16)
    # random rows with random x-fractions; x0 never the last column of its
    # level for simplicity (the real pooler handles the border by clamping)
    rows = jnp.asarray(r.randint(0, R - 2, (B, M)), jnp.int32)
    fy = jnp.asarray(r.rand(B, M), jnp.float32)
    fx = jnp.asarray(r.rand(B, M), jnp.float32)
    stride_w = 168                             # row distance of the y-pair

    def flat4(z, flat, rows, fy, fx):
        def one(f, rw, wy, wx):
            i00 = rw
            i01 = rw + 1
            i10 = jnp.minimum(rw + stride_w, R - 1)
            i11 = jnp.minimum(rw + stride_w + 1, R - 1)
            v00 = f[i00]
            v01 = f[i01]
            v10 = f[i10]
            v11 = f[i11]
            wy_ = wy[:, None]
            wx_ = wx[:, None]
            return (v00 * (1 - wy_) * (1 - wx_) + v01 * (1 - wy_) * wx_
                    + v10 * wy_ * (1 - wx_) + v11 * wy_ * wx_)

        return jax.vmap(one)(flat, rows + z.astype(jnp.int32), fy, fx)

    def pair2(z, flat, rows, fy, fx):
        def one(f, rw, wy, wx):
            def g2(i):
                return lax.dynamic_slice(f, (i, 0), (2, C))

            top = jax.vmap(g2)(rw)                          # (M, 2, C)
            bot = jax.vmap(g2)(jnp.minimum(rw + stride_w, R - 2))
            wy_ = wy[:, None]
            wx_ = wx[:, None]
            vt = top[:, 0] * (1 - wx_) + top[:, 1] * wx_
            vb = bot[:, 0] * (1 - wx_) + bot[:, 1] * wx_
            return vt * (1 - wy_) + vb * wy_

        return jax.vmap(one)(flat, rows + z.astype(jnp.int32), fy, fx)

    bytes_useful = B * M * 4 * C * 2 / 1e9
    for name, fn in [("flat4", flat4), ("pair2", pair2)]:
        t = timed(fn, (flat, rows, fy, fx), args.reps)
        print(f"{name}: {t * 1e3:7.2f} ms  ({bytes_useful / t:.1f} GB/s useful)",
              flush=True)


if __name__ == "__main__":
    main()
