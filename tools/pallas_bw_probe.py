"""Pallas DMA bandwidth probe: canonical blocked copy kernels vs XLA copy.

Measures the ceiling of Pallas-driven HBM traffic on this chip against the
same traffic issued by XLA. Modes:
  xlacopy   y = x * 0.5 via XLA (one read + one write of the full array)
  blocked   pallas_call with auto-pipelined in/out BlockSpecs, full-width
            store (the canonical max-bandwidth pallas pattern)
  chunked   same but the store is two lane-sliced halves (the fused kernel's
            conv3 chunk loop pattern)

Usage: python tools/pallas_bw_probe.py [--batch 32] [--th 32]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(mode, B, H, W, C, TH, reps=8, iters=3):
    dt = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), dt)
    nH = H // TH

    if mode == "xlacopy":
        def one(xx):
            return xx * jnp.bfloat16(0.5)
    else:
        def kernel(x_ref, o_ref):
            if mode == "blocked":
                o_ref[...] = (x_ref[...].astype(jnp.float32) * 0.5).astype(
                    o_ref.dtype)
            else:
                for c0 in range(0, C, 128):
                    o_ref[0, :, :, c0:c0 + 128] = (
                        x_ref[0, :, :, c0:c0 + 128].astype(jnp.float32) * 0.5
                    ).astype(o_ref.dtype)

        @jax.jit
        def one(xx):
            return pl.pallas_call(
                kernel,
                grid=(B, nH),
                in_specs=[pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0))],
                out_specs=pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
            )(xx)

    def program(xx):
        def body(carry, _):
            y = one(xx + carry.astype(xx.dtype))
            return jnp.sum(y[0, 0, 0, :8], dtype=jnp.float32) * 1e-30, ()

        carry, _ = lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return carry

    f = jax.jit(program)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(x))
    dt_s = (time.perf_counter() - t0) / iters / reps
    gb = 2 * x.size * 2 / 1e9  # read + write, bf16
    return dt_s, gb / dt_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--th", type=int, default=32)
    ap.add_argument("--modes", default="xlacopy,blocked,chunked")
    args = ap.parse_args()
    B, TH = args.batch, args.th
    H, W, C = 200, 336, 256
    print(f"copy {B}x{H}x{W}x{C} bf16, TH={TH}")
    for mode in args.modes.split(","):
        t, bw = run(mode, B, H, W, C, TH)
        print(f"{mode:10s} {t * 1e3:8.2f} ms  {bw:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
