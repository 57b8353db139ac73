"""Does splitting one big HBM->VMEM copy into N concurrent async DMAs raise
Pallas DMA bandwidth? Reads (TH, W, C) tiles from an ANY-space input with the
W axis split into N concurrent make_async_copy streams; the output write is a
negligible (8, 128) token so the measurement is read-dominated.

Usage: python tools/dma_streams_probe.py [--batch 32] [--th 32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(nstreams, B, H, W, C, TH, reps=8, iters=3):
    dt = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), dt)
    nH = H // TH
    rchunk = TH // nstreams  # split the copy on the H axis (outer dim)

    def kernel(x_ref, o_ref, xbuf, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        copies = []
        for s in range(nstreams):
            c = pltpu.make_async_copy(
                x_ref.at[b, pl.ds(i * TH + s * rchunk, rchunk)],
                xbuf.at[pl.ds(s * rchunk, rchunk)],
                sems.at[s],
            )
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        o_ref[...] = jnp.sum(
            xbuf[:8, :8, :128].astype(jnp.float32), axis=1) * 1e-6

    @jax.jit
    def one(xx):
        return pl.pallas_call(
            kernel,
            grid=(B, nH),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda b, i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TH, W, C), dt),
                pltpu.SemaphoreType.DMA((nstreams,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(xx)

    def program(xx):
        def body(carry, _):
            y = one(xx + carry.astype(xx.dtype))
            return jnp.sum(y, dtype=jnp.float32) * 1e-30, ()

        carry, _ = lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return carry

    f = jax.jit(program)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(x))
    dt_s = (time.perf_counter() - t0) / iters / reps
    gb = x.size * 2 / 1e9
    return dt_s, gb / dt_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--th", type=int, default=40)
    ap.add_argument("--streams", default="1,2,4,8")
    args = ap.parse_args()
    B, TH = args.batch, args.th
    H, W, C = 200, 336, 256
    print(f"read {B}x{H}x{W}x{C} bf16 tiles TH={TH}, N concurrent DMAs")
    for n in [int(s) for s in args.streams.split(",")]:
        t, bw = run(n, B, H, W, C, TH)
        print(f"streams={n:2d} {t * 1e3:8.2f} ms  {bw:7.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
