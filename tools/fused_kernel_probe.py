"""Bisection probe for the fused-bottleneck Pallas kernel (round-3 perf).

The first on-chip A/B showed the fused kernel ~2x SLOWER than XLA's conv
composition on res2 (45.7 vs 24.3 ms at B=32), while a matmul-shape cost
model predicts ~15 ms. This script times stripped-down kernel variants on a
single res2-shaped block to locate the loss:

  xla       plain lax.conv composition (the thing to beat)
  full      the shipped kernel
  norolls   column shifts replaced by the unshifted a1 (wrong numerics,
            identical op count minus pltpu.roll + masks)
  notap     conv2 reduced to the single center tap (1 dot instead of 9)
  noconv2   conv2 skipped entirely (a2 = a1 center rows)
  dmaonly   halo DMA + output write only (bandwidth floor)

Usage: python tools/fused_kernel_probe.py [--batch 32] [--th 32]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def make_kernel(H, TH, W, cin, cm, cout, cchunk, mode):
    def kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               out_ref, xbuf, sem):
        i = pl.program_id(1)
        b = pl.program_id(0)
        if mode != "nodma":
            dma = pltpu.make_async_copy(
                xp_ref.at[b, pl.ds(i * TH, TH + 2)], xbuf, sem)
            dma.start()
            dma.wait()
        x = xbuf[:]

        if mode == "nodma":
            # output write + grid overhead only (no HBM read)
            v = (jnp.float32(b) + jnp.float32(i)).astype(jnp.bfloat16)
            for c0 in range(0, cout, cchunk):
                out_ref[0, :, :, c0:c0 + cchunk] = jnp.full(
                    (TH, W, cchunk), v, out_ref.dtype)
            return
        if mode == "dmanull":
            # DMA + aligned read + output write (no sublane-offset slice)
            for c0 in range(0, cout, cchunk):
                out_ref[0, :, :, c0:c0 + cchunk] = (
                    x[:TH, :, c0:c0 + cchunk].astype(jnp.float32) * 0.5
                ).astype(x.dtype)
            return
        if mode == "dmaonly":
            for c0 in range(0, cout, cchunk):
                out_ref[0, :, :, c0:c0 + cchunk] = (
                    x[1:TH + 1, :, :cchunk].astype(jnp.float32) * 0.5
                ).astype(x.dtype)
            return

        g = (jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W, 1), 0)
             + i * TH - 1)
        valid = (g >= 0) & (g < H)
        a1f = lax.dot_general(
            x, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:][None].astype(jnp.float32)
        a1f = jnp.where(valid, jnp.maximum(a1f, 0.0), 0.0)
        a1 = a1f.astype(x.dtype)

        if mode == "noconv2":
            a2 = a1[1:TH + 1]
        elif mode == "notap":
            acc = lax.dot_general(
                a1[1:TH + 1], w2_ref[4],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a2 = jnp.maximum(acc + b2_ref[:][None].astype(jnp.float32),
                             0.0).astype(x.dtype)
        else:
            if mode == "full":
                col = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
                zero = jnp.zeros((), jnp.float32)
                a1_l = jnp.where(col > 0, pltpu.roll(a1f, 1, axis=1),
                                 zero).astype(x.dtype)
                a1_r = jnp.where(col < W - 1, pltpu.roll(a1f, W - 1, axis=1),
                                 zero).astype(x.dtype)
                variants = (a1_l, a1, a1_r)
            else:  # norolls
                variants = (a1, a1, a1)
            acc = None
            for ky in range(3):
                for kx in range(3):
                    term = lax.dot_general(
                        variants[kx][ky:ky + TH], w2_ref[3 * ky + kx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = term if acc is None else acc + term
            a2 = jnp.maximum(acc + b2_ref[:][None].astype(jnp.float32),
                             0.0).astype(x.dtype)

        xc = xbuf[1:TH + 1]
        for c0 in range(0, cout, cchunk):
            t = lax.dot_general(
                a2, w3_ref[:, c0:c0 + cchunk],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b3_ref[:, c0:c0 + cchunk][None].astype(jnp.float32)
            t += xc[:, :, c0:c0 + cchunk].astype(jnp.float32)
            out_ref[0, :, :, c0:c0 + cchunk] = jnp.maximum(t, 0.0).astype(
                x.dtype)

    return kernel


def run_variant(mode, B, H, W, cin, cm, cout, TH, reps=8, iters=3):
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    # device-side input: a host randn of (32,200,336,256) is ~1 GB over the
    # axon tunnel and dominates the probe's wall clock
    x = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, cin), dt) * 0.1)
    w1 = jnp.asarray(rng.randn(cin, cm).astype(np.float32) * 0.05, dt)
    b1 = jnp.zeros((1, cm), jnp.float32)
    w2 = jnp.asarray(rng.randn(9, cm, cm).astype(np.float32) * 0.05, dt)
    b2 = jnp.zeros((1, cm), jnp.float32)
    w3 = jnp.asarray(rng.randn(cm, cout).astype(np.float32) * 0.05, dt)
    b3 = jnp.zeros((1, cout), jnp.float32)

    if mode == "xla":
        from slenderobjdet_tpu.ops.fused_bottleneck import (
            reference_bottleneck)

        def one(xx):
            return reference_bottleneck(
                xx, w1, b1[0], w2.reshape(3, 3, cm, cm), b2[0], w3, b3[0])
    else:
        nH = _cdiv(H, TH)
        cchunk = min(cout, 128)
        kernel = make_kernel(H, TH, W, cin, cm, cout, cchunk, mode)
        vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        @jax.jit
        def call(xx):
            xp = jnp.pad(xx, ((0, 0), (1, nH * TH - H + 1), (0, 0), (0, 0)))
            return pl.pallas_call(
                kernel,
                grid=(B, nH),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          vspec(), vspec(), vspec(), vspec(), vspec(),
                          vspec()],
                out_specs=pl.BlockSpec(
                    (1, TH, W, cout), lambda b, i: (b, i, 0, 0),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, W, cout), dt),
                scratch_shapes=[pltpu.VMEM((TH + 2, W, cin), dt),
                                pltpu.SemaphoreType.DMA(())],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
            )(xp, w1, b1, w2, b2, w3, b3)

        one = call

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
    return (time.perf_counter() - t0) / iters / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--th", type=int, default=32)
    ap.add_argument("--modes", default="xla,full,norolls,notap,noconv2,"
                                       "dmaonly")
    args = ap.parse_args()
    B = args.batch
    H, W, cin, cm, cout = 200, 336, 256, 64, 256
    print(f"res2 identity block B={B} {H}x{W} {cin}->{cm}->{cout} "
          f"TH={args.th}")
    for mode in args.modes.split(","):
        t = run_variant(mode, B, H, W, cin, cm, cout, args.th)
        print(f"{mode:10s} {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
