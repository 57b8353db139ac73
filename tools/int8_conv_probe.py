"""On-chip A/B: does XLA hit the v5e int8 MXU path (2x bf16 peak) for the
conv shapes FCOS inference actually runs?

Three variants per shape, serialized in-graph (lax.scan) to amortize the
axon-tunnel dispatch overhead (same protocol as tools/gather_probe.py):

  bf16   — conv_general_dilated on bf16 activations x bf16 weights
           (today's TPU.COMPUTE_DTYPE path)
  s8     — s8 x s8 -> s32 conv via preferred_element_type (pre-quantized
           activations: the raw MXU ceiling for int8)
  s8+dq  — bf16 activations dynamically quantized in-graph (per-tensor
           max-abs), s8 conv, per-channel rescale back to bf16: the
           realistic per-layer cost of a calibration-free int8 predict path
  s8+st  — bf16 activations quantized with a STATIC scalar scale (the
           calibrated-PTQ path): no cross-tensor max reduction, the
           quantize pass is elementwise and fusible; measures whether the
           1x1 convs that lose under dynamic quantize win once calibrated

Shapes cover the FCOS R-50 hotspots at 800x1344 (head towers dominate the
forward FLOPs; see VALIDATION.md round-2 staged profile):
  head P3   3x3 256->256 @ 100x168   (the single biggest FLOPs line)
  res3 3x3  3x3 128->128 @ 100x168
  res4 3x3  3x3 256->256 @ 50x84
  res4 1x1  1x1 256->1024 @ 50x84
  res5 3x3  3x3 512->512 @ 25x42

Usage: python tools/int8_conv_probe.py [--batch 8] [--reps 200]

NOTE: reps must be large — each jit dispatch through the axon tunnel costs
~20-25 ms of host enqueue that does NOT overlap device compute, so ms/call
readings carry a +overhead/reps bias (at reps=10 that is a ~2.5 ms floor
that drowned every sub-ms conv in the first run of this probe).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def conv(x, w, pet=None):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
        preferred_element_type=pet)


def timed(fn, args_, reps, iters=3):
    def program(z):
        def body(carry, _):
            out = fn(carry, *args_)
            # Full-tensor reduction: consuming only out[..., :1] lets XLA
            # narrow the conv to ONE output channel (first run of this probe
            # read 296 "TFLOPs" bf16 — above the 197 peak — a DCE artifact).
            # The extra output read (<0.1 ms) biases both sides equally.
            return jnp.sum(out.astype(jnp.float32)) * 1e-30, ()

        carry, _ = lax.scan(body, z, None, length=reps)
        return carry

    f = jax.jit(program)
    z = jnp.zeros((), jnp.float32)
    float(f(z))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(z))
    return (time.perf_counter() - t0) / iters / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()
    B, reps = args.batch, args.reps

    shapes = [
        ("head_p3 3x3 256->256 @100x168", (B, 100, 168, 256), (3, 3, 256, 256)),
        ("res3    3x3 128->128 @100x168", (B, 100, 168, 128), (3, 3, 128, 128)),
        ("res4    3x3 256->256 @ 50x84", (B, 50, 84, 256), (3, 3, 256, 256)),
        ("res4    1x1 256->1024 @ 50x84", (B, 50, 84, 256), (1, 1, 256, 1024)),
        ("res5    3x3 512->512 @ 25x42", (B, 25, 42, 512), (3, 3, 512, 512)),
        # 1x1 bottleneck/lateral shapes: dynamic quantize LOSES here
        # (0.67x, round-4 probe) because the per-tensor max-abs reduction
        # costs more than int8 saves; the s8+st column measures the static
        # (calibrated scalar scale) alternative that removes the reduction.
        ("res3    1x1 512->128 @100x168", (B, 100, 168, 512), (1, 1, 512, 128)),
        ("res3    1x1 128->512 @100x168", (B, 100, 168, 128), (1, 1, 128, 512)),
        ("res4    1x1 1024->256 @ 50x84", (B, 50, 84, 1024), (1, 1, 1024, 256)),
        ("res2    3x3  64->64 @200x336", (B, 200, 336, 64), (3, 3, 64, 64)),
        ("fpn_lat 1x1 2048->256 @ 25x42", (B, 25, 42, 2048), (1, 1, 2048, 256)),
    ]

    r = np.random.RandomState(0)
    print(f"B={B} reps={reps}  (ms/call; tflops = 2*flops/time)")
    print(f"{'shape':34s} {'bf16':>8s} {'s8':>8s} {'s8+dq':>8s} "
          f"{'s8+st':>8s} "
          f"{'s8/bf16':>8s} {'dq/bf16':>8s} {'st/bf16':>8s}  "
          f"tflops(bf16/s8)")
    for name, xs, ws in shapes:
        x = jnp.asarray(r.randn(*xs), jnp.bfloat16)
        w = jnp.asarray(r.randn(*ws) * 0.05, jnp.bfloat16)
        xq = jnp.asarray(r.randint(-127, 127, xs), jnp.int8)
        wq = jnp.asarray(r.randint(-127, 127, ws), jnp.int8)
        wscale = jnp.asarray(np.abs(r.randn(ws[-1])) * 0.01 + 1e-3,
                             jnp.float32)

        def f_bf16(carry, x, w):
            return conv(x + carry.astype(x.dtype), w)

        def f_s8(carry, xq, wq):
            # carry folded in via a cheap int add so scan has a dependency
            xi = (xq + carry.astype(jnp.int8)).astype(jnp.int8)
            return conv(xi, wq, pet=jnp.int32)

        def f_s8dq(carry, x, wq, wscale):
            xf = x + carry.astype(x.dtype)
            s = jnp.max(jnp.abs(xf.astype(jnp.float32))) / 127.0 + 1e-12
            xi = jnp.clip(jnp.round(xf.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            acc = conv(xi, wq, pet=jnp.int32)
            return (acc.astype(jnp.float32) * (s * wscale)).astype(
                jnp.bfloat16)

        def f_s8st(carry, x, wq, wscale):
            # static calibrated scalar scale: quantize is pure elementwise
            # (no cross-tensor max reduction), fusible into the producer
            xf = x + carry.astype(x.dtype)
            s = jnp.float32(4.0 / 127.0)
            xi = jnp.clip(jnp.round(xf.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            acc = conv(xi, wq, pet=jnp.int32)
            return (acc.astype(jnp.float32) * (s * wscale)).astype(
                jnp.bfloat16)

        t_bf = timed(f_bf16, (x, w), reps)
        t_s8 = timed(f_s8, (xq, wq), reps)
        t_dq = timed(f_s8dq, (x, wq, wscale), reps)
        t_st = timed(f_s8st, (x, wq, wscale), reps)
        flops = 2 * np.prod(xs[:3]) * np.prod(ws[:3]) * ws[3]
        print(f"{name:34s} {t_bf*1e3:8.3f} {t_s8*1e3:8.3f} {t_dq*1e3:8.3f} "
              f"{t_st*1e3:8.3f} "
              f"{t_bf/t_s8:8.2f} {t_bf/t_dq:8.2f} {t_bf/t_st:8.2f}  "
              f"{flops/t_bf/1e12:.1f}/{flops/t_s8/1e12:.1f}")


if __name__ == "__main__":
    main()
