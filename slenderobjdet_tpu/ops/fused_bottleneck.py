"""Fused ResNet bottleneck block as a single Pallas TPU kernel.

Motivation (round-3 per-stage profile, VALIDATION.md): res2/res3 of the
flagship R-50 are HBM-bandwidth-bound — XLA executes conv1/conv2/conv3 as
three separate convolutions, each round-tripping the full activation through
HBM (res2 moves ~20 GB per batch-32 forward and runs at 38 TFLOPS against a
~45 TFLOPS bandwidth roofline). This kernel keeps the whole block resident
in VMEM: each grid step DMAs one row-tile of the input (with a 1-row halo),
runs 1x1 -> relu -> 3x3 -> relu -> 1x1 (+shortcut) -> relu on-chip, and
writes only the final output tile. Per block the HBM traffic drops from
~6 activation round-trips to read-input + write-output.

Counterpart of the reference's torchvision-style bottleneck execution
(detectron2 ResNet used by slender_det configs; see
slender_det/configs MODEL.RESNETS) — the fusion itself has no reference
counterpart (CUDA/cuDNN fuses per-conv epilogues only).

Design notes:
- FrozenBN is pre-folded by the caller into per-conv (weight-scale, bias)
  pairs, so the kernel sees plain conv+bias.
- The 3x3 conv is 9 accumulated (TH, W, Cm) x (Cm, Cm) `dot_general`s over
  shifted views of the conv1 output held in a (TH+2, W+2, Cm) VMEM buffer
  (1-pixel zero ring = the conv's zero padding; tile halo rows are REAL
  rows, the zero ring only survives at image borders via the row mask).
- conv3 (+ projection shortcut) is chunked over output channels so the
  fp32 accumulator stays ~2-3 MB regardless of Cout.
- Input rows are zero-padded by the caller so every tile's halo DMA has a
  static, in-bounds shape; conv1's output on pad rows is masked to zero
  (conv+bias on a zero row is bias, not zero).
- Gradients: `jax.custom_vjp` whose backward differentiates the plain-XLA
  composition (recompute); the kernel is used for the forward only.
- Stride-1, groups=1, dilation=1, non-deform blocks only; everything else
  keeps the XLA path (see models/backbones/resnet.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------- kernel


def _make_kernel(H: int, TH: int, W: int, cin: int, cm: int, cout: int,
                 proj: bool, cchunk: int):
    """Kernel factory; all shape/shortcut decisions are static."""

    def kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               *rest):
        if proj:
            wsc_ref, bsc_ref, out_ref, xbuf, sem = rest
        else:
            out_ref, xbuf, sem = rest
        i = pl.program_id(1)

        # ---- halo DMA: rows [i*TH, i*TH + TH + 2) of the row-padded input
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(i * TH, TH + 2)], xbuf, sem
        )
        dma.start()
        dma.wait()

        x = xbuf[:]                                       # (TH+2, W, Cin)

        # ---- conv1 (1x1) + bias + relu, masked to real image rows.
        # Padded-x row r corresponds to image row g = i*TH + r - 1.
        g = (jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W, 1), 0)
             + i * TH - 1)
        valid = (g >= 0) & (g < H)
        a1f = lax.dot_general(
            x, w1_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:][None].astype(jnp.float32)
        a1f = jnp.where(valid, jnp.maximum(a1f, 0.0), 0.0)

        # ---- 3x3 conv as 9 matmuls over column-shifted a1 variants.
        # Column shifts use pltpu.roll (cheap sublane shuffle) with the
        # wrapped edge column zeroed — NOT unaligned sublane slices of a
        # zero-ringed buffer, which Mosaic lowers to a full relayout copy
        # per tap. Rolls happen on the fp32 conv1 output (Mosaic's rotate
        # supports only 32-bit data), then cast to the compute dtype. Row
        # shifts are leading-dim slices (free).
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        zero = jnp.zeros((), jnp.float32)
        a1 = a1f.astype(x.dtype)
        a1_l = jnp.where(col > 0, pltpu.roll(a1f, 1, axis=1),
                         zero).astype(x.dtype)
        a1_r = jnp.where(col < W - 1, pltpu.roll(a1f, W - 1, axis=1),
                         zero).astype(x.dtype)
        variants = (a1_l, a1, a1_r)     # kx = 0, 1, 2 (reads col j-1+kx)

        acc = None
        for ky in range(3):
            for kx in range(3):
                term = lax.dot_general(
                    variants[kx][ky:ky + TH], w2_ref[3 * ky + kx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = term if acc is None else acc + term
        a2 = jnp.maximum(acc + b2_ref[:][None].astype(jnp.float32),
                         0.0).astype(x.dtype)             # (TH, W, Cm)

        # ---- conv3 (+ shortcut) + relu, chunked over output channels
        xc = xbuf[1:TH + 1]                               # center rows
        for c0 in range(0, cout, cchunk):
            t = lax.dot_general(
                a2, w3_ref[:, c0:c0 + cchunk],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b3_ref[:, c0:c0 + cchunk][None].astype(jnp.float32)
            if proj:
                t += lax.dot_general(
                    xc, wsc_ref[:, c0:c0 + cchunk],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bsc_ref[:, c0:c0 + cchunk][None].astype(jnp.float32)
            else:
                t += xc[:, :, c0:c0 + cchunk].astype(jnp.float32)
            out_ref[0, :, :, c0:c0 + cchunk] = jnp.maximum(t, 0.0).astype(
                x.dtype)

    return kernel


_VMEM_LIMIT = 96 * 1024 * 1024   # v5e has 128 MiB VMEM; leave headroom
_VMEM_BUDGET = 64 * 1024 * 1024  # target working set for tile sizing


def _vmem_estimate(TH: int, W: int, cin: int, cm: int, cout: int,
                   cchunk: int) -> int:
    """Rough VMEM working set of one grid step (see kernel buffers)."""
    out2 = 2 * TH * W * cout * 2          # double-buffered output block
    xb = (TH + 2) * W * cin * 2           # halo tile
    a1v = 3 * (TH + 2) * W * cm * 2       # a1 + two column-shifted variants
    a1f = (TH + 2) * W * cm * 4           # fp32 conv1 temp before mask/cast
    acc = TH * W * cm * 4                 # 3x3 accumulator
    tch = 2 * TH * W * cchunk * 4         # conv3 chunk (+shortcut) fp32
    return out2 + xb + a1v + a1f + acc + tch


def _pick_th(H: int, W: int, cin: int, cm: int, cout: int,
             cchunk: int) -> int:
    for th in (32, 16, 8, 4, 2):
        if H >= th and _vmem_estimate(th, W, cin, cm, cout,
                                      cchunk) <= _VMEM_BUDGET:
            return th
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_forward(x, w1, b1, w2, b2, w3, b3, wsc, bsc, interpret=False):
    B, H, W, cin = x.shape
    cm = w1.shape[1]
    cout = w3.shape[1]
    proj = wsc is not None
    if W % 8 != 0:
        # Mosaic HBM slices must be 8-aligned on the sublane dim; stages
        # with unaligned W (res4/res5 at 800x1344: W=84/42) stay on the XLA
        # composition — they run near the conv compute ceiling anyway
        # (the fusion targets the bandwidth-bound res2/res3).
        return reference_bottleneck(x, w1, b1, w2, b2, w3, b3, wsc, bsc)
    cchunk = min(cout, 128)
    TH = _pick_th(H, W, max(cin, 128), cm, cout, cchunk)
    nH = _cdiv(H, TH)
    # Mosaic requires HBM slices to be 128-aligned on the lane (minor) dim:
    # lane-pad Cin < 128 with zeros (and w1/wsc rows to match) — only the
    # stem-fed first res2 block (Cin=64) pays this, and zeros contribute
    # nothing to the matmuls.
    if cin < 128:
        pad_c = 128 - cin
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        w1 = jnp.pad(w1, ((0, pad_c), (0, 0)))
        if proj:
            wsc = jnp.pad(wsc, ((0, pad_c), (0, 0)))
        cin = 128
    # row padding: 1 halo row on top, halo + ragged-tile rows at the bottom
    xp = jnp.pad(x, ((0, 0), (1, nH * TH - H + 1), (0, 0), (0, 0)))

    kernel = _make_kernel(H, TH, W, cin, cm, cout, proj, cchunk)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),             # xp stays in HBM
        vspec(), vspec(),                                 # w1, b1
        vspec(), vspec(),                                 # w2, b2
        vspec(), vspec(),                                 # w3, b3
    ]
    args = [xp, w1, b1.reshape(1, -1), w2.reshape(9, cm, cm),
            b2.reshape(1, -1), w3, b3.reshape(1, -1)]
    if proj:
        in_specs += [vspec(), vspec()]
        args += [wsc, bsc.reshape(1, -1)]

    flops_blk = 2 * H * W * (cin * cm + 9 * cm * cm + cm * cout
                             + (cin * cout if proj else 0))
    out = pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, TH, W, cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W, cin), x.dtype),        # halo tile
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * flops_blk,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    return out


def reference_bottleneck(x, w1, b1, w2, b2, w3, b3, wsc=None, bsc=None):
    """Plain-XLA composition with identical semantics (oracle + backward)."""
    dn = lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO",
                                                            "NHWC"))

    def conv(v, w, pad):
        return lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    a1 = jnp.maximum(conv(x, w1[None, None], "VALID") + b1, 0.0).astype(
        x.dtype)
    a2 = jnp.maximum(conv(a1, w2, "SAME") + b2, 0.0).astype(x.dtype)
    t = conv(a2, w3[None, None], "VALID") + b3
    if wsc is None:
        sc = x.astype(jnp.float32)
    else:
        sc = conv(x, wsc[None, None], "VALID") + bsc
    return jnp.maximum(t + sc, 0.0).astype(x.dtype)


# ------------------------------------------------------------------ public op


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wsc, bsc):
    """Fused bottleneck forward: relu(conv3(relu(conv2(relu(conv1(x))))) + sc).

    All weights pre-folded (FrozenBN absorbed); wsc/bsc may be None for the
    identity shortcut (then Cin == Cout). Backward differentiates the XLA
    composition (see module docstring)."""
    interpret = jax.default_backend() == "cpu"
    return _fused_forward(x, w1, b1, w2, b2, w3, b3, wsc, bsc,
                          interpret=interpret)


def _fwd(x, w1, b1, w2, b2, w3, b3, wsc, bsc):
    out = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wsc, bsc)
    return out, (x, w1, b1, w2, b2, w3, b3, wsc, bsc)


def _bwd(res, g):
    x, w1, b1, w2, b2, w3, b3, wsc, bsc = res
    if wsc is None:
        def f(x, w1, b1, w2, b2, w3, b3):
            return reference_bottleneck(x, w1, b1, w2, b2, w3, b3)
        _, vjp = jax.vjp(f, x, w1, b1, w2, b2, w3, b3)
        return vjp(g) + (None, None)
    _, vjp = jax.vjp(reference_bottleneck, x, w1, b1, w2, b2, w3, b3, wsc,
                     bsc)
    return vjp(g)


fused_bottleneck.defvjp(_fwd, _bwd)
