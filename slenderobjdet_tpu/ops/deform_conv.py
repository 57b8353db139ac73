"""Deformable convolution (v1/v2) for TPU.

Replaces the CUDA DeformConv/ModulatedDeformConv the reference pulls from
detectron2 (`slender_det/layers/df_conv.py`, `meta_arch/reppoints/rpd.py:16`,
the "feature adaption" of every RepPoints/DCN variant).

TPU-first formulation: the irregular 3x3 sampling becomes a batched bilinear
gather (VPU + fast single-axis gather) producing (H, W, K, Cin) samples, and
the convolution collapses into ONE large matmul (H*W, K*Cin) @ (K*Cin, Cout)
that maps straight onto the MXU — instead of the CUDA kernel's
im2col+gemm-per-group. Out-of-bounds samples contribute zero (torch DCN
boundary semantics).

Offset convention: `offsets[..., k, :] = (dy, dx)` is the ABSOLUTE sampling
displacement of kernel point k from the output pixel (kernel base included).
Callers porting torch semantics pass `torch_offset + kernel_base`; RepPoints
passes its predicted points directly (its dcn_offset = points - base followed
by the kernel's + base is a no-op chain, rpd.py:624-640).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# SLENDER_PAIR_GATHER=1 routes deform_sample_batched through the pair-TABLE
# gather (2 rows of 2C from a doubled table). Measured LOSS on-chip (0.78-
# 0.91x, VALIDATION.md round-3): kept only as the record of the experiment.
_PAIR_GATHER = os.environ.get("SLENDER_PAIR_GATHER", "0") == "1"
# SLENDER_PAIRSLICE_GATHER=1 routes deform_sample_batched through the
# pair-SLICE gather (2 dynamic-slice reads of (2, C) CONSECUTIVE rows of the
# original table — no table build, half the descriptors of the 4-tap path).
_PAIRSLICE_GATHER = os.environ.get("SLENDER_PAIRSLICE_GATHER", "0") == "1"
# SLENDER_DEFORM_AUTODIFF_VJP=1 restores plain autodiff through the gather
# (the A/B "before" side of the custom VJP below).
_AUTODIFF_VJP = os.environ.get("SLENDER_DEFORM_AUTODIFF_VJP", "0") == "1"


def kernel_base_offsets(kernel_size: int = 3) -> np.ndarray:
    """(K, 2) (dy, dx) grid of a centered kernel, matching the reference's
    dcn_base_offset construction (rpd.py:105-110)."""
    pad = (kernel_size - 1) // 2
    base = np.arange(-pad, pad + 1, dtype=np.float32)
    dy = np.repeat(base, kernel_size)
    dx = np.tile(base, kernel_size)
    return np.stack([dy, dx], axis=1)


def _gather_bilinear_zeropad_batched(feat: jnp.ndarray, ys: jnp.ndarray,
                                     xs: jnp.ndarray):
    """Bilinear gather with a custom VJP (see _gather_impl for the forward
    formulation and the round-3 A/B record).

    Why a custom VJP (VERDICT r3 #3b): under plain autodiff JAX saves the
    FOUR weighted tap tensors (B, ..., C) as residuals for the backward —
    at RepPoints production shapes (8, 100, 168, 9, 512) that is 4 x 2.05
    GB live across the whole train step, which OOMed the B=8 train bench
    (18.2 G > 15.75 G HBM). The custom backward saves only (feat, ys, xs)
    and RECOMPUTES the taps:

    - d(ys)/d(xs): one extra 4-tap gather (same bytes as forward) and the
      exact finite bilinear derivative, accumulated over C in fp32
      (autodiff's bf16 products fp32-summed match to rounding).
    - d(feat): the gather transpose — 4 scatter-adds of w_tap * g into the
      flat (B*H*W, C) table, exactly the scatter XLA's transpose emits, so
      gradients are bit-comparable while the residual memory is gone.
    """
    if _AUTODIFF_VJP:
        return _gather_impl(feat, ys, xs)
    return _gather_core(feat, ys, xs)


def _gather_impl(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """feat (B, H, W, C); ys/xs (B, ...) -> (B, ..., C); zero outside.

    TPU formulation (round-3 A/B measurements on the chip, VALIDATION.md):
    the batch is folded into ONE flat (B*H*W, C) table with image-offset
    row indices and the 4 bilinear corners are 4 narrow gathers from it.
    Two alternatives were built and measured end-to-end on the DCN access
    pattern (B=8, 100x168, K=9):
    - a vmapped per-image gather (lowers to a batched gather): parity at
      C=256 — the flat fold is kept because it also composes with any
      leading batch dims without a vmap;
    - a QUAD-table variant (one 4C-wide row per tap from a precomputed
      4-corner table, motivated by a rows/s microbenchmark): parity at
      C=256 end-to-end (61 vs 62 ms) and OOMs at C=512 — the (B,H,W,K,4C)
      gathered tensor materializes at 8.2 GB after (K,4C) tile padding.
      The microbenchmark's width-invariant row rate does not transfer:
      the end-to-end op is bound by total gathered bytes, and the quad
      rows quadruple them.

    Boundary semantics match torch DCN exactly: fully/partially-outside
    taps blend against zeros (clip + inside-mask folded into the weights).

    The gather runs in feat's OWN dtype (bf16 halves the traffic) and the
    interpolation weights are applied in that dtype too — the following MXU
    matmul accumulates in fp32.

    Layout: ALL intermediate math is flat (N, C) with N = B*prod(sample
    dims) — a (B, H, W, K, C) intermediate with K=9 second-minor pads
    9 -> 16 sublanes (1.8x memory) under the TPU tiled layout, and the four
    tap temps at RepPoints B=8 production shapes cost 4 x 2.05 GB padded vs
    4 x 1.15 GB flat (the difference OOMed the train step). Only the
    returned tensor takes the caller's shape."""
    b, h, w, c = feat.shape
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    one = jnp.ones((), feat.dtype)
    ly = (ys - y0f).reshape(-1, 1).astype(feat.dtype)
    lx = (xs - x0f).reshape(-1, 1).astype(feat.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    flat = feat.reshape(b * h * w, c)
    img_off = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (y0.ndim - 1)) * (h * w)

    def tap(yi, xi, wgt):
        inside = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                  ).reshape(-1, 1).astype(feat.dtype)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
               + img_off)
        vals = jnp.take(flat, idx.reshape(-1), axis=0)       # (N, C)
        return vals * (wgt * inside)

    out = (
        tap(y0, x0, (one - ly) * (one - lx))
        + tap(y0, x0 + 1, (one - ly) * lx)
        + tap(y0 + 1, x0, ly * (one - lx))
        + tap(y0 + 1, x0 + 1, ly * lx)
    )
    return out.reshape(*ys.shape, c)


@jax.custom_vjp
def _gather_core(feat, ys, xs):
    return _gather_impl(feat, ys, xs)


def _gather_fwd(feat, ys, xs):
    return _gather_impl(feat, ys, xs), (feat, ys, xs)


def _gather_bwd(res, g):
    # flat (N, C) math throughout — see _gather_impl's layout note
    feat, ys, xs = res
    b, h, w, c = feat.shape
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    one = jnp.ones((), feat.dtype)
    ly = (ys - y0f).reshape(-1, 1).astype(feat.dtype)
    lx = (xs - x0f).reshape(-1, 1).astype(feat.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    flat = feat.reshape(b * h * w, c)
    img_off = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (y0.ndim - 1)) * (h * w)

    def tap(yi, xi):
        inside = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                  ).reshape(-1, 1).astype(feat.dtype)
        idx = ((jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
                + img_off)).reshape(-1)
        vals = jnp.take(flat, idx, axis=0)                   # (N, C)
        return vals * inside, idx, inside

    u00, i00, m00 = tap(y0, x0)
    u01, i01, m01 = tap(y0, x0 + 1)
    u10, i10, m10 = tap(y0 + 1, x0)
    u11, i11, m11 = tap(y0 + 1, x0 + 1)

    # offset grads: exact bilinear derivative, fp32 accumulation over C
    # (u terms already carry the zero-outside mask)
    g32 = g.reshape(-1, c).astype(jnp.float32)
    dys = jnp.sum(
        g32 * ((u10 - u00) * (one - lx) + (u11 - u01) * lx
               ).astype(jnp.float32), axis=-1).reshape(ys.shape
                                                       ).astype(ys.dtype)
    dxs = jnp.sum(
        g32 * ((u01 - u00) * (one - ly) + (u11 - u10) * ly
               ).astype(jnp.float32), axis=-1).reshape(xs.shape
                                                       ).astype(xs.dtype)

    # feature grad: the gather transpose — 4 scatter-adds of w_tap * g.
    # Outside taps have w_tap == 0 (inside mask folded into the weights),
    # so adding their zero update at the clipped row is harmless. The
    # scatter runs in feat's OWN dtype — exactly what autodiff's transpose
    # emits (dfeat is cast to feat.dtype on return regardless); in bf16 it
    # also halves the update transients vs an fp32 accumulator.
    gp = g.reshape(-1, c).astype(feat.dtype)
    dflat = jnp.zeros((b * h * w, c), feat.dtype)
    for wgt, idx in (((one - ly) * (one - lx) * m00, i00),
                     ((one - ly) * lx * m01, i01),
                     (ly * (one - lx) * m10, i10),
                     (ly * lx * m11, i11)):
        dflat = dflat.at[idx].add(gp * wgt)
    dfeat = dflat.reshape(b, h, w, c)
    return dfeat, dys, dxs


_gather_core.defvjp(_gather_fwd, _gather_bwd)


def _gather_bilinear_pair_batched(feat: jnp.ndarray, ys: jnp.ndarray,
                                  xs: jnp.ndarray):
    """Same contract and boundary semantics as
    _gather_bilinear_zeropad_batched, gathering TWO 2C-wide pair rows per
    sample instead of FOUR C-wide tap rows.

    Round-3 on-chip finding: the XLA gather's effective byte rate rises
    with row width (the quad-table A/B reached parity despite 1.78x more
    bytes, i.e. 2 KB rows stream ~1.8x faster than 512 B rows), so halving
    the row count at EQUAL useful bytes is a straight win. The pair table
    over x' = x0+1 in [0, w] stores row x' = [feat[:, x'-1] | feat[:, x']]
    (zero column at both ends) — exactly the two horizontal taps a bilinear
    sample needs, with no wasted bytes and no sublane padding (the gathered
    tensor keeps 2C on the lane axis). Horizontal validity is folded into
    the lerp weights; vertical taps keep the clip + inside-mask scheme of
    the 4-tap path. Unlike the quad table (4x feature memory, OOM at
    C=512), the pair table is only 2x the feature bytes."""
    b, h, w, c = feat.shape
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    ly = (ys - y0f)[..., None].astype(feat.dtype)
    lx = (xs - x0f)[..., None].astype(feat.dtype)
    one = jnp.ones((), feat.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    zcol = jnp.zeros((b, h, 1, c), feat.dtype)
    left = jnp.concatenate([zcol, feat], axis=2)       # x' - 1 half
    right = jnp.concatenate([feat, zcol], axis=2)      # x'     half
    flat = jnp.concatenate([left, right], axis=-1).reshape(
        b * h * (w + 1), 2 * c)

    img_off = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (y0.ndim - 1)) * (h * (w + 1))
    xp = jnp.clip(x0 + 1, 0, w)
    in_x0 = ((x0 >= 0) & (x0 < w))[..., None].astype(feat.dtype)
    in_x1 = ((x0 + 1 >= 0) & (x0 + 1 < w))[..., None].astype(feat.dtype)
    wx0 = (one - lx) * in_x0
    wx1 = lx * in_x1

    def pair_row(yi, wy):
        inside_y = ((yi >= 0) & (yi < h))[..., None].astype(feat.dtype)
        idx = jnp.clip(yi, 0, h - 1) * (w + 1) + xp + img_off
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            *idx.shape, 2 * c)
        return (vals[..., :c] * wx0 + vals[..., c:] * wx1) * (wy * inside_y)

    return pair_row(y0, one - ly) + pair_row(y0 + 1, ly)


def _gather_bilinear_pairslice_batched(feat: jnp.ndarray, ys: jnp.ndarray,
                                       xs: jnp.ndarray):
    """Same contract and boundary semantics as
    _gather_bilinear_zeropad_batched, fetching the two horizontal taps of
    each sample as ONE (2, C) dynamic-slice of CONSECUTIVE rows of the
    original flat table.

    Unlike the pair-TABLE variant above (which lost on-chip: its doubled
    table costs a (B,H,W+1,2C) concat and its rows alias the cache lines the
    4-tap path already exploits), this builds NO table: taps (y, x) and
    (y, x+1) are adjacent rows of feat.reshape(B*H*W, C), so a 2-row slice
    fetches both with one descriptor — half the gather descriptors and half
    the fetched bytes (assuming a >= 2-row HBM read granule) at identical
    memory cost. Measured 1.32x on the RoIAlign pattern at C=256
    (tools/roi_gather_probe.py).

    The pair start xp = clip(x0, 0, W-2) never crosses a feature row; which
    pair column carries which tap (and the zero-outside semantics) is folded
    into the two column weights via exact index-match indicators."""
    b, h, w, c = feat.shape
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    ly = (ys - y0f)[..., None].astype(feat.dtype)
    lx = (xs - x0f)[..., None].astype(feat.dtype)
    one = jnp.ones((), feat.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    flat = feat.reshape(b * h * w, c)
    img_off = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (y0.ndim - 1)) * (h * w)

    xp = jnp.clip(x0, 0, w - 2)
    # pair column j holds feature column xp+j; tap x0 weighs (1-lx), tap
    # x0+1 weighs lx; a tap outside [0, w) matches no pair column -> 0
    def colw(j):
        return ((one - lx) * ((x0 == xp + j)[..., None]).astype(feat.dtype)
                + lx * ((x0 + 1 == xp + j)[..., None]).astype(feat.dtype))

    w0 = colw(0)
    w1 = colw(1)

    def pair_row(yi, wy):
        inside_y = ((yi >= 0) & (yi < h))[..., None].astype(feat.dtype)
        idx = img_off + jnp.clip(yi, 0, h - 1) * w + xp

        def g2(i):
            return jax.lax.dynamic_slice(flat, (i, 0), (2, c))

        pairs = jax.vmap(g2)(idx.reshape(-1)).reshape(*idx.shape, 2, c)
        v = pairs[..., 0, :] * w0 + pairs[..., 1, :] * w1
        return v * (wy * inside_y)

    return pair_row(y0, one - ly) + pair_row(y0 + 1, ly)


def _gather_bilinear_zeropad(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Single-image wrapper of the batched flat gather (see above)."""
    return _gather_bilinear_zeropad_batched(
        feat[None], ys[None], xs[None])[0]


def deform_conv2d(
    x: jnp.ndarray,                  # (H, W, Cin)
    offsets: jnp.ndarray,            # (H, W, K, 2) absolute (dy, dx)
    weight: jnp.ndarray,             # (K, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,   # (H, W, K) modulation (v2)
) -> jnp.ndarray:
    """Single-image deformable conv; vmap for batches. -> (H, W, Cout)."""
    h, w, cin = x.shape
    k = offsets.shape[2]

    yy = jnp.arange(h, dtype=offsets.dtype)[:, None, None] + offsets[..., 0]
    xx = jnp.arange(w, dtype=offsets.dtype)[None, :, None] + offsets[..., 1]

    samples = _gather_bilinear_zeropad(x, yy, xx)        # (H, W, K, Cin)
    if mask is not None:
        samples = samples * mask[..., None].astype(samples.dtype)

    out = jax.lax.dot_general(
        samples.reshape(h * w, k * cin),
        weight.reshape(k * cin, -1).astype(samples.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(h, w, -1)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d_batched(x, offsets, weight, bias=None, mask=None):
    """(B, H, W, Cin) variant — single flat gather over the whole batch
    (NOT a vmap of the per-image op; see _gather_bilinear_zeropad_batched)."""
    b, h, w, cin = x.shape
    k = offsets.shape[3]
    yy = jnp.arange(h, dtype=offsets.dtype)[None, :, None, None] \
        + offsets[..., 0]
    xx = jnp.arange(w, dtype=offsets.dtype)[None, None, :, None] \
        + offsets[..., 1]
    samples = _gather_bilinear_zeropad_batched(x, yy, xx)  # (B, H, W, K, C)
    if mask is not None:
        samples = samples * mask[..., None].astype(samples.dtype)
    out = jax.lax.dot_general(
        samples.reshape(b * h * w, k * cin),
        weight.reshape(k * cin, -1).astype(samples.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, h, w, -1)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_sample(x: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling only: (H, W, Cin) x (H, W, K, 2) -> (H, W, K, Cin).

    Lets callers that apply several deformable convs AT THE SAME OFFSETS
    (e.g. RepPoints' deform_cls/deform_reg pair, rpd.py:641-645) gather ONCE
    from the channel-concatenated features: the gather is the
    bandwidth-bound part, and wider rows gather faster on TPU."""
    h, w, _ = x.shape
    yy = jnp.arange(h, dtype=offsets.dtype)[:, None, None] + offsets[..., 0]
    xx = jnp.arange(w, dtype=offsets.dtype)[None, :, None] + offsets[..., 1]
    return _gather_bilinear_zeropad(x, yy, xx)


def deform_sample_batched(x, offsets):
    b, h, w, _ = x.shape
    yy = jnp.arange(h, dtype=offsets.dtype)[None, :, None, None] \
        + offsets[..., 0]
    xx = jnp.arange(w, dtype=offsets.dtype)[None, None, :, None] \
        + offsets[..., 1]
    if _PAIR_GATHER:
        return _gather_bilinear_pair_batched(x, yy, xx)
    if _PAIRSLICE_GATHER:
        return _gather_bilinear_pairslice_batched(x, yy, xx)
    return _gather_bilinear_zeropad_batched(x, yy, xx)


def deform_apply(samples: jnp.ndarray, weight: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None,
                 out_dtype=None) -> jnp.ndarray:
    """(B, H, W, K, Cin) samples x (K, Cin, Cout) -> (B, H, W, Cout): the MXU
    half of the deformable conv (fp32 accumulation)."""
    b, h, w, k, cin = samples.shape
    out = jax.lax.dot_general(
        samples.reshape(b * h * w, k * cin),
        weight.reshape(k * cin, -1).astype(samples.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, h, w, -1)
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype or samples.dtype)
