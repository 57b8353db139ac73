"""RoIAlign (V2/aligned semantics) as an XLA gather composition.

Replaces detectron2's CUDA ROIAlign used by the reference's ROI heads
(`slender_det/modeling/roi_heads/roi_heads.py:48-53`, POOLER_TYPE
"ROIAlignV2"). Semantics follow the aligned=True variant: sample coordinates
are computed with the half-pixel offset (coord - 0.5), each output bin
averages `sampling_ratio`^2 bilinear samples (sampling_ratio=2 default per
d2 when cfg POOLER_SAMPLING_RATIO=0 means ceil(roi_size/out_size); we use a
static ratio for fixed shapes).

The gather is expressed as one-hot-free advanced indexing, which XLA lowers
to dynamic-gather; a Pallas kernel with fused bilinear+pool is the planned
upgrade for the hot path (SURVEY.md §2.1).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """feat (H, W, C); ys/xs (...,) -> (..., C) bilinear samples.
    Out-of-range samples clamp to the border (matching RoIAlign's behavior of
    zero gradient outside, adequate for clipped rois)."""
    h, w, _ = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)

    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    wy = ly[..., None]
    wx = lx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def roi_align(
    feat: jnp.ndarray,          # (H, W, C) single level, single image
    rois: jnp.ndarray,          # (N, 4) XYXY in IMAGE coordinates
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_chunk: int = 128,
) -> jnp.ndarray:
    """-> (N, output_size, output_size, C).

    Rois are processed in fixed chunks via lax.map: the bilinear gather
    materializes 4 tap tensors of (chunk, P*S*P*S, C); chunking keeps that
    transient bounded (~100MB) instead of O(N) (512 rois x 4 levels
    concurrently scheduled by XLA blew past HBM at batch 8).

    Backward: custom VJP (below) — the feature gradient is computed as the
    separable MATMUL adjoint einsum(Wy, dPooled, Wx) instead of XLA's
    scatter-add transpose of the gather, which dominated the R-CNN train
    step (~1.8s at 256px; SURVEY §7.3 / VERDICT round-1 weak #5)."""
    core = _roi_align_vjp_factory(spatial_scale, output_size, sampling_ratio,
                                  feat.shape, feat.dtype)
    n = rois.shape[0]
    if n > roi_chunk:
        pad = (-n) % roi_chunk
        padded = jnp.pad(rois, ((0, pad), (0, 0)))
        chunks = padded.reshape((n + pad) // roi_chunk, roi_chunk, 4)
        out = jax.lax.map(lambda r: core(feat, r), chunks)
        out = out.reshape(n + pad, output_size, output_size, feat.shape[-1])
        return out[:n]
    return core(feat, rois)


def _sample_grid(rois, spatial_scale, P, S):
    """(N, P, S) per-axis sample coordinates (aligned=True semantics)."""
    rois = rois * spatial_scale
    x1 = rois[:, 0] - 0.5
    y1 = rois[:, 1] - 0.5
    roi_w = rois[:, 2] - 0.5 - x1
    roi_h = rois[:, 3] - 0.5 - y1
    ps = (jnp.arange(P)[:, None] + (jnp.arange(S)[None, :] + 0.5) / S)
    ys = y1[:, None, None] + ps[None] * (roi_h / P)[:, None, None]
    xs = x1[:, None, None] + ps[None] * (roi_w / P)[:, None, None]
    return ys, xs


def _bin_weight_matrix(coords, size, S):
    """(N, P, S) sample coordinates -> (N, P, size) dense bilinear weights
    per output bin (sample average folded in): W[n, p, i] = (1/S) * sum_s
    bilinear weight of feature index i for sample (n, p, s), with the same
    border clamping as the forward gather."""
    c0 = jnp.floor(coords)
    frac = coords - c0
    i0 = jnp.clip(c0.astype(jnp.int32), 0, size - 1)
    i1 = jnp.clip(i0 + 1, 0, size - 1)
    idx = jnp.arange(size, dtype=jnp.int32)
    w0 = (1.0 - frac)[..., None] * (i0[..., None] == idx)
    w1 = frac[..., None] * (i1[..., None] == idx)
    return (w0 + w1).sum(axis=2) / S            # (N, P, size)


def _roi_align_vjp_factory(spatial_scale, output_size, sampling_ratio,
                           feat_shape, feat_dtype):
    @jax.custom_vjp
    def core(feat, rois):
        return _roi_align_impl(feat, rois, spatial_scale, output_size,
                               sampling_ratio)

    def fwd(feat, rois):
        return core(feat, rois), rois

    def bwd(rois, g):
        H, W, C = feat_shape
        P, S = output_size, sampling_ratio
        ys, xs = _sample_grid(rois, spatial_scale, P, S)
        wy = _bin_weight_matrix(ys, H, S)        # (N, P, H)
        wx = _bin_weight_matrix(xs, W, S)        # (N, P, W)
        # grad_feat[h, w, c] = sum_{n,p,q} wy[n,p,h] g[n,p,q,c] wx[n,q,w]
        # two MXU matmuls. In the bf16 production path the (N, P, W, C)
        # transient is stored in bf16 (fp32 final accumulation); the fp32
        # path stays exact (it is the adjoint of the forward gather).
        mul_dtype = (jnp.bfloat16 if feat_dtype == jnp.bfloat16
                     else jnp.float32)
        t = jnp.einsum("npqc,nqw->npwc", g.astype(mul_dtype),
                       wx.astype(mul_dtype), preferred_element_type=mul_dtype)
        gf = jnp.einsum("nph,npwc->hwc", wy.astype(mul_dtype), t,
                        preferred_element_type=jnp.float32)
        return gf.astype(feat_dtype), jnp.zeros_like(rois)

    core.defvjp(fwd, bwd)
    return core


def _roi_align_impl(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    rois = rois * spatial_scale
    # aligned=True: half-pixel correction
    x1 = rois[:, 0] - 0.5
    y1 = rois[:, 1] - 0.5
    x2 = rois[:, 2] - 0.5
    y2 = rois[:, 3] - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1

    P, S = output_size, sampling_ratio
    bin_h = roi_h / P
    bin_w = roi_w / P

    # sample grid: for bin p and sample s: y1 + (p + (s+0.5)/S) * bin
    ps = (jnp.arange(P)[:, None] + (jnp.arange(S)[None, :] + 0.5) / S)  # (P,S)
    ys = y1[:, None, None] + ps[None] * bin_h[:, None, None]   # (N,P,S)
    xs = x1[:, None, None] + ps[None] * bin_w[:, None, None]

    # full grid (N, P, S, P, S)
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy = jnp.broadcast_to(yy, (rois.shape[0], P, S, P, S))
    xx = jnp.broadcast_to(xx, (rois.shape[0], P, S, P, S))

    samples = _bilinear_gather(feat, yy, xx)       # (N,P,S,P,S,C)
    return samples.mean(axis=(2, 4))               # (N,P,P,C)


def assign_fpn_levels(
    rois: jnp.ndarray, min_level: int, max_level: int,
    canonical_size: float = 224.0, canonical_level: int = 4,
) -> jnp.ndarray:
    """d2 assign_boxes_to_levels: level = floor(k0 + log2(sqrt(area)/224))."""
    areas = jnp.clip((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 1e-6)
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(areas) / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    feats: Sequence[jnp.ndarray],     # list of (H_l, W_l, C), one image
    strides: Sequence[int],
    rois: jnp.ndarray,                # (N, 4) image coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """Pool every roi from its assigned pyramid level. Fixed-shape strategy:
    pool from ALL levels and select per-roi — trades FLOPs for static shape
    (the per-level partitioning of the CUDA pooler is data-dependent).

    This path carries the matmul-adjoint custom VJP (training); inference
    uses `multilevel_roi_align_fused` below, which gathers 4x fewer bytes."""
    min_level = int(np.log2(strides[0]))
    max_level = int(np.log2(strides[-1]))
    levels = assign_fpn_levels(rois, min_level, max_level,
                               canonical_level=canonical_level)

    out = None
    for i, (feat, stride) in enumerate(zip(feats, strides)):
        pooled = roi_align(feat, rois, 1.0 / stride, output_size, sampling_ratio)
        sel = (levels == (min_level + i))[:, None, None, None]
        out = jnp.where(sel, pooled, 0.0) if out is None else out + jnp.where(
            sel, pooled, 0.0
        )
    return out


def multilevel_roi_align_fused(
    feats: Sequence[jnp.ndarray],     # list of (H_l, W_l, C), one image
    strides: Sequence[int],
    rois: jnp.ndarray,                # (N, 4) image coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_level: int = 4,
    roi_chunk: int = 128,
) -> jnp.ndarray:
    """Single-gather multilevel RoIAlign (inference hot path).

    All pyramid levels are flattened row-major into ONE (sum H_l*W_l, C)
    table; each roi's bilinear taps index only its assigned level via
    global row indices (level row-offset + y*W_l + x, y/x clamped to that
    level's bounds). Gathers exactly the bytes the pooled output needs —
    4x less HBM gather traffic than `multilevel_roi_align`'s
    pool-every-level-and-select strategy. Output matches that path up to fp
    reduction order (~1e-6 rel: same taps and weights, but XLA may
    reassociate the bin mean differently across the two programs).

    Forward-only by design: training keeps `multilevel_roi_align`, whose
    custom VJP turns the gather adjoint into two MXU matmuls (the fused
    path would fall back to XLA's scatter-add transpose, the exact thing
    that VJP was built to avoid)."""
    def sample_grid(rois_c, sc_c):
        # aligned=True sample grid at the per-roi scale (same float math as
        # _sample_grid/_roi_align_impl)
        P, S = output_size, sampling_ratio
        r = rois_c * sc_c[:, None]
        x1 = r[:, 0] - 0.5
        y1 = r[:, 1] - 0.5
        roi_w = r[:, 2] - 0.5 - x1
        roi_h = r[:, 3] - 0.5 - y1
        ps = (jnp.arange(P)[:, None] + (jnp.arange(S)[None, :] + 0.5) / S)
        ys = y1[:, None, None] + ps[None] * (roi_h / P)[:, None, None]
        xs = x1[:, None, None] + ps[None] * (roi_w / P)[:, None, None]
        n = rois_c.shape[0]
        yy = jnp.broadcast_to(ys[:, :, :, None, None], (n, P, S, P, S))
        xx = jnp.broadcast_to(xs[:, None, None, :, :], (n, P, S, P, S))
        return yy, xx

    return _fused_multilevel_pool(feats, strides, rois, sample_grid,
                                  output_size, sampling_ratio,
                                  canonical_level, roi_chunk)


def multilevel_roi_align_train(
    feats: Sequence[jnp.ndarray],     # list of (H_l, W_l, C), one image
    strides: Sequence[int],
    rois: jnp.ndarray,                # (N, 4) image coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_level: int = 4,
    roi_chunk: int = 128,
) -> jnp.ndarray:
    """Fused single-gather multilevel RoIAlign for TRAINING.

    Forward: the single-gather flattened-level pooler (same math as
    `multilevel_roi_align_fused` — each roi's taps index only its assigned
    level, ~4x fewer gathered bytes than the pool-every-level-and-select
    path). Backward: custom VJP — per level, the feature gradient is the
    separable MATMUL adjoint einsum(Wy_l, dPooled*mask_l, Wx_l), exactly the
    adjoint the select path computes through `roi_align`'s VJP, so training
    gets the fused forward at identical backward cost (VERDICT r3 next #3a;
    reference trains all R-CNN configs, train_net.py:188-195).

    Wrapping order: custom_vjp INSIDE the roi chunking (per-chunk cores
    under lax.map), mirroring `roi_align`; padded chunk rows receive zero
    cotangent and level-masked weights, so they contribute nothing."""
    P, S = output_size, sampling_ratio
    min_level = int(np.log2(strides[0]))
    max_level = int(np.log2(strides[-1]))
    shapes = [(int(f.shape[0]), int(f.shape[1])) for f in feats]
    C = feats[0].shape[-1]
    feat_dtype = feats[0].dtype
    heights = np.asarray([h for h, _ in shapes], np.int32)
    widths = np.asarray([w for _, w in shapes], np.int32)
    row_off = np.concatenate(
        [[0], np.cumsum(heights.astype(np.int64) * widths)[:-1]]
    ).astype(np.int32)
    inv_scale = np.asarray([1.0 / s for s in strides], np.float32)

    @jax.custom_vjp
    def core(flat, rois_c):
        return _fused_core_fwd(flat, rois_c)

    def _fused_core_fwd(flat, rois_c):
        lvl = assign_fpn_levels(rois_c, min_level, max_level,
                                canonical_level=canonical_level) - min_level
        h_c = jnp.asarray(heights)[lvl]
        w_c = jnp.asarray(widths)[lvl]
        off_c = jnp.asarray(row_off)[lvl]
        sc_c = jnp.asarray(inv_scale)[lvl]

        yy, xx = _fused_sample_grid(rois_c, sc_c, P, S)
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        ly = yy - y0
        lx = xx - x0
        hb = (h_c - 1)[:, None, None, None, None]
        wb = (w_c - 1)[:, None, None, None, None]
        y0 = jnp.clip(y0.astype(jnp.int32), 0, hb)
        x0 = jnp.clip(x0.astype(jnp.int32), 0, wb)
        y1i = jnp.minimum(y0 + 1, hb)

        xp = jnp.clip(x0, 0, jnp.maximum(wb - 1, 0))
        at_border = x0 > xp
        wx = lx[..., None]
        w_left = jnp.where(at_border[..., None], 0.0, 1.0 - wx)
        w_right = jnp.where(at_border[..., None], 1.0, wx)

        base = off_c[:, None, None, None, None]
        wrow = w_c[:, None, None, None, None]
        top_rows = (base + y0 * wrow + xp).reshape(-1)
        bot_rows = (base + y1i * wrow + xp).reshape(-1)

        def g2(i):
            return jax.lax.dynamic_slice(flat, (i, 0), (2, C))

        shp = y0.shape + (2, C)
        top = jax.vmap(g2)(top_rows).reshape(shp)
        bot = jax.vmap(g2)(bot_rows).reshape(shp)
        vt = top[..., 0, :] * w_left + top[..., 1, :] * w_right
        vb = bot[..., 0, :] * w_left + bot[..., 1, :] * w_right
        wy = ly[..., None]
        samples = vt * (1 - wy) + vb * wy
        return samples.mean(axis=(2, 4))                    # (n,P,P,C)

    def fwd(flat, rois_c):
        return _fused_core_fwd(flat, rois_c), rois_c

    def bwd(rois_c, g):
        lvl = assign_fpn_levels(rois_c, min_level, max_level,
                                canonical_level=canonical_level) - min_level
        mul_dtype = (jnp.bfloat16 if feat_dtype == jnp.bfloat16
                     else jnp.float32)
        grads = []
        for l, ((H, W), stride) in enumerate(zip(shapes, strides)):
            mask = (lvl == l).astype(mul_dtype)
            ys, xs = _sample_grid(rois_c, 1.0 / stride, P, S)
            wy = _bin_weight_matrix(ys, H, S) * mask[:, None, None]
            wx = _bin_weight_matrix(xs, W, S)
            t = jnp.einsum("npqc,nqw->npwc", g.astype(mul_dtype),
                           wx.astype(mul_dtype),
                           preferred_element_type=mul_dtype)
            gf = jnp.einsum("nph,npwc->hwc", wy.astype(mul_dtype), t,
                            preferred_element_type=jnp.float32)
            grads.append(gf.reshape(H * W, C))
        return (jnp.concatenate(grads, axis=0).astype(feat_dtype),
                jnp.zeros_like(rois_c))

    core.defvjp(fwd, bwd)

    flat = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)
    n = rois.shape[0]
    if n > roi_chunk:
        pad = (-n) % roi_chunk
        m = (n + pad) // roi_chunk
        chunks = jnp.pad(rois, ((0, pad), (0, 0))).reshape(m, roi_chunk, 4)
        out = jax.lax.map(lambda r: core(flat, r), chunks)
        return out.reshape(n + pad, P, P, C)[:n]
    return core(flat, rois)


def _fused_sample_grid(rois_c, sc_c, P, S):
    """aligned=True sample grid at the per-roi (assigned-level) scale; same
    float math as `_sample_grid`, broadcast to the full (n,P,S,P,S) grid."""
    r = rois_c * sc_c[:, None]
    x1 = r[:, 0] - 0.5
    y1 = r[:, 1] - 0.5
    roi_w = r[:, 2] - 0.5 - x1
    roi_h = r[:, 3] - 0.5 - y1
    ps = (jnp.arange(P)[:, None] + (jnp.arange(S)[None, :] + 0.5) / S)
    ys = y1[:, None, None] + ps[None] * (roi_h / P)[:, None, None]
    xs = x1[:, None, None] + ps[None] * (roi_w / P)[:, None, None]
    n = rois_c.shape[0]
    yy = jnp.broadcast_to(ys[:, :, :, None, None], (n, P, S, P, S))
    xx = jnp.broadcast_to(xs[:, None, None, :, :], (n, P, S, P, S))
    return yy, xx


def _fused_multilevel_pool(feats, strides, rois, sample_grid, output_size,
                           sampling_ratio, canonical_level, roi_chunk):
    """Shared engine of the fused poolers: flatten all levels into one row
    table, compute per-roi sample grids via `sample_grid(rois_chunk,
    inv_scale_chunk) -> (yy, xx) of shape (n, P, S, P, S)` in the roi's
    assigned-level coordinates, then bilinear-gather with per-roi bounds."""
    min_level = int(np.log2(strides[0]))
    max_level = int(np.log2(strides[-1]))
    # level assignment by sqrt(w*h) — for XYXY rois this equals sqrt(area);
    # rotated callers pass an equivalent-extent proxy
    proxy = rois if rois.shape[-1] == 4 else jnp.stack(
        [jnp.zeros_like(rois[:, 0]), jnp.zeros_like(rois[:, 1]),
         rois[:, 2], rois[:, 3]], axis=-1)
    levels = assign_fpn_levels(proxy, min_level, max_level,
                               canonical_level=canonical_level)
    lvl = levels - min_level                                   # (N,) in [0,L)

    heights = np.asarray([f.shape[0] for f in feats], np.int32)
    widths = np.asarray([f.shape[1] for f in feats], np.int32)
    row_off = np.concatenate(
        [[0], np.cumsum(heights.astype(np.int64) * widths)[:-1]]
    ).astype(np.int32)
    inv_scale = np.asarray([1.0 / s for s in strides], np.float32)

    C = feats[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)

    # per-roi level geometry
    h_l = jnp.asarray(heights)[lvl]                            # (N,)
    w_l = jnp.asarray(widths)[lvl]
    off_l = jnp.asarray(row_off)[lvl]
    sc_l = jnp.asarray(inv_scale)[lvl]

    P = output_size

    def pool_chunk(args):
        rois_c, h_c, w_c, off_c, sc_c = args
        yy, xx = sample_grid(rois_c, sc_c)

        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        ly = yy - y0
        lx = xx - x0
        hb = (h_c - 1)[:, None, None, None, None]
        wb = (w_c - 1)[:, None, None, None, None]
        y0 = jnp.clip(y0.astype(jnp.int32), 0, hb)
        x0 = jnp.clip(x0.astype(jnp.int32), 0, wb)
        y1i = jnp.minimum(y0 + 1, hb)

        # Pair-slice gather: the two x-taps of a sample are ADJACENT rows of
        # the flat table, so one (2, C) slice fetches both — half the gather
        # descriptors and half the fetched bytes of 4 independent row reads
        # (measured 1.32x on this pattern, tools/roi_gather_probe.py). The
        # pair starts at min(x0, W-2) so it never crosses a feature row; at
        # the right border (x0 == W-1) both taps are the last column, i.e.
        # pair[1] with weight 1.
        xp = jnp.clip(x0, 0, jnp.maximum(wb - 1, 0))
        at_border = x0 > xp                                  # x0 == W-1
        wx = lx[..., None]
        w_left = jnp.where(at_border[..., None], 0.0, 1.0 - wx)
        w_right = jnp.where(at_border[..., None], 1.0, wx)

        base = off_c[:, None, None, None, None]
        wrow = w_c[:, None, None, None, None]
        top_rows = (base + y0 * wrow + xp).reshape(-1)
        bot_rows = (base + y1i * wrow + xp).reshape(-1)
        C = flat.shape[-1]

        def g2(i):
            return jax.lax.dynamic_slice(flat, (i, 0), (2, C))

        shp = y0.shape + (2, C)
        top = jax.vmap(g2)(top_rows).reshape(shp)            # (...,2,C)
        bot = jax.vmap(g2)(bot_rows).reshape(shp)
        vt = top[..., 0, :] * w_left + top[..., 1, :] * w_right
        vb = bot[..., 0, :] * w_left + bot[..., 1, :] * w_right
        wy = ly[..., None]
        samples = vt * (1 - wy) + vb * wy                    # (n,P,S,P,S,C)
        return samples.mean(axis=(2, 4))                     # (n,P,P,C)

    n = rois.shape[0]
    if n > roi_chunk:
        pad = (-n) % roi_chunk
        m = (n + pad) // roi_chunk

        def cpad(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)).reshape(
                (m, roi_chunk) + a.shape[1:]
            )

        out = jax.lax.map(
            pool_chunk, (cpad(rois), cpad(h_l), cpad(w_l), cpad(off_l),
                         cpad(sc_l))
        )
        return out.reshape(n + pad, P, P, C)[:n]
    return pool_chunk((rois, h_l, w_l, off_l, sc_l))
