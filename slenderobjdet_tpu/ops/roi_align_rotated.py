"""ROIAlignRotated as an XLA gather composition.

Replaces detectron2's CUDA ROIAlignRotated, which the reference's rotated
two-stage path selects via POOLER_TYPE "ROIAlignRotated"
(`configs/rotated/Base-RRCNN-FPN.yaml` ROI_BOX_HEAD, used by RROIHeads).

Semantics (d2 ROIAlignRotated_cuda.cu): rois are (cx, cy, w, h, angle_deg)
with angle counter-clockwise in image coordinates (y down) — the repo-wide
RotatedBoxes convention (ops/rotated.py). The op is ALWAYS "aligned": roi
centers get the continuous-coordinate half-pixel offset (-0.5). Each output
bin averages sampling_ratio^2 bilinear samples taken on a local grid that is
rotated by theta about the roi center:

    y = yy*cos(theta) - xx*sin(theta) + cy
    x = yy*sin(theta) + xx*cos(theta) + cx

which at angle 0 reduces exactly to RoIAlign-aligned on the equivalent XYXY
box (tested).

Backward: XLA's scatter-add transpose of the gather. Unlike the axis-aligned
RoIAlign (ops/roi_align.py), the rotated sample grid is not separable in
y/x, so the matmul-adjoint trick does not apply; the rotated R-CNN family is
not a benched hot path, so the default adjoint is the right trade.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .roi_align import (
    _bilinear_gather,
    _fused_multilevel_pool,
    assign_fpn_levels,
)


def roi_align_rotated(
    feat: jnp.ndarray,          # (H, W, C) single level, single image
    rois: jnp.ndarray,          # (N, 5) XYWHA in IMAGE coordinates
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_chunk: int = 128,
) -> jnp.ndarray:
    """-> (N, output_size, output_size, C). Chunked like roi_align to bound
    the bilinear-gather transient."""
    n = rois.shape[0]
    core = lambda r: _roi_align_rotated_impl(  # noqa: E731
        feat, r, spatial_scale, output_size, sampling_ratio)
    if n > roi_chunk:
        pad = (-n) % roi_chunk
        padded = jnp.pad(rois, ((0, pad), (0, 0)))
        chunks = padded.reshape((n + pad) // roi_chunk, roi_chunk, 5)
        out = jax.lax.map(core, chunks)
        out = out.reshape(n + pad, output_size, output_size, feat.shape[-1])
        return out[:n]
    return core(rois)


def _roi_align_rotated_impl(feat, rois, spatial_scale, output_size,
                            sampling_ratio):
    P, S = output_size, sampling_ratio
    n = rois.shape[0]
    cx = rois[:, 0] * spatial_scale - 0.5      # continuous-coordinate offset
    cy = rois[:, 1] * spatial_scale - 0.5
    roi_w = rois[:, 2] * spatial_scale
    roi_h = rois[:, 3] * spatial_scale
    theta = rois[:, 4] * (math.pi / 180.0)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    # local grid relative to the roi center: start at -size/2
    ps = jnp.arange(P)[:, None] + (jnp.arange(S)[None, :] + 0.5) / S  # (P,S)
    yy = (-0.5 + ps[None] / P) * roi_h[:, None, None]                 # (N,P,S)
    xx = (-0.5 + ps[None] / P) * roi_w[:, None, None]

    yy = jnp.broadcast_to(yy[:, :, :, None, None], (n, P, S, P, S))
    xx = jnp.broadcast_to(xx[:, None, None, :, :], (n, P, S, P, S))
    c = cos_t[:, None, None, None, None]
    s = sin_t[:, None, None, None, None]
    y = yy * c - xx * s + cy[:, None, None, None, None]
    x = yy * s + xx * c + cx[:, None, None, None, None]

    samples = _bilinear_gather(feat, y, x)      # (N,P,S,P,S,C)
    return samples.mean(axis=(2, 4))            # (N,P,P,C)


def multilevel_roi_align_rotated(
    feats: Sequence[jnp.ndarray],     # list of (H_l, W_l, C), one image
    strides: Sequence[int],
    rois: jnp.ndarray,                # (N, 5) image coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """Rotated counterpart of multilevel_roi_align: d2 assigns levels by
    sqrt(w*h) (RotatedBoxes.area), pools every roi from all levels, selects
    per-roi (fixed-shape strategy, see roi_align.py)."""
    min_level = int(np.log2(strides[0]))
    max_level = int(np.log2(strides[-1]))
    # reuse assign_fpn_levels via an equivalent-area XYXY proxy box
    proxy = jnp.stack(
        [jnp.zeros_like(rois[:, 0]), jnp.zeros_like(rois[:, 1]),
         rois[:, 2], rois[:, 3]], axis=-1)
    levels = assign_fpn_levels(proxy, min_level, max_level,
                               canonical_level=canonical_level)

    out = None
    for i, (feat, stride) in enumerate(zip(feats, strides)):
        pooled = roi_align_rotated(feat, rois, 1.0 / stride, output_size,
                                   sampling_ratio)
        sel = (levels == (min_level + i))[:, None, None, None]
        term = jnp.where(sel, pooled, 0.0)
        out = term if out is None else out + term
    return out


def multilevel_roi_align_rotated_fused(
    feats: Sequence[jnp.ndarray],     # list of (H_l, W_l, C), one image
    strides: Sequence[int],
    rois: jnp.ndarray,                # (N, 5) XYWHA image coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_level: int = 4,
    roi_chunk: int = 128,
) -> jnp.ndarray:
    """Single-gather rotated multilevel pooler (inference hot path): the
    rotated sample grid over the flattened-level table of
    roi_align.multilevel_roi_align_fused — 4x fewer gathered bytes than the
    pool-every-level path, same output up to fp reduction order."""
    P, S = output_size, sampling_ratio

    def sample_grid(rois_c, sc_c):
        n = rois_c.shape[0]
        cx = rois_c[:, 0] * sc_c - 0.5
        cy = rois_c[:, 1] * sc_c - 0.5
        roi_w = rois_c[:, 2] * sc_c
        roi_h = rois_c[:, 3] * sc_c
        theta = rois_c[:, 4] * (math.pi / 180.0)
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

        ps = jnp.arange(P)[:, None] + (jnp.arange(S)[None, :] + 0.5) / S
        yy = (-0.5 + ps[None] / P) * roi_h[:, None, None]
        xx = (-0.5 + ps[None] / P) * roi_w[:, None, None]
        yy = jnp.broadcast_to(yy[:, :, :, None, None], (n, P, S, P, S))
        xx = jnp.broadcast_to(xx[:, None, None, :, :], (n, P, S, P, S))
        c = cos_t[:, None, None, None, None]
        s = sin_t[:, None, None, None, None]
        y = yy * c - xx * s + cy[:, None, None, None, None]
        x = yy * s + xx * c + cx[:, None, None, None, None]
        return y, x

    return _fused_multilevel_pool(feats, strides, rois, sample_grid,
                                  output_size, sampling_ratio,
                                  canonical_level, roi_chunk)
