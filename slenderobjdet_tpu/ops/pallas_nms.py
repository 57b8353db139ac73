"""Greedy NMS as a Pallas TPU kernel.

The XLA version (ops/nms.py) runs max_out sequential scan steps, each a
separate loop iteration over HBM-resident vectors. Here the whole candidate
set stays in VMEM for the full selection (N=5000 candidates -> ~200KB), so
the greedy loop runs entirely on-chip.

Layout choices driven by TPU tiling rules (blocks' last two dims must be
(8k, 128m) or full): coordinates are passed PLANAR as four (B, N) arrays,
the grid tiles 8 images per program, and the selection loop is vectorized
across those 8 rows (argmax/gather/suppression all (8, N) VPU ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10
_ROWS = 8  # images per program (sublane tile)


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                keep_idx_ref, keep_valid_ref,
                *, iou_threshold: float, max_out: int):
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    areas = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    col = jax.lax.broadcasted_iota(jnp.int32, x1.shape, 1)
    rows = x1.shape[0]
    out_col = jax.lax.broadcasted_iota(jnp.int32, (rows, max_out), 1)

    def body(i, carry):
        live, keep_idx, keep_valid = carry
        # per-row argmax over N candidates: (R,)
        j = jnp.argmax(live, axis=1)
        sel = col == j[:, None]                              # (R, N) one-hot
        # gather-by-reduction (Pallas TPU has no per-row dynamic gather)
        best = jnp.max(jnp.where(sel, live, NEG_INF), axis=1, keepdims=True)
        ok = best > NEG_INF / 2

        def pick(v):
            return jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)

        bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
        barea = pick(areas)

        iw = jnp.clip(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0, None)
        ih = jnp.clip(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0, None)
        inter = iw * ih
        iou = inter / jnp.maximum(areas + barea - inter, 1e-12)

        suppress = ok & (iou > iou_threshold)
        live = jnp.where(suppress | sel, NEG_INF, live)

        # write the i-th output column via masked select (dynamic
        # single-column stores don't lower on Mosaic)
        at_i = out_col == i
        keep_idx = jnp.where(at_i, j[:, None].astype(jnp.int32), keep_idx)
        keep_valid = jnp.where(at_i, ok.astype(jnp.int32), keep_valid)
        return live, keep_idx, keep_valid

    init = (
        scores_ref[:],
        jnp.zeros((rows, max_out), jnp.int32),
        jnp.zeros((rows, max_out), jnp.int32),
    )
    _, keep_idx, keep_valid = jax.lax.fori_loop(0, max_out, body, init)
    keep_idx_ref[:] = keep_idx
    keep_valid_ref[:] = keep_valid


def pallas_nms(boxes, scores, iou_threshold: float, max_out: int,
               valid=None, interpret: bool = False):
    """Batched fixed-shape greedy NMS: boxes (B, N, 4), scores (B, N).
    Returns (keep_idx (B, max_out) int32, keep_valid (B, max_out) bool).
    Bit-identical to vmapped ops.nms.nms_select."""
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    B, N, _ = boxes.shape

    pad_b = (-B) % _ROWS
    pad_n = (-N) % 128
    if pad_b or pad_n:
        boxes = jnp.pad(boxes, ((0, pad_b), (0, pad_n), (0, 0)))
        scores = jnp.pad(scores, ((0, pad_b), (0, pad_n)),
                         constant_values=NEG_INF)
    Bp, Np = scores.shape

    planes = [boxes[..., i].astype(jnp.float32) for i in range(4)]
    kernel = functools.partial(
        _nms_kernel, iou_threshold=float(iou_threshold), max_out=int(max_out)
    )
    row_spec = pl.BlockSpec((_ROWS, Np), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_ROWS, max_out), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    keep_idx, keep_valid = pl.pallas_call(
        kernel,
        grid=(Bp // _ROWS,),
        in_specs=[row_spec] * 5,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, max_out), jnp.int32),
            jax.ShapeDtypeStruct((Bp, max_out), jnp.int32),
        ],
        interpret=interpret,
    )(*planes, scores.astype(jnp.float32))
    keep_idx = keep_idx[:B]
    keep_valid = keep_valid[:B].astype(bool)
    return jnp.where(keep_valid, keep_idx, 0), keep_valid


def pallas_batched_nms(boxes, scores, idxs, iou_threshold: float,
                       max_out: int, valid=None, interpret: bool = False):
    """Class-aware variant via the coordinate-offset trick (batched)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    return pallas_nms(boxes + offsets[..., None], scores, iou_threshold,
                      max_out, valid=valid, interpret=interpret)
