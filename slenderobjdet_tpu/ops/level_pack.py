"""Mosaic packing of FPN pyramid levels for shared dense heads.

The reference applies its shared RetinaNet/FCOS head towers per level
(`slender_det/modeling/meta_arch/fcos/fcos.py:476-582`,
detectron2 retinanet head): 5 levels x (8 tower + 2-3 predictor) convs =
~55 conv ops per forward, where the P5-P7 spatial dims (25x42, 13x21, 7x11
at 800x1344) are far below the TPU's (8, 128) tile and waste most of each
MXU pass on padding.

TPU-first alternative: place the smaller levels side by side in ONE zero
canvas (shelf packing, 1-px zero gap) and run each shared conv ONCE over
the canvas. With a 3x3/pad-1 conv, a level's edge pixels read the 1-px
zero gap — exactly the zero padding the standalone per-level conv sees —
so region outputs are bit-equal to the per-level path as long as the gaps
are re-zeroed between convs (`map_regions` re-embeds per-region outputs
into a fresh zero canvas, which also lets per-level norms like the FCOS
head's GroupNorm keep their per-level statistics).

Not applicable to deformable towers (predicted offsets may reach across
the 1-px gap into a neighboring level); callers gate on that.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Plan = Tuple[Tuple[int, int], Tuple[Tuple[int, int], ...]]


def plan_level_packing(shapes: Sequence[Tuple[int, int]],
                       gap: int = 1) -> Plan:
    """Shelf-pack (h, w) rectangles into columns.

    Canvas height is the tallest level; levels fill a column top-down (gap
    rows between) and spill into a new column (gap cols between) when they
    run out of height. For a stride-2 pyramid tail (P4..P7) this yields a
    near-tight canvas: [(50,84),(25,42),(13,21),(7,11)] -> 50x127 = 6350
    px vs 5600 useful. Returns ((H, W), ((y, x) per level))."""
    H = max(h for h, _ in shapes)
    offsets = []
    col_x, col_w, y = 0, 0, 0
    for h, w in shapes:
        if y > 0 and y + h > H:
            col_x += col_w + gap
            y, col_w = 0, 0
        offsets.append((y, col_x))
        y += h + gap
        col_w = max(col_w, w)
    return (H, col_x + col_w), tuple(offsets)


def pack_levels(feats: Sequence[jnp.ndarray], plan: Plan) -> jnp.ndarray:
    """[(B, h_i, w_i, C)] -> (B, H, W, C) zero canvas with levels embedded."""
    (H, W), offsets = plan
    b, _, _, c = feats[0].shape
    canvas = jnp.zeros((b, H, W, c), feats[0].dtype)
    for f, (y, x) in zip(feats, offsets):
        canvas = jax.lax.dynamic_update_slice(canvas, f, (0, y, x, 0))
    return canvas


def unpack_levels(canvas: jnp.ndarray, shapes: Sequence[Tuple[int, int]],
                  plan: Plan) -> List[jnp.ndarray]:
    _, offsets = plan
    b = canvas.shape[0]
    c = canvas.shape[-1]
    return [
        jax.lax.dynamic_slice(canvas, (0, y, x, 0), (b, h, w, c))
        for (h, w), (y, x) in zip(shapes, offsets)
    ]


def map_regions(canvas: jnp.ndarray, shapes: Sequence[Tuple[int, int]],
                plan: Plan,
                fn: Callable[[int, jnp.ndarray], jnp.ndarray]) -> jnp.ndarray:
    """Apply fn(level_idx, region) to each level region and re-embed into a
    FRESH zero canvas — re-zeroing the inter-level gaps (which hold garbage
    after a canvas-wide conv) so the next 3x3 conv sees the same zeros a
    standalone per-level conv's padding provides."""
    regions = unpack_levels(canvas, shapes, plan)
    out = None
    for i, (r, (y, x)) in enumerate(zip(regions, plan[1])):
        r = fn(i, r)
        if out is None:
            (H, W) = plan[0]
            out = jnp.zeros((canvas.shape[0], H, W, r.shape[-1]), r.dtype)
        out = jax.lax.dynamic_update_slice(out, r, (0, y, x, 0))
    return out
