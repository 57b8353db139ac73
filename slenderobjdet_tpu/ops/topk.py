"""Top-k selection with a TPU-fast approximate path.

`jax.lax.top_k` over the per-level score tensors is one of the biggest
post-processing costs (50ms for (32, 1.34M) on v5e); `jax.lax.approx_max_k`
uses the TPU sort accelerator ("PartialReduce") and runs ~16x faster at a
configurable recall target. TPU.APPROX_TOPK (default on) selects it with
recall_target=0.99 — candidates it may drop are low-score tail entries that
greedy NMS would discard anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# flipped by detectors from cfg.TPU.APPROX_TOPK
_RECALL_TARGET = 0.99


def fast_top_k(scores: jnp.ndarray, k: int, approx: bool = True):
    """scores (..., N) -> (values (..., k), indices (..., k))."""
    if approx and scores.shape[-1] > 4 * k:
        return jax.lax.approx_max_k(scores, k, recall_target=_RECALL_TARGET)
    return jax.lax.top_k(scores, k)


def pair_top_k(rank: jnp.ndarray, k: int, approx: bool = True):
    """Top-k over the flattened pair axis of a (B, L, C) ranking tensor,
    returning (values (B, K), loc_idx (B, K), cls_idx (B, K)) with
    K = min(k, L*C).

    Two-stage location-first selection when L > k: the top-K (location,
    class) pairs span at most K locations, and any location holding a top-K
    pair must rank in the top-K locations by class-max of the SAME rank
    tensor (its max is >= that pair's value; K locations with a strictly
    larger max would mean K higher-ranked pairs). Stage 1 reduces (B, L, C)
    to (B, L) in one fused pass; the pair top-k and downstream gathers run
    on the K surviving rows only. Selection-identical to the flat top-k up
    to ties / approx_max_k recall. On v5e this cuts the dominant
    postprocess cost for every dense head (FCOS P3: L*C = 1.3M -> 80k
    elements sorted; RetinaNet P3: 12.1M -> 80k).

    The caller bakes every ranking factor (sigmoid, threshold mask,
    centerness/objectness weighting) into `rank` BEFORE calling — the
    stage-1 location statistic must be the class-max of the final ranking
    or the containment argument above breaks (see
    tests/test_postprocess.py's adversarial sub-threshold case).
    """
    bsz, L, C = rank.shape
    kloc = min(k, L)
    if L > kloc:
        rank1 = jnp.max(rank, axis=-1)                        # (B, L)
        _, loc_sel = fast_top_k(rank1, kloc, approx=approx)   # (B, kloc)
        rank = jnp.take_along_axis(rank, loc_sel[..., None], axis=1)
    else:
        loc_sel = None

    kk = min(k, kloc * C)
    values, idx = fast_top_k(rank.reshape(bsz, kloc * C), kk, approx=approx)
    loc_idx = idx // C
    cls_idx = (idx % C).astype(jnp.int32)
    if loc_sel is not None:
        loc_idx = jnp.take_along_axis(loc_sel, loc_idx, axis=1)
    return values, loc_idx, cls_idx
