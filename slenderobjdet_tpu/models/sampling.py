"""Fixed-shape random subsampling (d2 `subsample_labels` semantics).

The reference's RPN/ROI heads randomly pick a fixed budget of positives and
negatives per image (256 @ 0.5 for RPN, 512 @ 0.25 for ROI heads) via
torch.randperm — data-dependent shapes. The TPU rewrite keeps everything
masked: each candidate gets a random priority; rank-within-group (double
argsort) decides selection, so the result is a boolean mask with at most
`num_samples` True entries and the same distribution as the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _rank_in_group(priority: jnp.ndarray, member: jnp.ndarray) -> jnp.ndarray:
    """Rank (0-based) of each element among its group's ascending priorities;
    non-members get a huge rank."""
    p = jnp.where(member, priority, jnp.inf)
    order = jnp.argsort(p)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(p.shape[0]))
    return jnp.where(member, ranks, p.shape[0] + 1)


def subsample_labels(
    rng: jax.Array,
    positive: jnp.ndarray,      # (N,) bool
    negative: jnp.ndarray,      # (N,) bool
    num_samples: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pos_mask, neg_mask): selected positives/negatives.

    num_pos = min(#pos, num_samples * positive_fraction);
    num_neg = min(#neg, num_samples - num_pos). Uniform without replacement.
    """
    n = positive.shape[0]
    r1, r2 = jax.random.split(rng)
    target_pos = int(num_samples * positive_fraction)

    pos_rank = _rank_in_group(jax.random.uniform(r1, (n,)), positive)
    sel_pos = positive & (pos_rank < target_pos)
    num_pos = jnp.sum(sel_pos)

    neg_rank = _rank_in_group(jax.random.uniform(r2, (n,)), negative)
    sel_neg = negative & (neg_rank < (num_samples - num_pos))
    return sel_pos, sel_neg
