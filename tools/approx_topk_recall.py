"""Measure approx-vs-exact selection recall of pair_top_k ON-CHIP.

TPU.APPROX_TOPK=True routes both pair_top_k stages through
jax.lax.approx_max_k (recall_target 0.99/stage); on CPU approx_max_k
falls back to exact, so only a real-TPU run produces evidence. This probe
measures corner-set / detection-set recall (the fraction of exactly
selected (location, class) pairs the approximate path also selects) on the
two shapes that matter:

  corner: CornerNet decode — sparse 3x3-NMS'd sigmoid peaks,
          (B, 128*128, 80), K=100 (corner_net.py predict)
  dense:  FCOS/RetinaNet P3 candidate stage, (B, 100*168, 80), K=1000

Run: python tools/approx_topk_recall.py [--batch 8] [--trials 4]
Evidence recorded in VALIDATION.md (round 4). ADVICE r3: the shipped
approx=True corner path needed measured recall, not the approx=False
equivalence test alone.
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def corner_heat(r, B, H, W, C):
    """Sparse peaky heatmaps like a trained CornerNet's post-NMS sigmoid
    scores: background logits ~ N(-4, 1), ~600 random peaks/img at logits
    N(1.5, 1.5), then 3x3 max-pool NMS zeroing."""
    import flax.linen as nn

    logits = r.randn(B, H, W, C).astype(np.float32) - 4.0
    for b in range(B):
        n = 600
        ys = r.randint(0, H, n)
        xs = r.randint(0, W, n)
        cs = r.randint(0, C, n)
        logits[b, ys, xs, cs] = 1.5 + 1.5 * r.randn(n).astype(np.float32)
    p = jax.nn.sigmoid(jnp.asarray(logits))
    pooled = nn.max_pool(p, (3, 3), strides=(1, 1), padding="SAME")
    return jnp.where(p == pooled, p, 0.0)


def recall(rank, K):
    from slenderobjdet_tpu.ops.topk import pair_top_k

    f = jax.jit(lambda x: pair_top_k(x, K, approx=True))
    g = jax.jit(lambda x: pair_top_k(x, K, approx=False))
    va, la, ca = jax.block_until_ready(f(rank))
    ve, le, ce = jax.block_until_ready(g(rank))
    B = rank.shape[0]
    C = rank.shape[2]
    hits = 0
    total = 0
    for b in range(B):
        # compare as (loc, cls) pair sets among nonzero-score picks
        ex = {(int(l), int(c)) for l, c, v in
              zip(np.asarray(le[b]), np.asarray(ce[b]), np.asarray(ve[b]))
              if v > 0}
        ap = {(int(l), int(c)) for l, c, v in
              zip(np.asarray(la[b]), np.asarray(ca[b]), np.asarray(va[b]))
              if v > 0}
        hits += len(ex & ap)
        total += len(ex)
    return hits, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()
    print("devices:", jax.devices())

    r = np.random.RandomState(0)
    B = args.batch

    for name, K, make in [
        ("corner 128x128x80 K=100",
         100, lambda: corner_heat(r, B, 128, 128, 80)),
        ("dense P3 100x168x80 K=1000",
         1000, lambda: jax.nn.sigmoid(
             jnp.asarray(r.randn(B, 100 * 168, 80).astype(np.float32) - 4.0))),
    ]:
        hits = total = 0
        for _ in range(args.trials):
            x = make()
            if x.ndim == 4:
                x = x.reshape(B, -1, x.shape[-1])
            h, t = recall(x, K)
            hits += h
            total += t
        print(f"{name}: approx-vs-exact selection recall "
              f"{hits}/{total} = {hits / max(total, 1):.4f}")


if __name__ == "__main__":
    main()
