"""Bisection of FCOS inference postprocess cost (round-3 perf).

predict(full) - fwd = ~39 ms at B=32 800x1344. This times the two stages of
the postprocess separately on representative shapes:

  cand:P3..P7  per-level candidate selection (sigmoid, threshold, approx
               top-k over L*C, gathers, LTRB decode)
  nms          vmapped class-aware greedy NMS over the 5*1000 concatenated
               candidates (scan of max_dets=100 suppression steps)

Usage: python tools/postprocess_probe.py [--batch 32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, args, reps=8, iters=3):
    def program(*a):
        def body(carry, _):
            out = fn(*[x + carry.astype(x.dtype) if x.dtype.kind == "f"
                       else x for x in a])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1], dtype=jnp.float32) for l in leaves)
            return s * 1e-30, ()

        carry, _ = lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return carry

    f = jax.jit(program)
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*args))
    return (time.perf_counter() - t0) / iters / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    B = args.batch
    C = 80
    K = 1000
    levels = [(100, 168), (50, 84), (25, 42), (13, 21), (7, 11)]

    from slenderobjdet_tpu.models.meta_arch.fcos import (
        _fcos_level_candidates)
    from slenderobjdet_tpu.ops.nms import batched_nms
    from slenderobjdet_tpu.structures import boxes as box_ops

    key = jax.random.PRNGKey(0)
    total = 0.0
    for (h, w) in levels:
        L = h * w
        logits = jax.random.normal(key, (B, L, C), jnp.float32) * 2 - 4
        reg = jnp.abs(jax.random.normal(key, (B, L, 4), jnp.float32)) * 50
        ctr = jax.random.normal(key, (B, L), jnp.float32)
        locs = jnp.asarray(
            np.stack(np.meshgrid(np.arange(w), np.arange(h)),
                     -1).reshape(-1, 2).astype(np.float32))

        def cand(lg, rg, ct, lc):
            return _fcos_level_candidates(lg, rg, ct, lc, 0.05, K,
                                          approx=True)

        t = timed(cand, (logits, reg, ctr, locs))
        total += t
        print(f"cand {h:3d}x{w:3d} (L={L:6d}) {t * 1e3:7.2f} ms", flush=True)

    print(f"cand total        {total * 1e3:7.2f} ms")

    N = 5 * K
    bx = jnp.abs(jax.random.normal(key, (B, N, 4), jnp.float32)) * 300
    bx = bx.at[..., 2:].set(bx[..., :2] + jnp.abs(bx[..., 2:]) + 1)
    sc = jax.random.uniform(key, (B, N), jnp.float32)
    cl = jax.random.randint(key, (B, N), 0, C)
    vl = sc > 0.3

    def nms(b, s, c, v):
        return jax.vmap(lambda bb, ss, cc, vv: batched_nms(
            bb, ss, cc, 0.6, 100, valid=vv))(b, s, c, v)

    t = timed(nms, (bx, sc, cl, vl))
    print(f"nms  (B,{N})x100   {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
