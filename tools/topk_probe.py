"""Microbenchmark of top-k variants on postprocess-relevant shapes.

Usage: python tools/topk_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, x, reps=16, iters=3):
    def program(xx):
        def body(carry, _):
            out = fn(xx + carry.astype(xx.dtype))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)
            return s * 1e-30, ()

        carry, _ = lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return carry

    f = jax.jit(program)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(x))
    return (time.perf_counter() - t0) / iters / reps


def main():
    B = 32
    for N in (6160, 21840, 80000, 84000, 336000, 1344000):
        x = jax.random.uniform(jax.random.PRNGKey(0), (B, N), jnp.float32)
        for k in (100, 1000):
            row = [f"N={N:8d} k={k:5d}"]
            t = timed(lambda v: lax.approx_max_k(v, k, recall_target=0.99), x)
            row.append(f"approx {t * 1e3:7.2f} ms")
            if N <= 100000:
                t = timed(lambda v: lax.top_k(v, k), x)
                row.append(f"exact {t * 1e3:7.2f} ms")
            t = timed(lambda v: jnp.max(v, axis=-1), x)
            row.append(f"max {t * 1e3:7.2f} ms")
            print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
