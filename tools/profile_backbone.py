"""Per-stage throughput profile of the flagship FCOS R-50-FPN inference path.

Times each backbone stage on the real chip using K serialized in-graph
repetitions (lax.scan with a data dependency) so the fixed host-fetch latency
of the axon tunnel amortizes away — the measurement harness behind the
round-3 backbone-MFU work (VERDICT round-2 next-step #1).

Usage: python tools/profile_backbone.py [--batch 32] [--reps 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_reps(apply_fn, variables, x, reps, iters=3, warmup=1):
    """Time `reps` serialized executions of apply_fn(variables, x) inside one
    jitted program; returns seconds per single execution."""

    def program(v, xx):
        def body(carry, i):
            y = apply_fn(v, xx + carry.astype(xx.dtype))
            leaves = jax.tree_util.tree_leaves(y)
            s = sum(jnp.sum(l, dtype=jnp.float32) for l in leaves)
            return s * 1e-30, ()

        carry, _ = lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return carry

    f = jax.jit(program)
    for _ in range(warmup):
        float(f(variables, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(variables, x))
    return (time.perf_counter() - t0) / iters / reps


def conv_flops(hw, cin, cout, k=1):
    return 2 * hw * cin * cout * k * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--fused", action="store_true",
                    help="run stride-1 bottlenecks via the fused Pallas "
                         "kernel (MODEL.RESNETS.FUSED_BLOCKS)")
    args = ap.parse_args()
    B, K = args.batch, args.reps
    H, W = 800, 1344
    dt = jnp.bfloat16

    import flax.linen as nn

    from slenderobjdet_tpu.models.backbones.resnet import (
        BottleneckBlock, ResNet)

    rng = jax.random.PRNGKey(0)
    rows = []

    def bench_module(name, mod, x_shape, flops_per_img, in_dtype=dt):
        x = jnp.zeros(x_shape, in_dtype)
        variables = mod.init(rng, x)
        t = timed_reps(mod.apply, variables, x, K)
        tf = flops_per_img * B / t / 1e12
        rows.append((name, t * 1e3, flops_per_img / 1e9, tf))
        return t

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = (x - 110.0) / 57.0
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        dtype=dt, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    stem_flops = conv_flops((H // 2) * (W // 2), 3, 64, 7)
    bench_module("stem(norm+7x7+pool)", Stem(), (B, H, W, 3), stem_flops)

    stage_specs = [
        ("res2", 3, 64, 64, 256, (H // 4, W // 4), 1),
        ("res3", 4, 256, 128, 512, (H // 4, W // 4), 2),
        ("res4", 6, 512, 256, 1024, (H // 8, W // 8), 2),
        ("res5", 3, 1024, 512, 2048, (H // 16, W // 16), 2),
    ]

    class Stage(nn.Module):
        n: int
        bottleneck: int
        out_ch: int
        stride: int

        @nn.compact
        def __call__(self, x):
            for i in range(self.n):
                x = BottleneckBlock(
                    features=self.out_ch, bottleneck=self.bottleneck,
                    stride=self.stride if i == 0 else 1, norm="FrozenBN",
                    fused=args.fused, dtype=dt, name=f"b{i}")(x)
            return x

    def stage_flops(n, cin, mid, cout, ho, wo):
        f = conv_flops(ho * wo, cin, mid) + conv_flops(ho * wo, mid, mid, 3) \
            + conv_flops(ho * wo, mid, cout) + conv_flops(ho * wo, cin, cout)
        f += (n - 1) * (conv_flops(ho * wo, cout, mid)
                        + conv_flops(ho * wo, mid, mid, 3)
                        + conv_flops(ho * wo, mid, cout))
        return f

    total_f = stem_flops
    for name, n, cin, mid, cout, (h, w), s in stage_specs:
        f = stage_flops(n, cin, mid, cout, h // s, w // s)
        total_f += f
        bench_module(name, Stage(n=n, bottleneck=mid, out_ch=cout, stride=s),
                     (B, h, w, cin), f)

    bb = ResNet(depth=50, norm="FrozenBN", fused_blocks=args.fused,
                out_features=("res3", "res4", "res5"), dtype=dt)
    bench_module("full-resnet50", bb, (B, H, W, 3), total_f)

    # --- flagship graph pieces
    from __graft_entry__ import _flagship_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = _flagship_cfg()
    if args.fused:
        cfg.defrost()
        cfg.MODEL.RESNETS.FUSED_BLOCKS = True
        cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(rng, (H, W), batch_size=B)
    x = jnp.zeros((B, H, W, 3), dt)

    def bb_fpn(v, xx):
        return det.module.apply(v, xx, method=lambda m, q: m.backbone(q))

    t = timed_reps(bb_fpn, variables, x, K)
    rows.append(("backbone+FPN(graph)", t * 1e3, 0, 0))

    def fwd(v, xx):
        return det.module.apply(v, xx, train=False)

    t = timed_reps(fwd, variables, x, K)
    rows.append(("fwd(backbone+head)", t * 1e3, 0, 0))

    # --- full predict incl. postprocess (uint8 in, topk + NMS + rescale).
    # timed_reps perturbs x by an fp32 carry; predict takes the image via a
    # batch dict, so close over the static fields.
    scale = jnp.full((B,), 800.0 / 1333.0, jnp.float32)
    orig = jnp.asarray([[1333, 2000]] * B, jnp.float32)
    xu8 = jnp.zeros((B, H, W, 3), jnp.uint8)

    def pred(v, xx):
        return det.predict(v, {"image": xx.astype(jnp.uint8),
                               "scale": scale, "orig_size": orig})

    t = timed_reps(pred, variables, xu8.astype(jnp.int32), K)
    rows.append(("predict(full)", t * 1e3, 0, 0))

    print(f"\nB={B} 800x1344 bf16 — {K} in-graph reps, ms per execution")
    print(f"{'stage':24s} {'ms':>9s} {'GFLOP/img':>10s} {'TFLOPS':>8s}")
    for name, ms, gf, tf in rows:
        print(f"{name:24s} {ms:9.2f} {gf:10.1f} {tf:8.1f}")


if __name__ == "__main__":
    main()
