"""Staged device-time profile of CornerNet predict: hourglass backbone /
full module forward (backbone + corner pools + heads) / full predict
(+decode/pairing/NMS). Same serialized in-graph reps protocol as
reppoints_profile.py.

Usage: python tools/corner_profile.py [--batch 4] [--reps 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, args_, reps, iters=3):
    def program(z, *a):
        def body(carry, _):
            out = fn(carry, *a)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)
            return s * 1e-30, ()

        carry, _ = lax.scan(body, z, None, length=reps)
        return carry

    f = jax.jit(program)
    z = jnp.zeros((), jnp.float32)
    float(f(z, *args_))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(z, *args_))
    return (time.perf_counter() - t0) / iters / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=(512, 768))
    ap.add_argument("--stages", action="store_true",
                    help="bisect the decode (flat-top_k replica stages)")
    args = ap.parse_args()
    B, K = args.batch, args.reps
    H, W = args.size

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/corner/corner_net_hourglass.yaml")
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0), (H, W), batch_size=B)
    img = jnp.zeros((B, H, W, 3), jnp.uint8)
    batch = {
        "image": img,
        "scale": jnp.full((B,), 1.0, jnp.float32),
        "orig_size": jnp.asarray([[H, W]] * B, jnp.float32),
    }

    mean = jnp.asarray(det.module.pixel_mean)
    std = jnp.asarray(det.module.pixel_std)
    dtype = det.module.dtype
    bb = det.backbone_spec.module

    def split_bb(variables):
        v = {"params": variables["params"]["backbone"]}
        if "buffers" in variables and "backbone" in variables["buffers"]:
            v["buffers"] = variables["buffers"]["backbone"]
        return v

    bb_vars = split_bb(variables)

    def backbone_only(z, bb_vars, img):
        x = (img.astype(jnp.float32) + z - mean) / std
        return bb.apply(bb_vars, x.astype(dtype))

    def full_fwd(z, variables, img):
        return det.module.apply(variables, img + z.astype(img.dtype))

    def full_predict(z, variables, img):
        b = dict(batch)
        b["image"] = img + z.astype(img.dtype)
        return det.predict(variables, b)

    t_bb = timed(backbone_only, (bb_vars, img), K)
    t_fwd = timed(full_fwd, (variables, img), K)
    t_full = timed(full_predict, (variables, img), K)

    # -------- decode stage bisection (mirrors CornerNet.predict internals;
    # probe-only duplication to attribute the decode cost) --------
    from flax import linen as fnn
    from slenderobjdet_tpu.ops.nms import batched_nms

    Kc = det.topk_corners

    def corners_stage(z, variables, img, upto):
        outs = det.module.apply(variables, img + z.astype(img.dtype))
        (tl_heat, tl_tag, tl_off), (br_heat, br_tag, br_off) = outs[-1]
        Bc, Hc, Wc, Cc = tl_heat.shape

        def corners(heat, tag, off):
            p = jax.nn.sigmoid(heat)
            pooled = fnn.max_pool(p, (3, 3), strides=(1, 1), padding="SAME")
            p = jnp.where(p == pooled, p, 0.0)
            flat = p.reshape(Bc, Hc * Wc * Cc)
            scores, idx = jax.lax.top_k(flat, Kc)
            cls = (idx % Cc).astype(jnp.int32)
            loc = idx // Cc
            iy = (loc // Wc).astype(jnp.float32)
            ix = (loc % Wc).astype(jnp.float32)
            t = jnp.take_along_axis(tag.reshape(Bc, Hc * Wc), loc, axis=1)
            o = jnp.take_along_axis(off.reshape(Bc, Hc * Wc, 2),
                                    loc[..., None], axis=1)
            x = (ix + o[..., 0]) * det.stride
            y = (iy + o[..., 1]) * det.stride
            return scores, cls, x, y, t

        ts, tc, tx, ty, ttag = corners(tl_heat, tl_tag, tl_off)
        bs, bc, bx, by, btag = corners(br_heat, br_tag, br_off)
        if upto == "topk":
            return ts, tc, tx, ty, ttag, bs, bc, bx, by, btag

        score = (ts[:, :, None] + bs[:, None, :]) / 2
        same = tc[:, :, None] == bc[:, None, :]
        geom = (bx[:, None, :] > tx[:, :, None]) & (
            by[:, None, :] > ty[:, :, None])
        tagd = jnp.abs(ttag[:, :, None] - btag[:, None, :]) < 0.5
        score = jnp.where(same & geom & tagd, score, 0.0)
        flat_score = score.reshape(Bc, Kc * Kc)
        k2 = min(det.max_dets * 4, Kc * Kc)
        top, idx = jax.lax.top_k(flat_score, k2)
        ti = idx // Kc
        bi = idx % Kc
        boxes = jnp.stack([
            jnp.take_along_axis(tx, ti, 1), jnp.take_along_axis(ty, ti, 1),
            jnp.take_along_axis(bx, bi, 1), jnp.take_along_axis(by, bi, 1),
        ], axis=-1)
        classes = jnp.take_along_axis(tc, ti, 1)
        det_valid = top > 0.05
        if upto == "pair":
            return boxes, top, classes, det_valid

        def one(bx_, sc, cl, vl):
            keep_idx, keep_valid = batched_nms(bx_, sc, cl, 0.5,
                                               det.max_dets, valid=vl)
            return bx_[keep_idx], sc[keep_idx], cl[keep_idx], keep_valid

        return jax.vmap(one)(boxes, top, classes, det_valid)

    if args.stages:
        t_topk = timed(lambda z, v, im: corners_stage(z, v, im, "topk"),
                       (variables, img), K)
        t_pair = timed(lambda z, v, im: corners_stage(z, v, im, "pair"),
                       (variables, img), K)
        t_nms = timed(lambda z, v, im: corners_stage(z, v, im, "nms"),
                      (variables, img), K)
        print(f"  decode stages (vs fwd {t_fwd * 1e3:.2f} ms; NOTE the"
              " [..., :1] fetch lets XLA DCE differently per stage —"
              " cross-check against the full-predict delta. NOTE also:"
              " '+corner topk' replicates the PRE-round-3 flat H*W*C"
              " lax.top_k, NOT current predict's pair_top_k — it is the"
              " before side of that A/B; 'full predict' times the real"
              " path):")
        print(f"    +corner topk   {(t_topk - t_fwd) * 1e3:8.2f} ms/batch")
        print(f"    +pairing       {(t_pair - t_topk) * 1e3:8.2f} ms/batch")
        print(f"    +NMS           {(t_nms - t_pair) * 1e3:8.2f} ms/batch")

    print(f"B={B} {H}x{W}:")
    print(f"  hourglass backbone {t_bb * 1e3:8.2f} ms  ({t_bb / B * 1e3:.2f} ms/img)")
    print(f"  +pools/heads       {t_fwd * 1e3:8.2f} ms  (+{(t_fwd - t_bb) / B * 1e3:.2f} ms/img)")
    print(f"  full predict       {t_full * 1e3:8.2f} ms  (+{(t_full - t_fwd) / B * 1e3:.2f} ms/img decode)")
    print(f"  total              {t_full / B * 1e3:.2f} ms/img ({B / t_full:.1f} img/s)")


if __name__ == "__main__":
    main()
