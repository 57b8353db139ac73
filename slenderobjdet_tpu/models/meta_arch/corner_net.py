"""CornerNet, TPU-native.

Counterpart of `slender_det/modeling/meta_arch/corner_net.py:17-140`
(hourglass + TL/BR corner pools + heat/tag/offset heads). The reference left
the training losses unimplemented (`corner_net.py:70-76` raises); this build
completes them with the standard CornerNet objectives:
- penalty-reduced focal loss on gaussian-splatted corner heatmaps
- pull/push associative-embedding loss on corner tags
- L1 loss on sub-stride corner offsets

All gt rendering (gaussian splat at corner locations) happens in-graph over
fixed-shape padded gt, so the whole step stays one compiled program.

Inference: per-class top-k corners from NMS-ed (3x3 max-pool) heatmaps,
TL x BR pairing by tag distance with geometric/class validity, standard
CornerNet decode.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.corner_pool import br_pool, tl_pool
from ...ops.nms import batched_nms
from ...ops.topk import pair_top_k
from ...structures import boxes as box_ops
from ..backbones.hourglass import ConvBNRelu, build_hourglass_backbone


class CornerHead(nn.Module):
    """TL or BR branch: corner pool + heat/tag/offset convs."""

    num_classes: int
    corner: str                    # "tl" | "br"
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        p1 = ConvBNRelu(128, 3, 1, self.norm, dtype=self.dtype, name="pool_conv1")(x)
        p2 = ConvBNRelu(128, 3, 1, self.norm, dtype=self.dtype, name="pool_conv2")(x)
        pooled = tl_pool(p1, p2) if self.corner == "tl" else br_pool(p1, p2)
        pooled = ConvBNRelu(c, 3, 1, self.norm, relu=False, dtype=self.dtype,
                            name="pool_out")(pooled)
        skip = ConvBNRelu(c, 1, 1, self.norm, relu=False, dtype=self.dtype,
                          name="skip")(x)
        feat = nn.relu(pooled + skip)
        feat = ConvBNRelu(c, 3, 1, self.norm, dtype=self.dtype, name="feat")(feat)

        def out_conv(channels, name, bias=None):
            kwargs = {}
            if bias is not None:
                kwargs["bias_init"] = nn.initializers.constant(bias)
            h = nn.relu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"{name}_conv")(feat))
            return nn.Conv(channels, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name=f"{name}_out",
                           **kwargs)(h).astype(jnp.float32)

        heat = out_conv(self.num_classes, "heat",
                        bias=-math.log((1 - 0.1) / 0.1))
        tag = out_conv(1, "tag")
        offset = out_conv(2, "offset")
        return heat, tag[..., 0], offset


class CornerNetModule(nn.Module):
    backbone: nn.Module
    num_classes: int
    in_features: Tuple[str, ...]
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        x = images.astype(jnp.float32)
        x = (x - jnp.asarray(self.pixel_mean)) / jnp.asarray(self.pixel_std)
        x = x.astype(self.dtype)
        feats = self.backbone(x)
        outs = []
        for i, f in enumerate(self.in_features):
            tl = CornerHead(self.num_classes, "tl", self.norm,
                            dtype=self.dtype, name=f"tl_head{i}")(feats[f])
            br = CornerHead(self.num_classes, "br", self.norm,
                            dtype=self.dtype, name=f"br_head{i}")(feats[f])
            outs.append((tl, br))
        return outs


def render_corner_targets(hw, stride, gt_boxes, gt_classes, gt_valid,
                          num_classes):
    """Gaussian-splatted corner heatmaps + exact-corner indices for one image.
    Returns (tl_heat (H,W,C), br_heat, tl_pos (G,2) int yx, br_pos, radius)."""
    H, W = hw
    x1 = gt_boxes[:, 0] / stride
    y1 = gt_boxes[:, 1] / stride
    x2 = gt_boxes[:, 2] / stride
    y2 = gt_boxes[:, 3] / stride
    w = x2 - x1
    h = y2 - y1
    # gaussian radius ~ 1/3 of min side (simplified CornerNet radius rule)
    radius = jnp.maximum(jnp.minimum(w, h) / 3.0, 1.0)

    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]

    def splat(cx, cy):
        # (H, W, G) gaussians
        d2 = (xs[..., None] - cx[None, None, :]) ** 2 + (
            ys[..., None] - cy[None, None, :]) ** 2
        sigma2 = (2 * radius / 3.0) ** 2 / 4.0
        g = jnp.exp(-d2 / jnp.maximum(2 * sigma2[None, None, :], 1e-6))
        g = jnp.where(gt_valid[None, None, :], g, 0.0)
        onehot = jax.nn.one_hot(gt_classes, num_classes)      # (G, C)
        return jnp.max(g[:, :, :, None] * onehot[None, None], axis=2)

    tl_heat = splat(x1, y1)
    br_heat = splat(x2, y2)
    tl_pos = jnp.stack([jnp.clip(y1, 0, H - 1), jnp.clip(x1, 0, W - 1)], -1)
    br_pos = jnp.stack([jnp.clip(y2, 0, H - 1), jnp.clip(x2, 0, W - 1)], -1)
    return tl_heat, br_heat, tl_pos, br_pos


def corner_focal_loss(pred_logits, gt_heat, num_pos):
    """Penalty-reduced pixelwise focal loss (CornerNet eq. 1)."""
    p = jax.nn.sigmoid(pred_logits)
    pos = gt_heat >= 0.999
    pos_loss = -jnp.log(jnp.clip(p, 1e-6)) * (1 - p) ** 2
    neg_loss = -jnp.log(jnp.clip(1 - p, 1e-6)) * p ** 2 * (1 - gt_heat) ** 4
    loss = jnp.sum(jnp.where(pos, pos_loss, neg_loss))
    return loss / jnp.maximum(num_pos, 1.0)


class CornerNet:
    def __init__(self, cfg):
        self.cfg = cfg
        self.int8_predict = cfg.TPU.INT8_PREDICT
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        c = cfg.MODEL.CORNER_NET
        self.num_classes = c.NUM_CLASSES
        self.in_features = list(c.IN_FEATURES)
        self.stride = 4
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
        self.topk_corners = 100
        self.approx_topk = cfg.TPU.APPROX_TOPK

        spec = build_hourglass_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        self.module = CornerNetModule(
            backbone=spec.module,
            num_classes=self.num_classes,
            in_features=tuple(self.in_features),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            norm=c.NORM,
            dtype=dtype,
        )

    def init_variables(self, rng, image_hw=(128, 128), batch_size=1):
        del image_hw, batch_size
        return jax.jit(self.module.init)(
            rng, jnp.zeros((1, 128, 128, 3), jnp.float32)
        )

    # ------------------------------------------------------------------ loss
    def loss(self, variables, batch):
        from ..layers import apply_train

        images = batch["image"]
        outs, updated_buffers = apply_train(self.module, variables, images)
        H, W = outs[-1][0][0].shape[1:3]

        gt_boxes = batch["gt_boxes"]
        gt_classes = batch["gt_classes"]
        gt_valid = batch["gt_valid"]
        B, G = gt_classes.shape

        tl_heat_t, br_heat_t, tl_pos, br_pos = jax.vmap(
            lambda b, c, v: render_corner_targets(
                (H, W), self.stride, b, c, v, self.num_classes)
        )(gt_boxes, gt_classes, gt_valid)

        num_pos = jnp.maximum(jnp.sum(gt_valid), 1.0)
        total_heat = 0.0
        total_pull = 0.0
        total_push = 0.0
        total_off = 0.0
        for (tl, br) in outs:  # intermediate supervision over stacks
            tl_heat, tl_tag, tl_off = tl
            br_heat, br_tag, br_off = br
            total_heat = total_heat + corner_focal_loss(tl_heat, tl_heat_t, num_pos)
            total_heat = total_heat + corner_focal_loss(br_heat, br_heat_t, num_pos)

            def gather_at(maps, pos):
                # maps (B,H,W,...) ; pos (B,G,2) float yx -> (B,G,...)
                iy = jnp.clip(pos[..., 0].astype(jnp.int32), 0, H - 1)
                ix = jnp.clip(pos[..., 1].astype(jnp.int32), 0, W - 1)
                flat = maps.reshape(B, H * W, *maps.shape[3:])
                return jnp.take_along_axis(
                    flat,
                    (iy * W + ix).reshape(B, G, *([1] * (flat.ndim - 2))),
                    axis=1,
                )

            ttag = gather_at(tl_tag[..., None], tl_pos)[..., 0]   # (B,G)
            btag = gather_at(br_tag[..., None], br_pos)[..., 0]
            mean = (ttag + btag) / 2
            pull = jnp.where(gt_valid, (ttag - mean) ** 2 + (btag - mean) ** 2, 0.0)
            total_pull = total_pull + jnp.sum(pull) / num_pos

            # push: means of different objects should separate
            dist = jnp.abs(mean[:, :, None] - mean[:, None, :])
            pair_valid = gt_valid[:, :, None] & gt_valid[:, None, :]
            eye = jnp.eye(G, dtype=bool)[None]
            push = jnp.clip(1.0 - dist, 0.0, None)
            push = jnp.where(pair_valid & ~eye, push, 0.0)
            total_push = total_push + jnp.sum(push) / jnp.maximum(
                num_pos * (num_pos - 1), 1.0)

            toff = gather_at(tl_off, tl_pos)                      # (B,G,2)
            boff = gather_at(br_off, br_pos)
            tl_frac = tl_pos - jnp.floor(tl_pos)
            br_frac = br_pos - jnp.floor(br_pos)
            off_l1 = jnp.abs(toff - tl_frac[..., ::-1]) + jnp.abs(
                boff - br_frac[..., ::-1])
            total_off = total_off + jnp.sum(
                jnp.where(gt_valid[..., None], off_l1, 0.0)) / num_pos

        total = total_heat + 0.1 * total_pull + 0.1 * total_push + total_off
        metrics = {
            "loss_heat": total_heat,
            "loss_pull": total_pull,
            "loss_push": total_push,
            "loss_offset": total_off,
            "num_pos": num_pos,
        }
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    # ------------------------------------------------------------- inference
    def predict(self, variables, batch):
        from ...ops.quant import int8_predict_scope

        images = batch["image"]
        with int8_predict_scope(self.int8_predict):
            outs = self.module.apply(variables, images)
        (tl_heat, tl_tag, tl_off), (br_heat, br_tag, br_off) = outs[-1]
        B, H, W, C = tl_heat.shape
        K = self.topk_corners

        def corners(heat, tag, off):
            p = jax.nn.sigmoid(heat)
            # 3x3 max-pool NMS
            pooled = nn.max_pool(p, (3, 3), strides=(1, 1), padding="SAME")
            p = jnp.where(p == pooled, p, 0.0)
            # two-stage location-first top-k (ops.topk.pair_top_k): sorts
            # K*C instead of H*W*C elements (the flat sort over ~2M elements
            # dominated CornerNet decode; VALIDATION.md round-3 notes).
            # With approx=False the selection is IDENTICAL to the flat
            # (H*W*C) top_k; with approx=True (TPU.APPROX_TOPK default) both
            # stages use approx_max_k (recall target 0.99/stage). Measured
            # on-chip with tools/approx_topk_recall.py (v5e, corner-style
            # sparse peaks, 128x128x80, K=100, 32 images): approx-vs-exact
            # corner-set recall 3200/3200 = 1.0000 (VALIDATION.md round 4).
            scores, loc, cls = pair_top_k(
                p.reshape(B, H * W, C), K, approx=self.approx_topk)
            iy = (loc // W).astype(jnp.float32)
            ix = (loc % W).astype(jnp.float32)
            t = jnp.take_along_axis(tag.reshape(B, H * W), loc, axis=1)
            o = jnp.take_along_axis(off.reshape(B, H * W, 2),
                                    loc[..., None], axis=1)
            x = (ix + o[..., 0]) * self.stride
            y = (iy + o[..., 1]) * self.stride
            return scores, cls, x, y, t

        ts, tc, tx, ty, ttag = corners(tl_heat, tl_tag, tl_off)
        bs, bc, bx, by, btag = corners(br_heat, br_tag, br_off)

        # pair all TLxBR: valid if same class, br right/below tl, tag close
        score = (ts[:, :, None] + bs[:, None, :]) / 2
        same = tc[:, :, None] == bc[:, None, :]
        geom = (bx[:, None, :] > tx[:, :, None]) & (by[:, None, :] > ty[:, :, None])
        tagd = jnp.abs(ttag[:, :, None] - btag[:, None, :]) < 0.5
        valid = same & geom & tagd
        score = jnp.where(valid, score, 0.0)

        flat_score = score.reshape(B, K * K)
        k2 = min(self.max_dets * 4, K * K)
        top, idx = jax.lax.top_k(flat_score, k2)
        ti = idx // K
        bi = idx % K

        boxes = jnp.stack([
            jnp.take_along_axis(tx, ti, 1), jnp.take_along_axis(ty, ti, 1),
            jnp.take_along_axis(bx, bi, 1), jnp.take_along_axis(by, bi, 1),
        ], axis=-1)
        classes = jnp.take_along_axis(tc, ti, 1)
        det_valid = top > 0.05

        def one(bx_, sc, cl, vl, scale, orig_hw):
            keep_idx, keep_valid = batched_nms(bx_, sc, cl, 0.5,
                                               self.max_dets, valid=vl)
            kb = bx_[keep_idx] / scale
            kb = box_ops.clip(kb, orig_hw[0], orig_hw[1])
            return kb, sc[keep_idx], cl[keep_idx], keep_valid

        ob, os_, oc, ov = jax.vmap(one)(
            boxes, top, classes, det_valid,
            batch["scale"].astype(jnp.float32),
            batch["orig_size"].astype(jnp.float32),
        )
        return {"boxes": ob, "scores": os_, "classes": oc, "valid": ov}
