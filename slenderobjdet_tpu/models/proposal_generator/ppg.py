"""PointsProposalGenerator, TPU-native.

Counterpart of the reference's `PointsProposalGenerator`
(`slender_det/modeling/proposal_generator/ppg.py:154-255`) and its loss
machinery (`PointsProposalOutputs`, ppg.py:53-152):

- head (ppg.py:183-192): one shared 3x3 conv + ReLU, a zero-initialized 1x1
  conv emitting 2P point offsets and a 1x1 conv emitting the in-object logit
- offsets are rescaled as exp(raw * stride) - 1 (ppg.py:195-201) and added
  to an image-coordinate grid of linspace(0, W_img-1, W_feat) per level
  (offsets2coordinates, ppg.py:33-50), clamped to the image
- objectness supervision (gt_logit, ppg.py:77-134): the gt SIZE-magnitude
  map |(w,h)| (rendered by structures/borders.BorderMasks.masks and fed as
  batch["size_map"]) is nearest-downsampled per level; targets are 1 where
  the size falls in the level's band (32/64/128/inf), 0 on background,
  ignored (-1) on off-band object pixels; BCE averaged over non-ignored
- the likelihood losses on sampled coordinates exist as `likelihood_loss`
  (ppg.py:14-31) and are wired with the reference's LITERAL zero weight
  (ppg.py:124-125: `border_points.sum() * 0`)
- proposals (predict_proposals, ppg.py:137-149): min/max over the P point
  coordinates per location, selected by topk + NMS
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import optax_sigmoid_ce
from ...ops.nms import nms_select
from ...structures import boxes as box_ops
from ..backbones.fpn import build_backbone


def grid_sample_bilinear(target: jnp.ndarray, coords: jnp.ndarray
                         ) -> jnp.ndarray:
    """torch.F.grid_sample(align_corners=False, zero padding) on a (H, W)
    target with normalized coords (..., 2) in [-1, 1], (x, y) order."""
    H, W = target.shape
    x = ((coords[..., 0] + 1.0) * W - 1.0) / 2.0
    y = ((coords[..., 1] + 1.0) * H - 1.0) / 2.0
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def fetch(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return jnp.where(inb, target[yi, xi], 0.0)

    v00 = fetch(x0, y0)
    v01 = fetch(x0 + 1, y0)
    v10 = fetch(x0, y0 + 1)
    v11 = fetch(x0 + 1, y0 + 1)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def likelihood_loss(target: jnp.ndarray, coordinates: jnp.ndarray,
                    mask: jnp.ndarray = None) -> jnp.ndarray:
    """Exact counterpart of the reference's `likelyhood_loss` (ppg.py:14-31):
    target (B, H, W) distributions with max 1; coordinates (B, P, Hf, Wf, 2)
    normalized sampling points ((x, y) in [-1, 1]); returns (B, P)
    -log(mean spatial likelihood + 1e-8). `mask` (B, H, W) optionally gates
    the sampled likelihoods."""
    def one(tgt, coords, msk):
        lk = grid_sample_bilinear(tgt, coords)          # (P, Hf, Wf)
        if msk is not None:
            lk = lk * grid_sample_bilinear(msk.astype(jnp.float32), coords)
        return -jnp.log(lk.mean(axis=(1, 2)) + 1e-8)

    if mask is None:
        return jax.vmap(lambda t, c: one(t, c, None))(target, coordinates)
    return jax.vmap(one)(target, coordinates, mask)


class PPGHead(nn.Module):
    num_points: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        c = feats[0].shape[-1]
        init = nn.initializers.normal(stddev=0.01)
        conv = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=init, name="conv")
        # zero-initialized offsets (reference ppg.py:190-191)
        offsets = nn.Conv(self.num_points * 2, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32,
                          kernel_init=nn.initializers.zeros, name="offsets")
        obj = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=init, name="in_object_logits")
        logits, raw_offsets = [], []
        for f in feats:
            b, h, w, _ = f.shape
            t = nn.relu(conv(f))
            logits.append(obj(t).astype(jnp.float32).reshape(b, h, w))
            raw_offsets.append(offsets(t).astype(jnp.float32))
        return logits, raw_offsets


class _PPGModule(nn.Module):
    backbone: nn.Module
    head: PPGHead
    in_features: Tuple[str, ...]
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    dtype: Any = jnp.float32

    def __call__(self, images):
        x = images.astype(jnp.float32)
        x = (x - jnp.asarray(self.pixel_mean)) / jnp.asarray(self.pixel_std)
        x = x.astype(self.dtype)
        feats = self.backbone(x)
        return self.head([feats[f] for f in self.in_features])


class PointsProposalGenerator:
    """Proposal-only detector built on dense point-set proposals."""

    SIZE_BANDS = (32.0, 64.0, 128.0, -1.0)  # reference losses(sizes=...) arg

    def __init__(self, cfg):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        pg = cfg.MODEL.PROPOSAL_GENERATOR
        self.in_features = list(pg.IN_FEATURES)
        if self.in_features == ["p5"]:  # unset default -> the RPN features
            self.in_features = list(cfg.MODEL.RPN.IN_FEATURES)
        self.num_points = pg.NUM_POINTS
        self.nms_thresh = 0.7                       # hardcoded upstream :168
        self.post_topk = cfg.MODEL.RPN.POST_NMS_TOPK_TEST
        self.min_size = pg.MIN_SIZE
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE

        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        self.strides = [spec.strides[f] for f in self.in_features]
        self.module = _PPGModule(
            backbone=spec.module,
            head=PPGHead(num_points=self.num_points, dtype=dtype),
            in_features=tuple(self.in_features),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            dtype=dtype,
        )

    def init_variables(self, rng, image_hw=(128, 128), batch_size=1):
        del image_hw, batch_size
        return jax.jit(self.module.init)(
            rng, jnp.zeros((1, 128, 128, 3), jnp.float32)
        )

    # ----------------------------------------------------------- geometry
    def _coordinates(self, raw_offsets, image_hw):
        """Per level: (B, H, W, P, 2) point coordinates in image pixels
        (offsets2coordinates + rescale, ppg.py:33-50,195-201)."""
        H, W = image_hw
        coords = []
        for off in raw_offsets:
            b, h, w, _ = off.shape
            stride = W / w
            off = jnp.exp(off * stride) - 1.0           # rescale
            off = off.reshape(b, h, w, self.num_points, 2)
            xs = jnp.linspace(0.0, W - 1.0, w)
            ys = jnp.linspace(0.0, H - 1.0, h)
            grid = jnp.stack(jnp.meshgrid(xs, ys), axis=-1)  # (h, w, 2)
            pts = off + grid[None, :, :, None, :]
            pts = jnp.stack([
                jnp.clip(pts[..., 0], 0, W - 1),
                jnp.clip(pts[..., 1], 0, H - 1),
            ], axis=-1)
            coords.append(pts)
        return coords

    @staticmethod
    def _proposal_boxes(coords):
        """min/max over the P points -> (B, H*W, 4) per level."""
        out = []
        for pts in coords:
            b, h, w = pts.shape[:3]
            x1 = pts[..., 0].min(-1)
            y1 = pts[..., 1].min(-1)
            x2 = pts[..., 0].max(-1)
            y2 = pts[..., 1].max(-1)
            out.append(jnp.stack([x1, y1, x2, y2], -1).reshape(b, h * w, 4))
        return out

    # ---------------------------------------------------------------- loss
    def loss(self, variables, batch):
        from ..layers import apply_train

        images = batch["image"]
        H, W = images.shape[1:3]
        (logits_l, raw_off_l), updated_buffers = apply_train(
            self.module, variables, images)
        coords_l = self._coordinates(raw_off_l, (H, W))

        # gt size magnitude |(w,h)| per pixel (ppg.py:69: sqrt(sum sq))
        if "size_map" in batch:
            gt_sizes = jnp.sqrt(jnp.sum(batch["size_map"] ** 2, axis=-1))
        else:
            # fallback: rasterize from padded gt boxes (diagonal magnitude)
            gt_sizes = _sizes_from_boxes(
                batch["gt_boxes"], batch["gt_valid"], (H, W)
            )

        metrics: Dict[str, jnp.ndarray] = {}
        total = 0.0
        lower = 0.0
        bands = list(self.SIZE_BANDS)
        while len(bands) < len(logits_l):
            bands.insert(-1, bands[-2] * 2)
        for lvl, logits in enumerate(logits_l):
            upper = bands[lvl] if bands[lvl] > 0 else 102400.0
            b, h, w = logits.shape
            stride_y = max(H // h, 1)
            stride_x = max(W // w, 1)
            # nearest downsample (F.interpolate nearest: index i*stride)
            g = gt_sizes[:, ::stride_y, ::stride_x][:, :h, :w]
            base = (g == 0).astype(jnp.float32) - 1.0   # bg 0, object -1
            in_band = ((g > lower) & (g <= upper)).astype(jnp.float32)
            gt_logit = in_band * 2.0 + base             # bg 0, band 1, else -1
            lower = upper

            pos_mask = gt_logit >= 0
            bce = optax_sigmoid_ce(logits, jnp.clip(gt_logit, 0.0, 1.0))
            obj = jnp.sum(jnp.where(pos_mask, bce, 0.0)) / (
                jnp.sum(pos_mask) + 1e-5
            )
            metrics[f"objectness_loss_{lvl}"] = obj
            total = total + obj

            # the reference wires the likelihood losses with weight ZERO
            # (ppg.py:124-125); keep its exact (dead) gradient path
            pts = coords_l[lvl]
            metrics[f"border_likely_loss_{lvl}"] = jnp.sum(pts) * 0.0
            metrics[f"center_likely_loss_{lvl}"] = (
                jnp.sum(pts[:, :, :, self.num_points // 2]) * 0.0
            )
            total = total + metrics[f"border_likely_loss_{lvl}"]

        metrics["num_pos"] = jnp.sum(gt_sizes > 0)
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    # ------------------------------------------------------------ inference
    def predict(self, variables, batch):
        images = batch["image"]
        H, W = images.shape[1:3]
        logits_l, raw_off_l = self.module.apply(variables, images)
        coords_l = self._coordinates(raw_off_l, (H, W))
        boxes_l = self._proposal_boxes(coords_l)

        cb, cs = [], []
        for logits, boxes in zip(logits_l, boxes_l):
            b = logits.shape[0]
            scores = jax.nn.sigmoid(logits).reshape(b, -1)
            k = min(1000, scores.shape[1])
            top, idx = jax.lax.top_k(scores, k)
            cb.append(jnp.take_along_axis(boxes, idx[..., None], axis=1))
            cs.append(top)
        boxes = jnp.concatenate(cb, axis=1)
        scores = jnp.concatenate(cs, axis=1)

        def one(bx, sc, scale, orig_hw):
            wh_ok = ((bx[:, 2] - bx[:, 0]) > self.min_size) & (
                (bx[:, 3] - bx[:, 1]) > self.min_size
            )
            sc = jnp.where(wh_ok, sc, 0.0)
            keep_idx, keep_valid = nms_select(bx, sc, self.nms_thresh,
                                              self.max_dets)
            kb = box_ops.clip(bx[keep_idx] / scale, orig_hw[0], orig_hw[1])
            return kb, sc[keep_idx], keep_valid

        ob, os_, ov = jax.vmap(one)(
            boxes, scores, batch["scale"].astype(jnp.float32),
            batch["orig_size"].astype(jnp.float32),
        )
        return {
            "boxes": ob, "scores": os_,
            "classes": jnp.zeros(os_.shape, jnp.int32), "valid": ov,
            "proposals": ob, "proposal_scores": os_, "proposal_valid": ov,
        }


def _sizes_from_boxes(gt_boxes, gt_valid, image_hw):
    """(B, H, W) size-magnitude map rasterized from axis-aligned boxes (the
    test-time stand-in for the polygon-rendered size map)."""
    H, W = image_hw
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)

    def one(boxes, valid):
        inside = (
            (xs[None, None, :] >= boxes[:, None, None, 0])
            & (xs[None, None, :] <= boxes[:, None, None, 2])
            & (ys[None, :, None] >= boxes[:, None, None, 1])
            & (ys[None, :, None] <= boxes[:, None, None, 3])
            & valid[:, None, None]
        )
        mag = jnp.sqrt(
            (boxes[:, 2] - boxes[:, 0]) ** 2 + (boxes[:, 3] - boxes[:, 1]) ** 2
        )
        return jnp.max(jnp.where(inside, mag[:, None, None], 0.0), axis=0)

    return jax.vmap(one)(gt_boxes, gt_valid)
