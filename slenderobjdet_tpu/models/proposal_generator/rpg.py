"""RepPointsGenerator — the RepPoints init stage as an RPN, TPU-native.

Counterpart of the reference's `RepPointsGenerator` + `RepPointsInitHead` +
`RepPointsGeneratorResult` (`slender_det/modeling/proposal_generator/
rpg.py:45-390`):

- head (rpg.py:45-104): two branches of 3x[3x3 conv + norm + ReLU]; the
  objectness branch ends in a 3x3 conv -> 1 logit, the deltas branch in a
  1x1 conv -> 2P offsets in IMAGE pixels (added directly to the center
  grid); a learnable 2-vector moment_transfer with moment_mul 0.01 decodes
  point sets to boxes via the moment transform (points2bbox, rpg.py:106-144).
  The per-branch BatchNorm2d matches the reference (layers.BatchNorm:
  running stats in buffers, batch statistics global under a sharded jit).
- assignment (rpg.py:267-307): SAMPLE_MODE 'points' -> nearest-point match,
  'inside' -> stride-cell inside match (shared with meta_arch/reppoints.py).
- losses (rpg.py:164-197): focal (alpha .25) with OHEM-style negatives —
  positives averaged, plus the mean of the top-(3x#pos) negative losses;
  smooth-L1(beta .11) on boxes normalized by stride*4, averaged over
  positives; both scaled by MODEL.RPN.LOSS_WEIGHT.
- proposals: per-level topk + NMS over the decoded init boxes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.nms import nms_select
from ...structures import boxes as box_ops
from ..anchors import feature_map_shapes
from ..backbones.fpn import build_backbone
from ..layers import BatchNorm
from ..meta_arch.reppoints import (
    inside_assign,
    points2bbox,
    rep_points_assign,
)


class RepPointsInitHead(nn.Module):
    num_points: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        c = feats[0].shape[-1]
        init = nn.initializers.normal(stddev=0.01)

        def branch(prefix):
            # BatchNorm matches the reference head exactly (rpg.py:45-104,
            # nn.BatchNorm2d per conv); layers.BatchNorm keeps running stats
            # in buffers and is SyncBN under a sharded jit (round 3 — the
            # earlier GN substitution predates trainable BN support).
            return [
                (nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                         param_dtype=jnp.float32, kernel_init=init,
                         name=f"{prefix}_conv{i}"),
                 BatchNorm(c, name=f"{prefix}_norm{i}"))
                for i in range(3)
            ]

        obj_tower = branch("objectness")
        delta_tower = branch("deltas")
        obj_out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                          param_dtype=jnp.float32, kernel_init=init,
                          name="objectness_out")
        delta_out = nn.Conv(self.num_points * 2, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=init,
                            name="deltas_out")
        moment_transfer = self.param(
            "moment_transfer", nn.initializers.zeros, (2,), jnp.float32
        )

        logits, deltas = [], []
        for f in feats:
            b, h, w, _ = f.shape
            t1, t2 = f, f
            for conv, gn in obj_tower:
                t1 = nn.relu(gn(conv(t1)))
            for conv, gn in delta_tower:
                t2 = nn.relu(gn(conv(t2)))
            logits.append(obj_out(t1).astype(jnp.float32).reshape(b, h * w))
            deltas.append(
                delta_out(t2).astype(jnp.float32)
                .reshape(b, h * w, self.num_points * 2)
            )
        return logits, deltas, moment_transfer


class _RPGModule(nn.Module):
    backbone: nn.Module
    head: RepPointsInitHead
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


class RepPointsGenerator:
    """Proposal-only detector over the RepPoints init stage."""

    def __init__(self, cfg):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        self.in_features = list(cfg.MODEL.RPN.IN_FEATURES)
        self.num_points = cfg.MODEL.PROPOSAL_GENERATOR.NUM_POINTS
        self.sample_mode = cfg.MODEL.PROPOSAL_GENERATOR.SAMPLE_MODE
        self.nms_thresh = cfg.MODEL.RPN.NMS_THRESH
        self.post_topk = cfg.MODEL.RPN.POST_NMS_TOPK_TEST
        self.min_size = cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE
        self.loss_weight = cfg.MODEL.RPN.LOSS_WEIGHT
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE

        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        self.strides = [spec.strides[f] for f in self.in_features]
        self.module = _RPGModule(
            backbone=spec.module,
            head=RepPointsInitHead(num_points=self.num_points, dtype=dtype),
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

    def _centers(self, image_hw):
        shapes = feature_map_shapes(image_hw, self.strides)
        centers, counts, lvls = [], [], []
        for (h, w), s in zip(shapes, self.strides):
            xs = np.arange(w, dtype=np.float32) * s
            ys = np.arange(h, dtype=np.float32) * s
            xg, yg = np.meshgrid(xs, ys)
            centers.append(np.stack([xg.reshape(-1), yg.reshape(-1)], 1))
            counts.append(h * w)
            lvls.append(np.full(h * w, int(np.log2(s)), np.int32))
        return np.concatenate(centers), counts, np.concatenate(lvls)

    def _decode(self, deltas_l, moment_transfer, centers_np, counts):
        """Point offsets are in image pixels (stride 1 decode, moment
        transform; rpg.py:106-144)."""
        offsets = np.concatenate([[0], np.cumsum(counts)])
        boxes = []
        for i, deltas in enumerate(deltas_l):
            c = jnp.asarray(centers_np[offsets[i]: offsets[i + 1]])
            boxes.append(
                points2bbox(deltas, c, 1.0, method="moment",
                            moment_transfer=moment_transfer)
            )
        return boxes

    def _assign(self, centers_np, lvls_np, stride_per_loc, batch):
        centers = jnp.asarray(centers_np)
        lvls = jnp.asarray(lvls_np)
        lvl_min = int(np.log2(self.strides[0]))
        lvl_max = int(np.log2(self.strides[-1]))
        if self.sample_mode == "inside":
            return jax.vmap(
                partial(inside_assign, lvl_min=lvl_min, lvl_max=lvl_max),
                in_axes=(None, None, None, 0, 0),
            )(centers, lvls, stride_per_loc,
              batch["gt_boxes"], batch["gt_valid"])
        return jax.vmap(
            partial(rep_points_assign, lvl_min=lvl_min, lvl_max=lvl_max,
                    pos_num=1),
            in_axes=(None, None, 0, 0),
        )(centers, lvls, batch["gt_boxes"], batch["gt_valid"])

    # ---------------------------------------------------------------- loss
    def loss(self, variables, batch):
        images = batch["image"]
        centers_np, counts, lvls_np = self._centers(images.shape[1:3])
        from ..layers import apply_train

        (logits_l, deltas_l, mt), updated_buffers = apply_train(
            self.module, variables, images)
        boxes = jnp.concatenate(
            self._decode(deltas_l, mt, centers_np, counts), axis=1)
        logits = jnp.concatenate(logits_l, axis=1)          # (B, X)

        stride_per_loc = jnp.asarray(np.concatenate([
            np.full(c, s, np.float32) for c, s in zip(counts, self.strides)
        ]))
        obj, gt_boxes = self._assign(centers_np, lvls_np, stride_per_loc,
                                     batch)
        pos = obj > 0

        # focal with OHEM negatives (rpg.py:175-186): pos mean + mean of the
        # top-(3x#pos) negative losses, fixed-shape via a rank mask
        cls_all = sigmoid_focal_loss(
            logits[..., None], pos.astype(jnp.float32)[..., None],
            alpha=0.25, gamma=2.0,
        ).squeeze(-1)                                       # (B, X)
        pos_count = jnp.sum(pos)
        pos_mean = jnp.sum(jnp.where(pos, cls_all, 0.0)) / jnp.maximum(
            pos_count, 1.0)

        neg_losses = jnp.where(pos, -jnp.inf, cls_all).reshape(-1)
        neg_sorted = jnp.sort(neg_losses)[::-1]
        neg_count = jnp.minimum(jnp.sum(~pos), pos_count * 3)
        rank = jnp.arange(neg_sorted.shape[0])
        picked = (rank < neg_count) & jnp.isfinite(neg_sorted)
        neg_mean = jnp.sum(jnp.where(picked, neg_sorted, 0.0)) / jnp.maximum(
            neg_count, 1.0)
        cls_loss = pos_mean + neg_mean

        # smooth-L1 on boxes / (stride*4), mean over positive elements
        norm = (stride_per_loc * 4.0)[None, :, None]
        safe_gt = jnp.where(pos[..., None], gt_boxes, 1.0)
        reg_all = smooth_l1_loss(boxes / norm, safe_gt / norm, 0.11)
        loc_loss = jnp.sum(jnp.where(pos[..., None], reg_all, 0.0)) / (
            jnp.maximum(pos_count, 1.0) * 4.0
        )

        total = (cls_loss + loc_loss) * self.loss_weight
        metrics = {
            "cls_loss": cls_loss * self.loss_weight,
            "localization_loss": loc_loss * self.loss_weight,
            "num_pos": pos_count,
        }
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    # ------------------------------------------------------------ inference
    def predict(self, variables, batch):
        images = batch["image"]
        centers_np, counts, _ = self._centers(images.shape[1:3])
        logits_l, deltas_l, mt = self.module.apply(variables, images)
        boxes_l = self._decode(deltas_l, mt, centers_np, counts)

        cb, cs = [], []
        for logits, boxes in zip(logits_l, boxes_l):
            scores = jax.nn.sigmoid(logits)
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
