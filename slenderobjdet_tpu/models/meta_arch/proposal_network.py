"""Proposal-only networks + point-based proposal generators.

Counterparts of the reference's proposal-generator family (SURVEY.md §2.7):
- RPNWNM / RPNWithAnchor: covered by proposal_generator/rpn.py (pluggable
  MODEL.RPN.MATCHER; proposals+scores returned so anchors are attachable)
- PointsProposalGenerator (`proposal_generator/ppg.py:154-255`): dense
  per-location ltrb offsets + in-object logits; here the in-object
  objectness is supervised by the in-box mask (or the rendered center mask
  when NEED_MASKS provides one) and regression by IoU loss on positives
- RepPointsGenerator (`proposal_generator/rpg.py:206-390`): the RepPoints
  init stage (point-match assignment, point-set decode) as the proposal
  source
- ProposalNetworkWithMasks (`meta_arch/pnwm.py:9-60`): proposal-only
  meta-arch feeding masks to its generator; predict() returns the proposals
  as detections ("objectness" class 0), so the proposal-quality tools (AR
  curves) work unchanged.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import iou_loss_ltrb, optax_sigmoid_ce
from ...ops.nms import nms_select
from ...structures import boxes as box_ops
from ..anchors import fcos_locations
from ..backbones.fpn import build_backbone
from ..layers import GroupNorm32
from .fcos import SIZES_OF_INTEREST, fcos_assign_single


class PointsProposalHead(nn.Module):
    """Shared tower -> in-object logit + ltrb offsets per location."""

    num_convs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        c = feats[0].shape[-1]
        init = nn.initializers.normal(stddev=0.01)
        tower = [
            (nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                     param_dtype=jnp.float32, kernel_init=init,
                     name=f"tower{i}"),
             GroupNorm32(c, name=f"gn{i}"))
            for i in range(self.num_convs)
        ]
        obj = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=init,
                      bias_init=nn.initializers.constant(
                          -math.log((1 - 0.01) / 0.01)),
                      name="objectness")
        reg = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=init, name="deltas")

        logits, regs = [], []
        for feat in feats:
            b, h, w, _ = feat.shape
            t = feat
            for conv, gn in tower:
                t = nn.relu(gn(conv(t)))
            logits.append(obj(t).astype(jnp.float32).reshape(b, h * w))
            regs.append(
                jnp.exp(jnp.clip(reg(t).astype(jnp.float32), -12.0, 9.0))
                .reshape(b, h * w, 4)
            )
        return logits, regs


class _PNWMModule(nn.Module):
    backbone: nn.Module
    head: PointsProposalHead
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


class ProposalNetworkWithMasks:
    """Proposal-only detector over the points proposal generator."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.int8_predict = cfg.TPU.INT8_PREDICT
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        pg = cfg.MODEL.PROPOSAL_GENERATOR
        self.in_features = (
            list(cfg.MODEL.FCOS.IN_FEATURES)
            if pg.IN_FEATURES == ["p5"] else list(pg.IN_FEATURES)
        )
        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        self.strides = [spec.strides[f] for f in self.in_features]
        self.post_topk = cfg.MODEL.RPN.POST_NMS_TOPK_TEST
        self.nms_thresh = cfg.MODEL.RPN.NMS_THRESH
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE

        self.module = _PNWMModule(
            backbone=spec.module,
            head=PointsProposalHead(dtype=dtype),
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

    def loss(self, variables, batch):
        images = batch["image"]
        locations_np, counts = fcos_locations(images.shape[1:3], self.strides)
        locations = jnp.asarray(locations_np)
        soi = jnp.asarray(np.concatenate([
            np.broadcast_to(np.array(SIZES_OF_INTEREST[i], np.float32), (c, 2))
            for i, c in enumerate(counts)
        ]))

        from ..layers import apply_train

        (logits_l, regs_l), updated_buffers = apply_train(
            self.module, variables, images)
        logits = jnp.concatenate(logits_l, axis=1)
        regs = jnp.concatenate(regs_l, axis=1)

        labels, reg_targets, _ = jax.vmap(
            partial(fcos_assign_single, num_classes=1),
            in_axes=(None, None, 0, 0, 0),
        )(locations, soi, batch["gt_boxes"],
          jnp.zeros_like(batch["gt_classes"]), batch["gt_valid"])

        pos = labels < 1
        # objectness supervision: center mask when available (the "with
        # masks" part, pnwm.py), else the in-box mask
        if "center_mask" in batch:
            cm = batch["center_mask"]
            ix = jnp.clip(locations[:, 0].astype(jnp.int32), 0, cm.shape[2] - 1)
            iy = jnp.clip(locations[:, 1].astype(jnp.int32), 0, cm.shape[1] - 1)
            obj_target = cm[:, iy, ix]
        else:
            obj_target = pos.astype(jnp.float32)

        num_pos = jnp.maximum(jnp.sum(pos), 1.0)
        obj_loss = jnp.mean(optax_sigmoid_ce(logits, obj_target))
        safe = jnp.where(pos[..., None], reg_targets, 1.0)
        reg_loss = jnp.sum(
            jnp.where(pos, iou_loss_ltrb(regs, safe, "iou"), 0.0)
        ) / num_pos

        metrics = {
            "loss_objectness": obj_loss, "loss_reg": reg_loss,
            "num_pos": num_pos,
        }
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return obj_loss + reg_loss, metrics

    def predict(self, variables, batch):
        images = batch["image"]
        locations_np, counts = fcos_locations(images.shape[1:3], self.strides)
        from ...ops.quant import int8_predict_scope
        with int8_predict_scope(self.int8_predict):
            logits_l, regs_l = self.module.apply(variables, images)

        offsets = np.concatenate([[0], np.cumsum(counts)])
        cb, cs = [], []
        for lvl in range(len(counts)):
            locs = jnp.asarray(locations_np[offsets[lvl]: offsets[lvl + 1]])
            scores = jax.nn.sigmoid(logits_l[lvl])
            k = min(1000, scores.shape[1])
            top, idx = jax.lax.top_k(scores, k)
            sel_reg = jnp.take_along_axis(regs_l[lvl], idx[..., None], axis=1)
            boxes = box_ops.decode_ltrb(locs[idx], sel_reg)
            cb.append(boxes)
            cs.append(top)
        boxes = jnp.concatenate(cb, axis=1)
        scores = jnp.concatenate(cs, axis=1)

        def one(bx, sc, scale, orig_hw):
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
