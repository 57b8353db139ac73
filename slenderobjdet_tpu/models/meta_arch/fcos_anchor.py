"""FCOSAnchor: FCOS grid regressing offsets from per-location anchors.

Counterpart of `slender_det/modeling/meta_arch/fcos/fcos_anchor.py:71-477`
(ablated in configs/fcos_anchor/*ar{0.5,2.0}.yaml):
- FCOS in-box + size-of-interest assignment per LOCATION
- A anchors per location (cfg ANCHOR_GENERATOR); targets expand over anchors
- regression: predicted ltrb delta ADDED to the anchor's ltrb offsets from
  the location (get_anchor_offsets, fcos_anchor.py:32-42)
- anchor_iou_loss (layers/iou_loss.py:79-114): per-anchor softmax of
  1/loss becomes the training target of a shape-classification branch;
  the reg loss is weighted by centerness x softmax(shape logits)
- inference: score = sigmoid(cls) * sigmoid(ctr_logit * shape_logit),
  boxes = location -/+ (reg + anchor offsets) (fcos_anchor.py:279-330)
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import optax_sigmoid_ce, sigmoid_focal_loss
from ...ops.nms import batched_nms
from ...structures import boxes as box_ops
from ..anchors import AnchorGeneratorSpec, fcos_locations
from ..backbones.fpn import build_backbone
from ..layers import GroupNorm32, Scale
from .fcos import (
    SIZES_OF_INTEREST,
    compute_centerness_targets,
    fcos_assign_single,
)


class FCOSAnchorHead(nn.Module):
    num_classes: int
    num_anchors: int
    num_convs: int = 4
    prior_prob: float = 0.01
    num_levels: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        c = feats[0].shape[-1]
        init = nn.initializers.normal(stddev=0.01)
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob)
        )
        A = self.num_anchors

        cls_tower = [
            (nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                     param_dtype=jnp.float32, kernel_init=init,
                     name=f"cls_tower{i}"),
             GroupNorm32(c, name=f"cls_gn{i}"))
            for i in range(self.num_convs)
        ]
        bbox_tower = [
            (nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                     param_dtype=jnp.float32, kernel_init=init,
                     name=f"bbox_tower{i}"),
             GroupNorm32(c, name=f"bbox_gn{i}"))
            for i in range(self.num_convs)
        ]
        cls_logits = nn.Conv(A * self.num_classes, (3, 3), padding=1,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             kernel_init=init, bias_init=bias_init,
                             name="cls_logits")
        bbox_pred = nn.Conv(A * 4, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=init,
                            name="bbox_pred")
        centerness = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                             param_dtype=jnp.float32, kernel_init=init,
                             name="centerness")
        shape_cls = nn.Conv(A, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=init,
                            name="shape_cls")
        scales = [Scale(name=f"scale{i}") for i in range(self.num_levels)]

        out_cls, out_reg, out_ctr, out_shape = [], [], [], []
        for lvl, feat in enumerate(feats):
            b, h, w, _ = feat.shape
            ct, bt = feat, feat
            for conv, gn in cls_tower:
                ct = nn.relu(gn(conv(ct)))
            for conv, gn in bbox_tower:
                bt = nn.relu(gn(conv(bt)))
            out_cls.append(cls_logits(ct).astype(jnp.float32)
                           .reshape(b, h * w * A, self.num_classes))
            reg = scales[lvl](bbox_pred(bt).astype(jnp.float32))
            out_reg.append(reg.reshape(b, h * w * A, 4))
            out_ctr.append(centerness(ct).astype(jnp.float32)
                           .reshape(b, h * w))
            out_shape.append(shape_cls(bt).astype(jnp.float32)
                             .reshape(b, h * w * A))
        return out_cls, out_reg, out_ctr, out_shape


class _Module(nn.Module):
    backbone: nn.Module
    head: FCOSAnchorHead
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


def anchor_iou_terms(pred, target):
    """per-row (losses, ious) for ltrb pairs, matching iou_loss.py:79-98."""
    pl, pt, pr, pb = (pred[..., i] for i in range(4))
    tl, tt, tr, tb = (target[..., i] for i in range(4))
    t_area = (tl + tr) * (tt + tb)
    p_area = (pl + pr) * (pt + pb)
    wi = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    hi = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    inter = jnp.clip(wi, 0, None) * jnp.clip(hi, 0, None)
    union = t_area + p_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    return -jnp.log(jnp.clip(ious, 1e-6)), ious


class FCOSAnchor:
    def __init__(self, cfg):
        self.cfg = cfg
        self.int8_predict = cfg.TPU.INT8_PREDICT
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        f = cfg.MODEL.FCOS
        self.num_classes = f.NUM_CLASSES
        self.in_features = list(f.IN_FEATURES)
        self.strides = list(f.FPN_STRIDES)
        self.focal_alpha = f.FOCAL_LOSS_ALPHA
        self.focal_gamma = f.FOCAL_LOSS_GAMMA
        self.pre_nms_thresh = f.INFERENCE_TH
        self.pre_nms_top_n = f.PRE_NMS_TOP_N
        self.nms_thresh = f.NMS_TH
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE

        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        self.anchor_spec = AnchorGeneratorSpec(cfg, self.strides)
        self.num_anchors = self.anchor_spec.num_cell_anchors[0]

        self.module = _Module(
            backbone=spec.module,
            head=FCOSAnchorHead(
                num_classes=self.num_classes,
                num_anchors=self.num_anchors,
                num_convs=f.NUM_CONVS,
                prior_prob=f.PRIOR_PROB,
                num_levels=len(self.strides),
                dtype=dtype,
            ),
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

    def _geometry(self, image_hw):
        locations_np, counts = fcos_locations(image_hw, self.strides)
        anchors_np, _ = self.anchor_spec.anchors(image_hw)
        A = self.num_anchors
        locs_exp = np.repeat(locations_np, A, axis=0)        # (L*A, 2)
        # anchor ltrb offsets from the location (fcos_anchor.py:32-42)
        anchor_off = np.concatenate([
            locs_exp - anchors_np[:, :2], anchors_np[:, 2:] - locs_exp
        ], axis=1).astype(np.float32)
        soi = np.concatenate([
            np.broadcast_to(np.array(SIZES_OF_INTEREST[i], np.float32), (c, 2))
            for i, c in enumerate(counts)
        ])
        return locations_np, counts, anchor_off, soi

    # ------------------------------------------------------------------ loss
    def loss(self, variables, batch):
        images = batch["image"]
        locations_np, counts, anchor_off_np, soi_np = self._geometry(
            images.shape[1:3])
        locations = jnp.asarray(locations_np)
        soi = jnp.asarray(soi_np)
        anchor_off = jnp.asarray(anchor_off_np)              # (L*A, 4)
        A = self.num_anchors

        from ..layers import apply_train

        (cls_l, reg_l, ctr_l, shape_l), updated_buffers = apply_train(
            self.module, variables, images)
        logits = jnp.concatenate(cls_l, axis=1)              # (B, L*A, C)
        regs = jnp.concatenate(reg_l, axis=1)                # (B, L*A, 4)
        ctr = jnp.concatenate(ctr_l, axis=1)                 # (B, L)
        shape_logits = jnp.concatenate(shape_l, axis=1)      # (B, L*A)

        labels, reg_targets, _ = jax.vmap(
            partial(fcos_assign_single, num_classes=self.num_classes),
            in_axes=(None, None, 0, 0, 0),
        )(locations, soi, batch["gt_boxes"], batch["gt_classes"],
          batch["gt_valid"])

        pos = labels < self.num_classes                      # (B, L)
        pos_a = jnp.repeat(pos, A, axis=1)                   # (B, L*A)
        labels_a = jnp.repeat(labels, A, axis=1)
        targets_a = jnp.repeat(reg_targets, A, axis=1).reshape(
            *regs.shape)

        num_pos = jnp.maximum(jnp.sum(pos), 1.0)
        num_pos_a = jnp.maximum(jnp.sum(pos_a), 1.0)

        onehot = jax.nn.one_hot(labels_a, self.num_classes, dtype=jnp.float32)
        onehot = onehot * pos_a[..., None]
        cls_loss = jnp.sum(
            sigmoid_focal_loss(logits, onehot, self.focal_alpha,
                               self.focal_gamma)
        ) / num_pos_a

        # anchor-relative ltrb prediction
        pred_ltrb = regs + anchor_off[None]
        safe_t = jnp.where(pos_a[..., None], targets_a, 1.0)
        losses, _ = anchor_iou_terms(pred_ltrb, safe_t)      # (B, L*A)

        # per-anchor softmax of 1/loss = shape target (iou_loss.py:108-114)
        inv = jnp.where(pos_a, 1.0 / jnp.clip(losses, 1e-3), -jnp.inf)
        norm_losses = jax.nn.softmax(
            inv.reshape(-1, A), axis=-1
        ).reshape(pos_a.shape)
        norm_losses = jnp.where(pos_a, norm_losses, 0.0)

        ctr_targets = jnp.where(pos, compute_centerness_targets(
            jnp.where(pos[..., None], reg_targets, 1.0)), 0.0)
        ctr_targets_a = jnp.repeat(ctr_targets, A, axis=1)
        shape_w = jax.nn.softmax(
            jnp.where(pos_a, shape_logits, -jnp.inf).reshape(-1, A), axis=-1
        ).reshape(pos_a.shape)
        weights = jnp.where(pos_a, ctr_targets_a * shape_w, 0.0)
        sum_w = jnp.maximum(jnp.sum(weights), 1e-6)
        reg_loss = jnp.sum(jnp.where(pos_a, losses * weights, 0.0)) / sum_w

        ctr_loss = jnp.sum(
            jnp.where(pos, optax_sigmoid_ce(ctr, ctr_targets), 0.0)
        ) / num_pos
        shape_loss = jnp.sum(
            jnp.where(pos_a,
                      optax_sigmoid_ce(shape_logits,
                                       jax.lax.stop_gradient(norm_losses)),
                      0.0)
        ) / num_pos_a

        total = cls_loss + reg_loss + ctr_loss + shape_loss
        metrics = {
            "cls_loss": cls_loss, "reg_loss": reg_loss,
            "centerness_loss": ctr_loss, "shape_loss": shape_loss,
            "num_pos": num_pos,
        }
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    # ------------------------------------------------------------- inference
    def predict(self, variables, batch):
        images = batch["image"]
        locations_np, counts, anchor_off_np, _ = self._geometry(
            images.shape[1:3])
        A = self.num_anchors
        from ...ops.quant import int8_predict_scope
        with int8_predict_scope(self.int8_predict):
            cls_l, reg_l, ctr_l, shape_l = self.module.apply(
                variables, images)

        offsets = np.concatenate([[0], np.cumsum(counts)])
        cb, cs, cc, cv = [], [], [], []
        for lvl in range(len(counts)):
            sl = slice(offsets[lvl] * A, offsets[lvl + 1] * A)
            locs = jnp.asarray(np.repeat(
                locations_np[offsets[lvl]: offsets[lvl + 1]], A, axis=0))
            a_off = jnp.asarray(anchor_off_np[sl])
            logits, regs = cls_l[lvl], reg_l[lvl]
            ctr = jnp.repeat(ctr_l[lvl], A, axis=1)
            shp = shape_l[lvl]

            from ...ops.topk import pair_top_k

            scores = jax.nn.sigmoid(logits.astype(jnp.float32))
            gate = jax.nn.sigmoid((ctr * shp).astype(jnp.float32))[..., None]
            top_scores, loc_idx, cls_idx = pair_top_k(
                scores * gate, self.pre_nms_top_n, approx=False)

            sel_reg = jnp.take_along_axis(regs, loc_idx[..., None], axis=1)
            sel_off = a_off[loc_idx]
            sel_loc = locs[loc_idx]
            boxes = jnp.stack([
                sel_loc[..., 0] - sel_reg[..., 0] - sel_off[..., 0],
                sel_loc[..., 1] - sel_reg[..., 1] - sel_off[..., 1],
                sel_loc[..., 0] + sel_reg[..., 2] + sel_off[..., 2],
                sel_loc[..., 1] + sel_reg[..., 3] + sel_off[..., 3],
            ], axis=-1)
            cb.append(boxes)
            cs.append(jnp.sqrt(jnp.clip(top_scores, 0.0, None)))
            cc.append(cls_idx)
            cv.append(top_scores > self.pre_nms_thresh ** 2)

        boxes = jnp.concatenate(cb, axis=1)
        scores = jnp.concatenate(cs, axis=1)
        classes = jnp.concatenate(cc, axis=1)
        valid = jnp.concatenate(cv, axis=1)

        def one(bx, sc, cl, vl, scale, orig_hw):
            keep_idx, keep_valid = batched_nms(
                bx, sc, cl, self.nms_thresh, self.max_dets, valid=vl)
            kb = box_ops.clip(bx[keep_idx] / scale, orig_hw[0], orig_hw[1])
            return kb, sc[keep_idx], cl[keep_idx], keep_valid

        ob, os_, oc, ov = jax.vmap(one)(
            boxes, scores, classes, valid,
            batch["scale"].astype(jnp.float32),
            batch["orig_size"].astype(jnp.float32),
        )
        return {"boxes": ob, "scores": os_, "classes": oc, "valid": ov}
