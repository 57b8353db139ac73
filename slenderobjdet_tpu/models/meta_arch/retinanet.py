"""RetinaNet, TPU-native.

Capability parity with the reference's RetinaNet family (d2 RetinaNet +
`slender_det/modeling/meta_arch/retina/retinanetwa.py`): anchor generation
(cfg ANCHOR_GENERATOR sizes/ratios), IoU matcher with low-quality matches,
sigmoid focal classification + smooth-L1 box-delta regression normalized by
foreground count, per-level top-k -> score threshold -> class-aware NMS
inference (retinanetwa.py:89-160 semantics), all restructured to fixed
shapes (padded gt, masked candidates) for XLA.

Anchors are host-computed constants per padded image shape — they bake into
the compiled program instead of being regenerated every step like the
reference's anchor_generator call (retinanetwa.py:46).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.nms import batched_nms
from ...structures import boxes as box_ops
from ..anchors import AnchorGeneratorSpec
from ..backbones.fpn import build_backbone
from ..matchers import iou_matcher


class RetinaNetHead(nn.Module):
    num_classes: int
    num_anchors: int
    num_convs: int = 4
    prior_prob: float = 0.01
    use_dcn: bool = False     # DeformableConvRetinaNet (reference retinadc.py)
    pack_levels: bool = False  # TPU.PACK_HEAD_LEVELS (ops/level_pack)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        from ..layers import DFConv2d

        c = feats[0].shape[-1]
        init = nn.initializers.normal(stddev=0.01)
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob)
        )

        def subnet_conv(prefix, i):
            if self.use_dcn:
                return DFConv2d(c, modulated=True, dtype=self.dtype,
                                name=f"{prefix}_subnet{i}")
            return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                           param_dtype=jnp.float32, kernel_init=init,
                           name=f"{prefix}_subnet{i}")

        cls_subnet = [subnet_conv("cls", i) for i in range(self.num_convs)]
        bbox_subnet = [subnet_conv("bbox", i) for i in range(self.num_convs)]
        cls_score = nn.Conv(self.num_anchors * self.num_classes, (3, 3), padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=init, bias_init=bias_init,
                            name="cls_score")
        bbox_pred = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=init, name="bbox_pred")

        # TPU.PACK_HEAD_LEVELS (ops/level_pack.py): run the shared subnets
        # ONCE over a mosaic canvas of the small levels. No per-level norm
        # here, so re-zeroing the 1-px gaps is a static 0/1 mask multiply
        # after each relu (gap garbage would otherwise bleed into the next
        # 3x3 conv); region outputs equal the per-level path
        # (tests/test_level_pack.py). Deformable subnets can't pack.
        packable = self.pack_levels and len(feats) > 2 and not self.use_dcn
        if packable:
            from ...ops.level_pack import (pack_levels, plan_level_packing,
                                           unpack_levels)
            tail = feats[1:]
            shapes = [f.shape[1:3] for f in tail]
            plan = plan_level_packing(shapes)
            canvas = pack_levels(tail, plan)
            mask = pack_levels(
                [jnp.ones((1, h, w, 1), self.dtype) for h, w in shapes], plan)
            units = [(feats[0], None, [0]),
                     (canvas, mask, list(range(1, len(feats))))]
        else:
            units = [(f, None, [lvl]) for lvl, f in enumerate(feats)]

        lvl_out: List[Any] = [None] * len(feats)
        for x, mask, lvls in units:
            ct, bt = x, x
            for conv in cls_subnet:
                ct = nn.relu(conv(ct))
                ct = ct if mask is None else ct * mask
            for conv in bbox_subnet:
                bt = nn.relu(conv(bt))
                bt = bt if mask is None else bt * mask
            lg = cls_score(ct).astype(jnp.float32)
            rg = bbox_pred(bt).astype(jnp.float32)
            if mask is None:
                parts = [(lg, rg)]
            else:
                parts = list(zip(unpack_levels(lg, shapes, plan),
                                 unpack_levels(rg, shapes, plan)))
            for lvl, part in zip(lvls, parts):
                lvl_out[lvl] = part

        logits, regs = [], []
        for lg, rg in lvl_out:
            b, h, w, _ = lg.shape
            logits.append(lg.reshape(
                b, h * w * self.num_anchors, self.num_classes))
            regs.append(rg.reshape(b, h * w * self.num_anchors, 4))
        return logits, regs


class RetinaNetModule(nn.Module):
    backbone: nn.Module
    head: RetinaNetHead
    in_features: Tuple[str, ...]
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    dtype: Any = jnp.float32

    def __call__(self, images: jnp.ndarray):
        x = images.astype(jnp.float32)
        x = (x - jnp.asarray(self.pixel_mean)) / jnp.asarray(self.pixel_std)
        x = x.astype(self.dtype)
        feats = self.backbone(x)
        feats = [feats[f] for f in self.in_features]
        return self.head(feats)


def retinanet_label_anchors(
    anchors, gt_boxes, gt_classes, gt_valid, thresholds, labels, num_classes
):
    """Per-image anchor labeling (d2 RetinaNet.label_anchors): returns
    (gt_labels (N,), matched_boxes (N,4)) with gt_labels in
    [0..C-1] fg, C bg, -1 ignore."""
    matched_idx, match_labels = iou_matcher(
        anchors, gt_boxes, gt_valid, thresholds, labels,
        allow_low_quality_matches=True,
    )
    matched_boxes = gt_boxes[matched_idx]
    matched_classes = gt_classes[matched_idx]
    out = jnp.where(match_labels == 1, matched_classes, num_classes)
    out = jnp.where(match_labels == -1, -1, out)
    return out.astype(jnp.int32), matched_boxes


class RetinaNet:
    """Config-driven RetinaNet detector (same interface as FCOS).

    assign_mode selects the anchor-labeling strategy:
    - "iou": d2 IoU matcher (default RetinaNet)
    - "fcos": FCOS in-box + size-of-interest assignment at anchor centers
      (reference CenternessRetinaNet, retina_centerness_assign.py:30-144)
    - "nearest": nearest-point match at the gt's pyramid level
      (reference NearestRetinaNet, retina_nearest_assign.py:29-79)
    """

    def __init__(self, cfg, use_dcn: bool = False, assign_mode: str = "iou",
                 with_anchor: bool = False):
        self.assign_mode = assign_mode
        self.with_anchor = with_anchor
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        r = cfg.MODEL.RETINANET
        self.num_classes = r.NUM_CLASSES
        self.in_features = list(r.IN_FEATURES)
        self.focal_alpha = r.FOCAL_LOSS_ALPHA
        self.focal_gamma = r.FOCAL_LOSS_GAMMA
        self.smooth_l1_beta = r.SMOOTH_L1_LOSS_BETA
        self.box_reg_weights = tuple(r.BBOX_REG_WEIGHTS)
        self.iou_thresholds = list(r.IOU_THRESHOLDS)
        self.iou_labels = list(r.IOU_LABELS)
        self.score_thresh = r.SCORE_THRESH_TEST
        self.topk_candidates = r.TOPK_CANDIDATES_TEST
        self.nms_thresh = r.NMS_THRESH_TEST
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
        self.approx_topk = cfg.TPU.APPROX_TOPK
        self.int8_predict = cfg.TPU.INT8_PREDICT

        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        strides = [spec.strides[f] for f in self.in_features]
        self.anchor_spec = AnchorGeneratorSpec(cfg, strides)
        num_anchors = self.anchor_spec.num_cell_anchors[0]
        assert all(a == num_anchors for a in self.anchor_spec.num_cell_anchors)

        head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=num_anchors,
            num_convs=r.NUM_CONVS,
            prior_prob=r.PRIOR_PROB,
            use_dcn=use_dcn,
            pack_levels=cfg.TPU.PACK_HEAD_LEVELS,
            dtype=dtype,
        )
        self.module = RetinaNetModule(
            backbone=spec.module,
            head=head,
            in_features=tuple(self.in_features),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            dtype=dtype,
        )

    def init_variables(self, rng, image_hw: Tuple[int, int] = (128, 128),
                       batch_size: int = 1):
        del image_hw, batch_size
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        return jax.jit(self.module.init)(rng, images)

    def _anchors(self, image_hw) -> Tuple[np.ndarray, List[int]]:
        return self.anchor_spec.anchors(image_hw)

    # --------------------------------------------------------- assignment
    def _label_batch(self, anchors_np, counts, batch):
        anchors = jnp.asarray(anchors_np)
        if self.assign_mode == "iou":
            return jax.vmap(
                partial(
                    retinanet_label_anchors,
                    thresholds=self.iou_thresholds,
                    labels=self.iou_labels,
                    num_classes=self.num_classes,
                ),
                in_axes=(None, 0, 0, 0),
            )(anchors, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

        centers_np = np.stack(
            [
                (anchors_np[:, 0] + anchors_np[:, 2]) // 2,
                (anchors_np[:, 1] + anchors_np[:, 3]) // 2,
            ],
            axis=1,
        ).astype(np.float32)
        centers = jnp.asarray(centers_np)
        strides = [self.backbone_spec.strides[f] for f in self.in_features]

        if self.assign_mode == "fcos":
            from .fcos import SIZES_OF_INTEREST, fcos_assign_single

            soi = jnp.asarray(np.concatenate([
                np.broadcast_to(np.array(SIZES_OF_INTEREST[i], np.float32),
                                (c, 2))
                for i, c in enumerate(counts)
            ]))

            def one(gb, gc, gv):
                labels, reg, _ = fcos_assign_single(
                    centers, soi, gb, gc, gv, num_classes=self.num_classes
                )
                matched = box_ops.decode_ltrb(centers, reg)
                return labels, matched

            return jax.vmap(one)(
                batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"]
            )

        if self.assign_mode == "nearest":
            from .reppoints import rep_points_assign_with_idx

            lvls = jnp.asarray(np.concatenate([
                np.full(c, int(np.log2(s)), np.int32)
                for c, s in zip(counts, strides)
            ]))
            lvl_min = int(np.log2(strides[0]))
            lvl_max = int(np.log2(strides[-1]))

            def one(gb, gc, gv):
                obj, idx = rep_points_assign_with_idx(
                    centers, lvls, gb, gv, lvl_min, lvl_max
                )
                labels = jnp.where(obj, gc[idx], self.num_classes)
                return labels.astype(jnp.int32), gb[idx]

            return jax.vmap(one)(
                batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"]
            )
        raise ValueError(self.assign_mode)

    # --------------------------------------------------------------- loss
    def loss(self, variables, batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        images = batch["image"]
        anchors_np, counts = self._anchors(images.shape[1:3])
        anchors = jnp.asarray(anchors_np)

        from ..layers import apply_train

        (logits_l, regs_l), updated_buffers = apply_train(
            self.module, variables, images)
        logits = jnp.concatenate(logits_l, axis=1)   # (B, N, C)
        regs = jnp.concatenate(regs_l, axis=1)       # (B, N, 4)

        gt_labels, matched_boxes = self._label_batch(anchors_np, counts, batch)

        valid = gt_labels >= 0                        # not ignored
        fg = (gt_labels >= 0) & (gt_labels < self.num_classes)
        num_fg = jnp.maximum(jnp.sum(fg), 1.0)

        onehot = jax.nn.one_hot(gt_labels, self.num_classes, dtype=jnp.float32)
        cls_all = sigmoid_focal_loss(logits, onehot, self.focal_alpha,
                                     self.focal_gamma)
        cls_loss = jnp.sum(jnp.where(valid[..., None], cls_all, 0.0)) / num_fg

        # smooth-l1 on anchor deltas; safe targets on non-fg lanes
        safe_boxes = jnp.where(fg[..., None], matched_boxes,
                               anchors[None] + 1.0)
        target_deltas = box_ops.get_deltas(
            jnp.broadcast_to(anchors[None], safe_boxes.shape), safe_boxes,
            weights=self.box_reg_weights,
        )
        reg_all = smooth_l1_loss(regs, target_deltas, self.smooth_l1_beta)
        reg_loss = jnp.sum(jnp.where(fg[..., None], reg_all, 0.0)) / num_fg

        total = cls_loss + reg_loss
        metrics = {
            "loss_cls": cls_loss,
            "loss_box_reg": reg_loss,
            "num_pos": num_fg,
        }
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    # ---------------------------------------------------------- inference
    def predict(self, variables, batch) -> Dict[str, jnp.ndarray]:
        images = batch["image"]
        anchors_np, counts = self._anchors(images.shape[1:3])

        from ...ops.quant import int8_predict_scope
        with int8_predict_scope(self.int8_predict):
            logits_l, regs_l = self.module.apply(variables, images)

        offsets = np.concatenate([[0], np.cumsum(counts)])
        cb, cs, cc, cv, ca = [], [], [], [], []
        for lvl in range(len(counts)):
            lvl_anchors = jnp.asarray(anchors_np[offsets[lvl]: offsets[lvl + 1]])
            b, s, c, v, a = _retina_level_candidates(
                logits_l[lvl], regs_l[lvl], lvl_anchors,
                self.score_thresh, self.topk_candidates, self.box_reg_weights,
                approx=self.approx_topk,
            )
            cb.append(b); cs.append(s); cc.append(c); cv.append(v); ca.append(a)

        boxes = jnp.concatenate(cb, axis=1)
        scores = jnp.concatenate(cs, axis=1)
        classes = jnp.concatenate(cc, axis=1)
        valid = jnp.concatenate(cv, axis=1)
        anchors = jnp.concatenate(ca, axis=1)

        def _nms_one(bx, sc, cl, vl, an, scale, orig_hw):
            keep_idx, keep_valid = batched_nms(
                bx, sc, cl, self.nms_thresh, self.max_dets, valid=vl
            )
            kb = box_ops.clip(bx[keep_idx] / scale, orig_hw[0], orig_hw[1])
            ka = box_ops.clip(an[keep_idx] / scale, orig_hw[0], orig_hw[1])
            return kb, sc[keep_idx], cl[keep_idx], keep_valid, ka

        ob, os_, oc, ov, oa = jax.vmap(_nms_one)(
            boxes, scores, classes, valid, anchors,
            batch["scale"].astype(jnp.float32),
            batch["orig_size"].astype(jnp.float32),
        )
        out = {"boxes": ob, "scores": os_, "classes": oc, "valid": ov}
        if self.with_anchor:
            # diagnosis chain (reference retinanetwa.py:149-154: each final
            # detection carries its matched anchor, rescaled in postprocess
            # by detector_postprocess_with_anchor)
            out["anchors"] = oa
        return out


class DeformableConvRetinaNet(RetinaNet):
    """RetinaNet with modulated deformable convs in the head towers
    (reference `retina/retinadc.py:25-325`)."""

    def __init__(self, cfg):
        super().__init__(cfg, use_dcn=True)


class CenternessRetinaNet(RetinaNet):
    """RetinaNet with FCOS-style assignment at anchor centers
    (reference retina_centerness_assign.py:30-144)."""

    def __init__(self, cfg):
        super().__init__(cfg, assign_mode="fcos")


class NearestRetinaNet(RetinaNet):
    """RetinaNet with nearest-point assignment
    (reference retina_nearest_assign.py:29-79)."""

    def __init__(self, cfg):
        super().__init__(cfg, assign_mode="nearest")


def _retina_level_candidates(logits, regs, anchors, score_thresh, topk,
                             weights, approx=True):
    """d2 RetinaNet inference_single_image per level, fixed-shape: flatten
    (N*C) scores, top-k, then threshold mask (threshold AFTER topk, matching
    retinanetwa.py:112-124)."""
    from ...ops.topk import pair_top_k

    scores = jax.nn.sigmoid(logits.astype(jnp.float32))      # (B, N, C)
    top_scores, anchor_idx, cls_idx = pair_top_k(scores, topk, approx=approx)
    valid = top_scores > score_thresh

    sel_regs = jnp.take_along_axis(regs, anchor_idx[..., None], axis=1)
    sel_anchors = anchors[anchor_idx]
    boxes = box_ops.apply_deltas(sel_regs, sel_anchors, weights=weights)
    return boxes, top_scores, cls_idx, valid, sel_anchors
