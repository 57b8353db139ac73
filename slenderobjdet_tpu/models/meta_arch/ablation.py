"""Ablation meta-architecture — the paper's chassis that factors one-stage
detectors into (box representation) x (feature adaption).

Counterpart of `slender_det/modeling/meta_arch/meta/meta.py:24-152` +
`meta/heads/*` (SURVEY.md §2.6):
- AblationMetaArch: backbone + pluggable head from MEAT_HEADS_REGISTRY
- feature adaption modes (meta_head.py:18): Empty (plain conv),
  Unsupervised Offset (offsets from a 1x1 conv), Split Unsup Offset
  (separate offset convs for cls/loc), Supervised Offset (offsets derived
  from the init localization output + 7 learned free points)
- heads: LRTBHead (FCOS-style l,t,r,b with init+refine towers and optional
  slender centerness, lrtb_head.py), PointSetHead (RepPoints-style,
  pointset_head.py), AnchorHead (RetinaNet-style, anchor_head.py)

One Flax module (`MetaDualStageHead`) implements the shared structure; the
per-representation assignment/loss/inference logic reuses the FCOS /
RepPoints / RetinaNet machinery already in this package.

Note: the reference's Supervised-Offset path mixes up (y,x) vs (x,y) when
deriving corner offsets (lrtb_head.py:170-183, acknowledged TODO there); we
implement the intended geometry — kernel corners pinned to the predicted box
corners in (dy, dx) feature units.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.deform_conv import deform_conv2d_batched, kernel_base_offsets
from ...ops.losses import (
    iou_loss_ltrb,
    optax_sigmoid_ce,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from ...ops.nms import batched_nms
from ...structures import boxes as box_ops
from ..anchors import AnchorGeneratorSpec, fcos_locations
from ..backbones.fpn import build_backbone
from ..matchers import iou_matcher
from ..layers import Scale
from .fcos import (
    SIZES_OF_INTEREST,
    compute_centerness_targets,
    fcos_assign_single,
    _fcos_level_candidates,
)
from .reppoints import points2bbox, rep_points_assign

FEAT_ADAPTION_METHODS = (
    "Empty", "Unsupervised Offset", "Supervised Offset", "Split Unsup Offset"
)


def compute_slender_centerness_targets(reg_targets: jnp.ndarray) -> jnp.ndarray:
    """centerness^(0.5 * min(w/h, h/w)) — fcos/utils.py:302-312."""
    lr = reg_targets[..., 0::2]
    tb = reg_targets[..., 1::2]
    eps = 1e-12
    w = reg_targets[..., 0] + reg_targets[..., 2]
    h = reg_targets[..., 1] + reg_targets[..., 3]
    ratio = jnp.minimum(w / jnp.maximum(h, eps), h / jnp.maximum(w, eps))
    c = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), eps)) * (
        jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), eps)
    )
    return jnp.power(jnp.clip(c, 0.0, None), 0.5 * ratio)


class MetaDeformConv(nn.Module):
    """3x3 conv or deformable conv, selected by the adaption mode; offsets
    arrive in torch DCN convention (relative (dy,dx)*9) and are shifted to
    our absolute convention here."""

    features: int
    deformable: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rel_offsets: Optional[jnp.ndarray] = None):
        if not self.deformable:
            return nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           kernel_init=nn.initializers.normal(stddev=0.01),
                           name="conv")(x)
        k = 9
        cin = x.shape[-1]
        weight = self.param("weight", nn.initializers.normal(stddev=0.01),
                            (k, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        b, h, w, _ = x.shape
        base = jnp.asarray(kernel_base_offsets(3))            # (9, 2)
        rel = rel_offsets.reshape(b, h, w, k, 2)
        abs_off = rel + base
        return deform_conv2d_batched(
            x.astype(jnp.float32), abs_off.astype(jnp.float32), weight, bias
        ).astype(self.dtype)


class MetaDualStageHead(nn.Module):
    """Shared cls/loc towers + init branch + feature adaption + refine/cls
    outputs. `loc_dim` selects the representation (4 = lrtb or anchor deltas,
    2P = point sets). Per-level outputs flattened to (B, HW, .)."""

    num_classes: int
    loc_dim: int
    feat_adaption: str = "Empty"
    num_convs: int = 3
    feat_channels: int = 256
    norm: str = "GN"
    gradient_mul: float = 0.1
    prior_prob: float = 0.01
    res_refine: bool = False
    has_centerness: bool = False
    centerness_on_loc: bool = False
    use_scales: bool = False
    exp_decode: bool = False           # lrtb: exp() the scaled raw outputs
    num_levels: int = 5
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    num_anchors: int = 1
    dtype: Any = jnp.float32

    def _supervised_offsets(self, loc_init, extend, stride):
        """Corner-pinned supervised offsets: kernel points (-1,-1) and (1,1)
        follow the init prediction's box corners; 7 middle points learned."""
        b, h, w, _ = loc_init.shape
        gm = (1 - self.gradient_mul) * jax.lax.stop_gradient(loc_init) \
            + self.gradient_mul * loc_init
        if self.exp_decode:
            lrtb = gm / stride                       # feature-pixel units
            tl = jnp.stack([-lrtb[..., 1], -lrtb[..., 0]], -1)   # (dy,dx)
            br = jnp.stack([lrtb[..., 3], lrtb[..., 2]], -1)
        else:
            pts = gm.reshape(b, h, w, -1, 2)
            tl = pts[..., 0, ::-1]
            br = pts[..., -1, ::-1]
        base = jnp.asarray(kernel_base_offsets(3))
        rel_tl = (tl - base[0]).reshape(b, h, w, 2)
        rel_br = (br - base[8]).reshape(b, h, w, 2)
        return jnp.concatenate([rel_tl, extend, rel_br], axis=-1)

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        C = self.feat_channels
        init = nn.initializers.normal(stddev=0.01)
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob)
        )

        def subnet(prefix):
            layers = []
            for i in range(self.num_convs):
                conv = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                               param_dtype=jnp.float32, kernel_init=init,
                               name=f"{prefix}_conv{i}")
                gn = (nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                                   param_dtype=jnp.float32,
                                   name=f"{prefix}_gn{i}")
                      if self.norm == "GN" else None)
                layers.append((conv, gn))
            return layers

        cls_subnet = subnet("cls")
        loc_subnet = subnet("loc")

        loc_init_conv = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                                param_dtype=jnp.float32, kernel_init=init,
                                name="loc_init_conv")
        loc_init_out = nn.Conv(self.num_anchors * self.loc_dim, (1, 1),
                               dtype=self.dtype, param_dtype=jnp.float32,
                               kernel_init=init, name="loc_init_out")

        deform = self.feat_adaption != "Empty"
        cls_conv = MetaDeformConv(C, deform, dtype=self.dtype, name="cls_conv")
        loc_refine_conv = MetaDeformConv(C, deform, dtype=self.dtype,
                                         name="loc_refine_conv")

        if self.feat_adaption == "Unsupervised Offset":
            offset_conv = nn.Conv(18, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32, kernel_init=init,
                                  name="offset_conv")
        elif self.feat_adaption == "Split Unsup Offset":
            offset_conv_cls = nn.Conv(18, (1, 1), dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      kernel_init=init, name="offset_conv_cls")
            offset_conv_loc = nn.Conv(18, (1, 1), dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      kernel_init=init, name="offset_conv_loc")
        elif self.feat_adaption == "Supervised Offset":
            offset_conv_extend = nn.Conv(14, (1, 1), dtype=self.dtype,
                                         param_dtype=jnp.float32,
                                         kernel_init=init,
                                         name="offset_conv_extend")

        cls_out = nn.Conv(self.num_anchors * self.num_classes, (1, 1),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          kernel_init=init, bias_init=bias_init,
                          name="cls_out")
        loc_refine_out = nn.Conv(self.num_anchors * self.loc_dim, (1, 1),
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 kernel_init=init, name="loc_refine_out")
        ctn_out = (
            nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=init, name="ctn_out")
            if self.has_centerness else None
        )
        scales_init = [Scale(name=f"scale_init{i}")
                       for i in range(self.num_levels)] if self.use_scales else None
        scales_refine = [Scale(name=f"scale_refine{i}")
                         for i in range(self.num_levels)] if self.use_scales else None

        out_cls, out_ctr, out_init, out_refine = [], [], [], []
        for lvl, feat in enumerate(feats):
            b, h, w, _ = feat.shape
            cf, lf = feat, feat
            for conv, gn in cls_subnet:
                cf = conv(cf)
                if gn is not None:
                    cf = gn(cf).astype(self.dtype)
                cf = nn.relu(cf)
            for conv, gn in loc_subnet:
                lf = conv(lf)
                if gn is not None:
                    lf = gn(lf).astype(self.dtype)
                lf = nn.relu(lf)

            raw_init = loc_init_out(nn.relu(loc_init_conv(lf))).astype(jnp.float32)
            if self.use_scales:
                raw_init = scales_init[lvl](raw_init)
            loc_init = jnp.exp(jnp.clip(raw_init, -12.0, 9.0)) \
                if self.exp_decode else raw_init

            if self.feat_adaption == "Empty":
                cf_fa = cls_conv(cf)
                lf_fa = loc_refine_conv(lf)
            elif self.feat_adaption == "Unsupervised Offset":
                off = offset_conv(lf).astype(jnp.float32)
                cf_fa = cls_conv(cf, off)
                lf_fa = loc_refine_conv(lf, off)
            elif self.feat_adaption == "Split Unsup Offset":
                cf_fa = cls_conv(cf, offset_conv_cls(lf).astype(jnp.float32))
                lf_fa = loc_refine_conv(lf, offset_conv_loc(lf).astype(jnp.float32))
            elif self.feat_adaption == "Supervised Offset":
                extend = offset_conv_extend(lf).astype(jnp.float32)
                off = self._supervised_offsets(
                    loc_init, extend, float(self.strides[lvl])
                )
                cf_fa = cls_conv(cf, off)
                lf_fa = loc_refine_conv(lf, off)
            else:
                raise ValueError(self.feat_adaption)

            logits = cls_out(nn.relu(cf_fa)).astype(jnp.float32)
            raw_refine = loc_refine_out(nn.relu(lf_fa)).astype(jnp.float32)
            if self.use_scales:
                raw_refine = scales_refine[lvl](raw_refine)
            loc_refine = jnp.exp(jnp.clip(raw_refine, -12.0, 9.0)) \
                if self.exp_decode else raw_refine
            if self.res_refine:
                loc_refine = loc_refine + jax.lax.stop_gradient(loc_init)

            A = self.num_anchors
            out_cls.append(logits.reshape(b, h * w * A, self.num_classes))
            out_init.append(loc_init.reshape(b, h * w * A, self.loc_dim))
            out_refine.append(loc_refine.reshape(b, h * w * A, self.loc_dim))
            if self.has_centerness:
                src = lf_fa if self.centerness_on_loc else cf_fa
                ctr = ctn_out(nn.relu(src)).astype(jnp.float32)
                out_ctr.append(ctr.reshape(b, h * w * A))
        return out_cls, out_ctr, out_init, out_refine


class _MetaModule(nn.Module):
    backbone: nn.Module
    head: MetaDualStageHead
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


class AblationMetaArch:
    """Detector facade over the ablation chassis. Dispatches target
    assignment / losses / inference by MODEL.META_ARCH.NAME."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.int8_predict = cfg.TPU.INT8_PREDICT
        p = cfg.MODEL.META_ARCH
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        self.head_name = p.NAME
        assert self.head_name in ("LRTBHead", "LRTBTopkHead", "PointSetHead",
                                  "AnchorHead"), self.head_name
        self.num_classes = p.NUM_CLASSES
        self.in_features = list(p.IN_FEATURES)
        self.strides = list(p.FPN_STRIDES)
        self.focal_alpha = p.FOCAL_LOSS_ALPHA
        self.focal_gamma = p.FOCAL_LOSS_GAMMA
        self.loss_cls_weight = p.LOSS_CLS_WEIGHT
        self.loss_init_weight = p.LOSS_LOC_INIT_WEIGHT
        self.loss_refine_weight = p.LOSS_LOC_REFINE_WEIGHT
        self.iou_loss_type = p.IOU_LOSS_TYPE
        self.slender_centerness = p.SLENDER_CENTERNESS
        self.score_thresh = p.SCORE_THRESH_TEST
        self.topk_candidates = p.TOPK_CANDIDATES_TEST
        self.nms_thresh = p.NMS_THRESH_TEST
        self.pre_nms_thresh = p.PRE_NMS_THRESH
        self.pre_nms_top_n = p.PRE_NMS_TOP_N
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
        self.num_points = p.NUM_POINTS
        self.point_base_scale = p.POINT_BASE_SCALE
        self.transform_method = p.TRANSFORM_METHOD
        self.iou_thresholds = list(p.IOU_THRESHOLDS)
        self.iou_labels = list(p.IOU_LABELS)
        self.bbox_reg_weights = tuple(p.BBOX_REG_WEIGHTS)

        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec

        is_lrtb = self.head_name.startswith("LRTB")
        is_pointset = self.head_name == "PointSetHead"
        is_anchor = self.head_name == "AnchorHead"
        self.num_anchors = 1
        if is_anchor:
            self.anchor_spec = AnchorGeneratorSpec(cfg, self.strides)
            self.num_anchors = self.anchor_spec.num_cell_anchors[0]

        head = MetaDualStageHead(
            num_classes=self.num_classes,
            loc_dim=4 if (is_lrtb or is_anchor) else 2 * self.num_points,
            feat_adaption=p.FEAT_ADAPTION,
            num_convs=p.STACK_CONVS,
            feat_channels=p.FEAT_CHANNELS,
            norm=p.NORM,
            gradient_mul=p.GRADIENT_MUL,
            prior_prob=p.PRIOR_PROB,
            res_refine=p.RES_REFINE or is_pointset,
            has_centerness=is_lrtb,
            centerness_on_loc=p.CENTERNESS_ON_LOC,
            use_scales=is_lrtb,
            exp_decode=is_lrtb and not p.NORM_REG_TARGETS,
            num_levels=len(self.strides),
            strides=tuple(self.strides),
            num_anchors=self.num_anchors,
            dtype=dtype,
        )
        self.module = _MetaModule(
            backbone=spec.module,
            head=head,
            in_features=tuple(self.in_features),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            dtype=dtype,
        )
        self.point_strides = [s / self.strides[0] for s in self.strides]

    def init_variables(self, rng, image_hw: Tuple[int, int] = (128, 128),
                       batch_size: int = 1):
        del image_hw, batch_size
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        return jax.jit(self.module.init)(rng, images)

    # ------------------------------------------------------------ dispatch
    def loss(self, variables, batch):
        if self.head_name.startswith("LRTB"):
            return self._lrtb_loss(variables, batch)
        if self.head_name == "PointSetHead":
            return self._pointset_loss(variables, batch)
        return self._anchor_loss(variables, batch)

    def predict(self, variables, batch):
        if self.head_name.startswith("LRTB"):
            return self._lrtb_predict(variables, batch)
        if self.head_name == "PointSetHead":
            return self._pointset_predict(variables, batch)
        return self._anchor_predict(variables, batch)

    # ----------------------------------------------------------------- LRTB
    def _lrtb_outputs(self, variables, images):
        cls_l, ctr_l, init_l, refine_l = self.module.apply(variables, images)
        return cls_l, ctr_l, init_l, refine_l

    def _lrtb_loss(self, variables, batch):
        images = batch["image"]
        locations_np, counts = fcos_locations(images.shape[1:3], self.strides)
        locations = jnp.asarray(locations_np)
        soi = np.concatenate([
            np.broadcast_to(np.array(SIZES_OF_INTEREST[i], np.float32), (c, 2))
            for i, c in enumerate(counts)
        ])
        soi = jnp.asarray(soi)

        from ..layers import apply_train

        ((cls_l, ctr_l, init_l, refine_l),
         updated_buffers) = apply_train(self.module, variables, images)
        logits = jnp.concatenate(cls_l, axis=1)
        ctr = jnp.concatenate(ctr_l, axis=1)
        loc_init = jnp.concatenate(init_l, axis=1)
        loc_refine = jnp.concatenate(refine_l, axis=1)

        labels, reg_targets, gt_inds = jax.vmap(
            partial(fcos_assign_single, num_classes=self.num_classes),
            in_axes=(None, None, 0, 0, 0),
        )(locations, soi, batch["gt_boxes"], batch["gt_classes"],
          batch["gt_valid"])

        pos = labels < self.num_classes
        num_pos = jnp.maximum(jnp.sum(pos), 1.0)

        onehot = jax.nn.one_hot(labels, self.num_classes, dtype=jnp.float32)
        cls_loss = jnp.sum(
            sigmoid_focal_loss(logits, onehot * pos[..., None],
                               self.focal_alpha, self.focal_gamma)
        ) / num_pos

        safe_targets = jnp.where(pos[..., None], reg_targets, 1.0)
        ctr_fn = (compute_slender_centerness_targets
                  if self.slender_centerness else compute_centerness_targets)
        ctr_targets = jnp.where(pos, ctr_fn(safe_targets), 0.0)

        reg_pos = pos
        if self.head_name == "LRTBTopkHead":
            # top-5 positives per gt by centerness feed the localization
            # losses (the LRTBTopkHead ablation, lrtb_topk_head.py)
            G = batch["gt_boxes"].shape[1]
            per_gt = jax.nn.one_hot(gt_inds, G, dtype=jnp.float32) \
                * pos[..., None]
            scores = jnp.where(per_gt > 0, ctr_targets[..., None], -jnp.inf)
            kth = jax.lax.top_k(scores.transpose(0, 2, 1), 5)[0][..., -1]
            gate = scores >= jnp.where(jnp.isfinite(kth), kth,
                                       jnp.inf)[:, None, :]
            reg_pos = jnp.any(gate & (per_gt > 0), axis=-1)

        sum_ctr = jnp.maximum(
            jnp.sum(jnp.where(reg_pos, ctr_targets, 0.0)), 1e-6)

        l_init = iou_loss_ltrb(loc_init, safe_targets, self.iou_loss_type)
        l_ref = iou_loss_ltrb(loc_refine, safe_targets, self.iou_loss_type)
        loss_init = jnp.sum(
            jnp.where(reg_pos, l_init * ctr_targets, 0.0)) / sum_ctr
        loss_refine = jnp.sum(
            jnp.where(reg_pos, l_ref * ctr_targets, 0.0)) / sum_ctr
        ctr_loss = jnp.sum(
            jnp.where(pos, optax_sigmoid_ce(ctr, ctr_targets), 0.0)
        ) / num_pos

        total = (cls_loss * self.loss_cls_weight
                 + ctr_loss * self.loss_cls_weight
                 + loss_init * self.loss_init_weight
                 + loss_refine * self.loss_refine_weight)
        metrics = {
            "loss_cls": cls_loss,
            "centerness_loss": ctr_loss,
            "loss_loc_init": loss_init,
            "loss_loc_refine": loss_refine,
            "num_pos": num_pos,
        }
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    def _lrtb_predict(self, variables, batch):
        images = batch["image"]
        locations_np, counts = fcos_locations(images.shape[1:3], self.strides)
        from ...ops.quant import int8_predict_scope
        with int8_predict_scope(self.int8_predict):
            cls_l, ctr_l, init_l, refine_l = self._lrtb_outputs(
                variables, images)

        offsets = np.concatenate([[0], np.cumsum(counts)])
        cb, cs, cc, cv = [], [], [], []
        for lvl in range(len(counts)):
            locs = jnp.asarray(locations_np[offsets[lvl]: offsets[lvl + 1]])
            b, s, c, v, _ = _fcos_level_candidates(
                cls_l[lvl], refine_l[lvl], ctr_l[lvl], locs,
                self.score_thresh, self.topk_candidates,
            )
            cb.append(b); cs.append(s); cc.append(c); cv.append(v)
        return self._nms_all(cb, cs, cc, cv, batch)

    # ------------------------------------------------------------- PointSet
    def _centers(self, image_hw):
        # PointSet uses the RepPoints (no half-stride) grid convention
        from ..anchors import feature_map_shapes

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

    def _pointset_boxes(self, deltas_l, centers_np, counts):
        offsets = np.concatenate([[0], np.cumsum(counts)])
        out = []
        for i, deltas in enumerate(deltas_l):
            c = jnp.asarray(centers_np[offsets[i]: offsets[i + 1]])
            out.append(points2bbox(deltas, c, self.point_strides[i],
                                   self.transform_method))
        return out

    def _pointset_loss(self, variables, batch):
        images = batch["image"]
        centers_np, counts, lvls_np = self._centers(images.shape[1:3])
        centers = jnp.asarray(centers_np)
        lvls = jnp.asarray(lvls_np)
        lvl_min = int(np.log2(self.strides[0]))
        lvl_max = int(np.log2(self.strides[-1]))

        from ..layers import apply_train

        (cls_l, _, init_l, refine_l), updated_buffers = apply_train(
            self.module, variables, images)
        logits = jnp.concatenate(cls_l, axis=1)
        init_boxes = jnp.concatenate(
            self._pointset_boxes(init_l, centers_np, counts), axis=1)
        refine_boxes = jnp.concatenate(
            self._pointset_boxes(refine_l, centers_np, counts), axis=1)

        stride_per_loc = jnp.asarray(np.concatenate([
            np.full(c, s, np.float32) for c, s in zip(counts, self.strides)
        ]))

        init_obj, init_gt = jax.vmap(
            partial(rep_points_assign, lvl_min=lvl_min, lvl_max=lvl_max,
                    scale=float(self.point_base_scale)),
            in_axes=(None, None, 0, 0),
        )(centers, lvls, batch["gt_boxes"], batch["gt_valid"])

        def refine_one(init_b, gt_b, gt_c, gt_v):
            midx, mlab = iou_matcher(init_b, gt_b, gt_v, self.iou_thresholds,
                                     self.iou_labels,
                                     allow_low_quality_matches=True)
            cls = jnp.where(mlab == 1, gt_c[midx], self.num_classes)
            cls = jnp.where(mlab == -1, -1, cls)
            return cls.astype(jnp.int32), gt_b[midx]

        gt_cls, refine_gt = jax.vmap(refine_one)(
            jax.lax.stop_gradient(init_boxes),
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

        valid = gt_cls >= 0
        fg = valid & (gt_cls < self.num_classes)
        B = logits.shape[0]
        normalizer = jnp.maximum(jnp.sum(fg) / B, 1.0)

        onehot = jax.nn.one_hot(gt_cls, self.num_classes, dtype=jnp.float32)
        cls_loss = jnp.sum(
            jnp.where(valid[..., None],
                      sigmoid_focal_loss(logits, onehot, self.focal_alpha,
                                         self.focal_gamma), 0.0)
        ) / normalizer

        norm = (stride_per_loc * self.point_base_scale)[None, :, None]
        l_init = smooth_l1_loss(init_boxes / norm,
                                jnp.where(init_obj[..., None], init_gt, 1.0) / norm,
                                0.11)
        loss_init = jnp.sum(jnp.where(init_obj[..., None], l_init, 0.0)) \
            / jnp.maximum(jnp.sum(init_obj), 1.0)
        l_ref = smooth_l1_loss(refine_boxes / norm,
                               jnp.where(fg[..., None], refine_gt, 1.0) / norm,
                               0.11)
        loss_refine = jnp.sum(jnp.where(fg[..., None], l_ref, 0.0)) / normalizer

        total = (cls_loss * self.loss_cls_weight
                 + loss_init * self.loss_init_weight
                 + loss_refine * self.loss_refine_weight)
        metrics = {"loss_cls": cls_loss, "loss_loc_init": loss_init,
                   "loss_loc_refine": loss_refine, "num_pos": jnp.sum(fg)}
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    def _pointset_predict(self, variables, batch):
        from ...ops.quant import int8_predict_scope

        images = batch["image"]
        centers_np, counts, _ = self._centers(images.shape[1:3])
        with int8_predict_scope(self.int8_predict):
            cls_l, _, init_l, refine_l = self.module.apply(variables, images)
        boxes_l = self._pointset_boxes(refine_l, centers_np, counts)

        from ...ops.topk import pair_top_k

        cb, cs, cc, cv = [], [], [], []
        for logits, boxes in zip(cls_l, boxes_l):
            scores = jax.nn.sigmoid(logits.astype(jnp.float32))  # (B, L, C)
            top_scores, loc_idx, cls_idx = pair_top_k(
                scores, self.topk_candidates, approx=False)
            cb.append(jnp.take_along_axis(boxes, loc_idx[..., None], axis=1))
            cs.append(top_scores)
            cc.append(cls_idx)
            cv.append(top_scores > self.score_thresh)
        return self._nms_all(cb, cs, cc, cv, batch)

    # --------------------------------------------------------------- Anchor
    def _anchor_loss(self, variables, batch):
        images = batch["image"]
        anchors_np, counts = self.anchor_spec.anchors(images.shape[1:3])
        anchors = jnp.asarray(anchors_np)

        from ..layers import apply_train

        (cls_l, _, init_l, refine_l), updated_buffers = apply_train(
            self.module, variables, images)
        logits = jnp.concatenate(cls_l, axis=1)
        init_d = jnp.concatenate(init_l, axis=1)
        refine_d = jnp.concatenate(refine_l, axis=1)

        from .retinanet import retinanet_label_anchors

        gt_labels, matched = jax.vmap(
            partial(retinanet_label_anchors, thresholds=self.iou_thresholds,
                    labels=self.iou_labels, num_classes=self.num_classes),
            in_axes=(None, 0, 0, 0),
        )(anchors, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

        valid = gt_labels >= 0
        fg = valid & (gt_labels < self.num_classes)
        num_fg = jnp.maximum(jnp.sum(fg), 1.0)

        onehot = jax.nn.one_hot(gt_labels, self.num_classes, dtype=jnp.float32)
        cls_loss = jnp.sum(
            jnp.where(valid[..., None],
                      sigmoid_focal_loss(logits, onehot, self.focal_alpha,
                                         self.focal_gamma), 0.0)
        ) / num_fg

        safe = jnp.where(fg[..., None], matched, anchors[None] + 1.0)
        tgt = box_ops.get_deltas(
            jnp.broadcast_to(anchors[None], safe.shape), safe,
            weights=self.bbox_reg_weights)
        l_init = smooth_l1_loss(init_d, tgt, 0.11)
        l_ref = smooth_l1_loss(refine_d, tgt, 0.11)
        loss_init = jnp.sum(jnp.where(fg[..., None], l_init, 0.0)) / num_fg
        loss_refine = jnp.sum(jnp.where(fg[..., None], l_ref, 0.0)) / num_fg

        total = (cls_loss * self.loss_cls_weight
                 + loss_init * self.loss_init_weight
                 + loss_refine * self.loss_refine_weight)
        metrics = {"loss_cls": cls_loss, "loss_loc_init": loss_init,
                   "loss_loc_refine": loss_refine, "num_pos": num_fg}
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    def _anchor_predict(self, variables, batch):
        from ...ops.quant import int8_predict_scope

        images = batch["image"]
        anchors_np, counts = self.anchor_spec.anchors(images.shape[1:3])
        with int8_predict_scope(self.int8_predict):
            cls_l, _, init_l, refine_l = self.module.apply(variables, images)

        from ...ops.topk import pair_top_k

        offsets = np.concatenate([[0], np.cumsum(counts)])
        cb, cs, cc, cv = [], [], [], []
        for lvl in range(len(counts)):
            lvl_anchors = jnp.asarray(anchors_np[offsets[lvl]: offsets[lvl + 1]])
            logits, regs = cls_l[lvl], refine_l[lvl]
            scores = jax.nn.sigmoid(logits.astype(jnp.float32))  # (B, N, C)
            top_scores, a_idx, cls_idx = pair_top_k(
                scores, self.topk_candidates, approx=False)
            sel_regs = jnp.take_along_axis(regs, a_idx[..., None], axis=1)
            boxes = box_ops.apply_deltas(sel_regs, lvl_anchors[a_idx],
                                         weights=self.bbox_reg_weights)
            cb.append(boxes)
            cs.append(top_scores)
            cc.append(cls_idx)
            cv.append(top_scores > self.score_thresh)
        return self._nms_all(cb, cs, cc, cv, batch)

    # ---------------------------------------------------------------- utils
    def _nms_all(self, cb, cs, cc, cv, batch):
        boxes = jnp.concatenate(cb, axis=1)
        scores = jnp.concatenate(cs, axis=1)
        classes = jnp.concatenate(cc, axis=1)
        valid = jnp.concatenate(cv, axis=1)

        def one(bx, sc, cl, vl, scale, orig_hw):
            keep_idx, keep_valid = batched_nms(
                bx, sc, cl, self.nms_thresh, self.max_dets, valid=vl
            )
            kb = bx[keep_idx] / scale
            kb = box_ops.clip(kb, orig_hw[0], orig_hw[1])
            return kb, sc[keep_idx], cl[keep_idx], keep_valid

        ob, os_, oc, ov = jax.vmap(one)(
            boxes, scores, classes, valid,
            batch["scale"].astype(jnp.float32),
            batch["orig_size"].astype(jnp.float32),
        )
        return {"boxes": ob, "scores": os_, "classes": oc, "valid": ov}
