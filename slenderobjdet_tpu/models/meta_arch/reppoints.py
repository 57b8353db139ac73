"""RepPoints detector, TPU-native.

Counterpart of the reference `RepPointsDetector`
(`slender_det/modeling/meta_arch/reppoints/rpd.py:45-798`):
- shared 3x(conv+GN+relu) cls/reg towers (rpd.py:191-203)
- offsets_init stack -> 18-channel point offsets; deformable conv with the
  gradient_mul blend and (x,y)->(y,x) flip (rpd.py:616-645); the reference's
  "- dcn_base_offset then + base inside DCN" cancels under our absolute
  offset convention (ops/deform_conv.py)
- points2bbox minmax/moment transforms with per-level point_strides
  stride/8 (rpd.py:221-275,650)
- init-stage assignment by nearest-point matching at the gt's pyramid level
  (matchers/rep_matcher.py:9-101), refine-stage by IoU Matcher on init boxes
- losses: focal(cls, valid) + smooth-L1(beta .11) on boxes normalized by
  4*stride, init weighted 0.5 (rpd.py:335-403); the EMA loss normalizer
  (init 20, momentum 0.9, rpd.py:121-122,385-388) is carried in
  TrainState.buffers["loss_normalizer"] and written back by the train step
- init-stage matcher selected by MODEL.PROPOSAL_GENERATOR.SAMPLE_MODE
  (rpd.py:125-137): point(s) / nearest_points / inside
- RetinaNet-style per-level topk inference on refine boxes

Centers follow the reference convention (x, y) = (ix, iy) * stride with NO
half-stride shift (rpd.py:204-219, uniform_grid).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.deform_conv import (
    deform_apply,
    deform_conv2d_batched,
    deform_sample_batched,
)
from ...ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.nms import batched_nms
from ...structures import boxes as box_ops
from ..anchors import feature_map_shapes
from ..backbones.fpn import build_backbone
from ..matchers import iou_matcher


class DeformConvLayer(nn.Module):
    """3x3 deformable conv with our absolute-offset convention."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offsets=None, samples=None):
        """x (B,H,W,Cin); offsets (B,H,W,K,2) (dy,dx) absolute. When
        `samples` (B,H,W,K,Cin) is precomputed (shared gather across several
        deform convs at the same offsets), only the MXU matmul runs here."""
        k = self.kernel * self.kernel
        cin = x.shape[-1] if samples is None else samples.shape[-1]
        weight = self.param(
            "weight", nn.initializers.normal(stddev=0.01),
            (k, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if samples is not None:
            return deform_apply(samples, weight, bias, out_dtype=self.dtype)
        # features stay in the compute dtype: the bilinear gather is
        # HBM-bandwidth-bound, bf16 halves the traffic (offsets fp32)
        return deform_conv2d_batched(
            x, offsets.astype(jnp.float32), weight, bias
        ).astype(self.dtype)


class RepPointsHead(nn.Module):
    num_classes: int
    num_points: int = 9
    feat_channels: int = 256
    stack_convs: int = 3
    gradient_mul: float = 0.1
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        """Returns per-level (B,HW,C) logits, (B,HW,2P) init deltas,
        (B,HW,2P) refine deltas. Deltas are (x,y)*P in feature-pixel units."""
        init = nn.initializers.normal(stddev=0.01)
        C = self.feat_channels
        P = self.num_points

        def tower(prefix):
            return [
                (
                    nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=init,
                            name=f"{prefix}_conv{i}"),
                    nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                                 param_dtype=jnp.float32,
                                 name=f"{prefix}_gn{i}"),
                )
                for i in range(self.stack_convs)
            ]

        cls_tower = tower("cls")
        reg_tower = tower("reg")
        off_init_c1 = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                              param_dtype=jnp.float32, kernel_init=init,
                              name="offsets_init_conv")
        off_init_c2 = nn.Conv(2 * P, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32, kernel_init=init,
                              name="offsets_init_out")
        deform_cls = DeformConvLayer(C, dtype=self.dtype, name="deform_cls_conv")
        deform_reg = DeformConvLayer(C, dtype=self.dtype, name="deform_reg_conv")
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob)
        )
        logits_out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32, kernel_init=init,
                             bias_init=bias_init, name="logits_out")
        off_refine_out = nn.Conv(2 * P, (1, 1), dtype=self.dtype,
                                 param_dtype=jnp.float32, kernel_init=init,
                                 name="offsets_refine_out")

        all_logits, all_init, all_refine = [], [], []
        for feat in feats:
            b, h, w, _ = feat.shape
            cf, rf = feat, feat
            for conv, gn in cls_tower:
                cf = nn.relu(gn(conv(cf)).astype(self.dtype))
            for conv, gn in reg_tower:
                rf = nn.relu(gn(conv(rf)).astype(self.dtype))

            off_init = off_init_c2(nn.relu(off_init_c1(rf)))
            off_init = off_init.astype(jnp.float32)          # (B,H,W,2P) (x,y)*P

            # gradient_mul blend then (x,y)->(y,x) for sampling
            gm = (1 - self.gradient_mul) * jax.lax.stop_gradient(off_init) \
                + self.gradient_mul * off_init
            pts = gm.reshape(b, h, w, P, 2)
            sample_off = pts[..., ::-1]                       # (dy,dx)

            # the cls/reg deform convs sample the SAME positions
            # (rpd.py:641-645): gather ONCE from the channel-concat features
            # (wider rows halve the row count of the bandwidth-bound gather)
            C = cf.shape[-1]
            cat = jnp.concatenate([cf, rf], axis=-1)
            samples = deform_sample_batched(
                cat, sample_off.astype(jnp.float32))          # (B,H,W,K,2C)
            dc = deform_cls(cf, samples=samples[..., :C])
            dr = deform_reg(rf, samples=samples[..., C:])

            logits = logits_out(nn.relu(dc)).astype(jnp.float32)
            off_refine = off_refine_out(nn.relu(dr)).astype(jnp.float32)
            off_refine = off_refine + jax.lax.stop_gradient(off_init)

            all_logits.append(logits.reshape(b, h * w, self.num_classes))
            all_init.append(off_init.reshape(b, h * w, 2 * P))
            all_refine.append(off_refine.reshape(b, h * w, 2 * P))
        return all_logits, all_init, all_refine


class RepPointsModule(nn.Module):
    backbone: nn.Module
    head: RepPointsHead
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


def points2bbox(deltas, centers, point_stride, method="minmax",
                moment_transfer=None, moment_mul=0.01):
    """deltas (B, L, 2P) (x,y)-pairs; centers (L, 2) -> (B, L, 4) XYXY."""
    B, L, twoP = deltas.shape
    P = twoP // 2
    pts = deltas.reshape(B, L, P, 2) * point_stride + centers[None, :, None, :]
    px, py = pts[..., 0], pts[..., 1]
    if method == "minmax":
        return jnp.stack(
            [px.min(-1), py.min(-1), px.max(-1), py.max(-1)], axis=-1
        )
    if method == "moment":
        mx, my = px.mean(-1), py.mean(-1)
        # gradient-safe std: jnp.std's sqrt has an inf gradient when all P
        # points coincide (e.g. BatchNorm collapsing a 1x1-spatial level to
        # exactly zero offsets), and a masked loss turns 0 * inf into NaN.
        # eps inside the sqrt shifts the value by < 1e-6 px.
        sx = jnp.sqrt(jnp.mean(jnp.square(px - mx[..., None]), -1) + 1e-12)
        sy = jnp.sqrt(jnp.mean(jnp.square(py - my[..., None]), -1) + 1e-12)
        mt = (moment_transfer * moment_mul
              + jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul))
        hw_ = sx * jnp.exp(mt[0])
        hh = sy * jnp.exp(mt[1])
        return jnp.stack([mx - hw_, my - hh, mx + hw_, my + hh], axis=-1)
    raise ValueError(method)


def rep_points_assign(
    centers: jnp.ndarray,      # (L, 2) xy
    point_lvls: jnp.ndarray,   # (L,) int log2 stride
    gt_boxes: jnp.ndarray,     # (G, 4)
    gt_valid: jnp.ndarray,     # (G,)
    lvl_min: int,
    lvl_max: int,
    scale: float = 4.0,
    pos_num: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized rep_points_match (matchers/rep_matcher.py:9-101):
    a point is positive iff it is among the pos_num nearest points to some
    gt's center at the gt's pyramid level; conflicts resolve to the nearest
    gt. Returns (objectness (L,) bool, matched gt boxes (L, 4))."""
    gt_xy = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2
    gt_wh = jnp.clip(gt_boxes[:, 2:] - gt_boxes[:, :2], 1e-6, None)
    gt_lvl = ((jnp.log2(gt_wh[:, 0] / scale) + jnp.log2(gt_wh[:, 1] / scale))
              / 2).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

    # (G, L) normalized center distances, inf off-level / invalid
    d = jnp.linalg.norm(
        (centers[None, :, :] - gt_xy[:, None, :]) / gt_wh[:, None, :], axis=-1
    )
    on_lvl = point_lvls[None, :] == gt_lvl[:, None]
    d = jnp.where(on_lvl & gt_valid[:, None], d, jnp.inf)

    # per-gt pos_num nearest points
    neg_d, top_idx = jax.lax.top_k(-d, pos_num)            # (G, pos_num)
    picked = jnp.isfinite(neg_d)
    vals = jnp.where(picked, jnp.take_along_axis(d, top_idx, axis=1), jnp.inf)
    # candidate matrix: (G, L) distance where point is picked by gt
    rows = jnp.broadcast_to(
        jnp.arange(d.shape[0])[:, None], top_idx.shape
    ).reshape(-1)
    cand = jnp.full(d.shape, jnp.inf).at[rows, top_idx.reshape(-1)].min(
        vals.reshape(-1)
    )

    best = jnp.min(cand, axis=0)                           # (L,)
    best_gt = jnp.argmin(cand, axis=0)
    objectness = jnp.isfinite(best)
    matched_boxes = gt_boxes[best_gt]
    return objectness, matched_boxes


def inside_assign(centers, point_lvls, stride_per_loc, gt_boxes, gt_valid,
                  lvl_min, lvl_max, scale=4.0):
    """Vectorized inside_match (matchers/rep_matcher.py:222-270): a point is
    positive iff its stride cell overlaps some gt box at the gt's matched
    pyramid level; labels come from the nearest gt center; falls back to
    nearest-point matching when no point is inside any box."""
    gt_xy = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2
    gt_wh = jnp.clip(gt_boxes[:, 2:] - gt_boxes[:, :2], 1e-6, None)
    gt_lvl = ((jnp.log2(gt_wh[:, 0] / scale) + jnp.log2(gt_wh[:, 1] / scale))
              / 2).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)
    on_lvl = point_lvls[None, :] == gt_lvl[:, None]          # (G, L)

    upper = centers + stride_per_loc[:, None]                # (L, 2)
    inside = (
        (upper[None, :, 0] >= gt_boxes[:, None, 0])
        & (upper[None, :, 1] >= gt_boxes[:, None, 1])
        & (centers[None, :, 0] <= gt_boxes[:, None, 2])
        & (centers[None, :, 1] <= gt_boxes[:, None, 3])
        & on_lvl & gt_valid[:, None]
    )
    obj_inside = inside.any(axis=0)                           # (L,)

    d = jnp.linalg.norm(
        (centers[None, :, :] - gt_xy[:, None, :]) / gt_wh[:, None, :], axis=-1
    )
    d = jnp.where(gt_valid[:, None], d, jnp.inf)
    nearest_gt = jnp.argmin(d, axis=0)                        # (L,)
    boxes_inside = gt_boxes[nearest_gt]

    obj_near, boxes_near = rep_points_assign(
        centers, point_lvls, gt_boxes, gt_valid, lvl_min, lvl_max, scale, 1
    )
    any_inside = obj_inside.any()
    objectness = jnp.where(any_inside, obj_inside, obj_near)
    boxes_out = jnp.where(any_inside, boxes_inside, boxes_near)
    return objectness, boxes_out


def rep_points_assign_with_idx(centers, point_lvls, gt_boxes, gt_valid,
                               lvl_min, lvl_max, scale=4.0, pos_num=1):
    """rep_points_assign variant also returning the matched gt index
    (rep_points_match_with_classes, rep_matcher.py:104+)."""
    gt_xy = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2
    gt_wh = jnp.clip(gt_boxes[:, 2:] - gt_boxes[:, :2], 1e-6, None)
    gt_lvl = ((jnp.log2(gt_wh[:, 0] / scale) + jnp.log2(gt_wh[:, 1] / scale))
              / 2).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)
    d = jnp.linalg.norm(
        (centers[None, :, :] - gt_xy[:, None, :]) / gt_wh[:, None, :], axis=-1
    )
    on_lvl = point_lvls[None, :] == gt_lvl[:, None]
    d = jnp.where(on_lvl & gt_valid[:, None], d, jnp.inf)
    neg_d, top_idx = jax.lax.top_k(-d, pos_num)
    picked = jnp.isfinite(neg_d)
    vals = jnp.where(picked, jnp.take_along_axis(d, top_idx, axis=1), jnp.inf)
    rows = jnp.broadcast_to(
        jnp.arange(d.shape[0])[:, None], top_idx.shape
    ).reshape(-1)
    cand = jnp.full(d.shape, jnp.inf).at[rows, top_idx.reshape(-1)].min(
        vals.reshape(-1)
    )
    best = jnp.min(cand, axis=0)
    best_gt = jnp.argmin(cand, axis=0)
    return jnp.isfinite(best), best_gt


class RepPointsDetector:
    """Config-driven RepPoints (same detector interface as FCOS/RetinaNet)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.int8_predict = cfg.TPU.INT8_PREDICT
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        rp = cfg.MODEL.REPPOINTS
        rn = cfg.MODEL.RETINANET
        self.num_classes = rn.NUM_CLASSES
        self.in_features = list(rn.IN_FEATURES)
        self.focal_alpha = rn.FOCAL_LOSS_ALPHA
        self.focal_gamma = rn.FOCAL_LOSS_GAMMA
        self.topk_candidates = rn.TOPK_CANDIDATES_TEST
        self.score_thresh = rn.SCORE_THRESH_TEST
        self.nms_thresh = rn.NMS_THRESH_TEST
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
        self.num_points = rp.NUM_POINTS
        self.point_base_scale = rp.POINT_BASE_SCALE
        self.transform_method = rp.TRANSFORM_METHOD
        self.iou_thresholds = list(rn.IOU_THRESHOLDS)
        self.iou_labels = list(rn.IOU_LABELS)
        self.approx_topk = cfg.TPU.APPROX_TOPK

        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        self.strides = [spec.strides[f] for f in self.in_features]
        self.point_strides = [s // self.strides[0] * 1.0 for s in self.strides]
        # stage-1 positives per gt (FCOSRepPoints hybrid widens this to 3)
        self.init_pos_num = 1
        # init-stage matcher (rpd.py:125-137 / retina_reppoints.py:66-75):
        # "point(s)" k-nearest, "nearest_points" strict nearest, "inside" cell
        self.sample_mode = cfg.MODEL.PROPOSAL_GENERATOR.SAMPLE_MODE
        # EMA loss normalizer carried in TrainState.buffers
        # (rpd.py:121-122,385-388): init 20, momentum 0.9
        self.loss_normalizer_momentum = 0.9
        self.loss_normalizer_init = 20.0

        self.module = RepPointsModule(
            backbone=spec.module,
            head=RepPointsHead(
                num_classes=self.num_classes,
                num_points=self.num_points,
                feat_channels=rp.POINT_FEAT_CHANNELS,
                stack_convs=rp.STACK_CONVS,
                gradient_mul=rp.GRADIENT_MUL,
                prior_prob=rp.PRIOR_PROB,
                dtype=dtype,
            ),
            in_features=tuple(self.in_features),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            dtype=dtype,
        )

    def init_variables(self, rng, image_hw: Tuple[int, int] = (128, 128),
                       batch_size: int = 1):
        del image_hw, batch_size
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = dict(jax.jit(self.module.init)(rng, images))
        buffers = dict(variables.get("buffers", {}))
        buffers["loss_normalizer"] = jnp.asarray(self.loss_normalizer_init,
                                                 jnp.float32)
        variables["buffers"] = buffers
        return variables

    def _module_variables(self, variables):
        """Strip the detector-level loss_normalizer buffer before applying
        the flax module (it is not a module variable)."""
        buffers = variables.get("buffers")
        if not buffers or "loss_normalizer" not in buffers:
            return variables
        rest = {k: v for k, v in buffers.items() if k != "loss_normalizer"}
        out = {"params": variables["params"]}
        if rest:
            out["buffers"] = rest
        return out

    # ----------------------------------------------------------- geometry
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

    def _decode_boxes(self, deltas_l, centers_np, counts):
        offsets = np.concatenate([[0], np.cumsum(counts)])
        boxes = []
        for i, deltas in enumerate(deltas_l):
            c = jnp.asarray(centers_np[offsets[i]: offsets[i + 1]])
            boxes.append(
                points2bbox(deltas, c, self.point_strides[i],
                            self.transform_method)
            )
        return boxes

    # ---------------------------------------------------------------- loss
    def loss(self, variables, batch):
        from ..layers import apply_train

        (logits_l, init_l, refine_l), updated_buffers = apply_train(
            self.module, self._module_variables(variables), batch["image"]
        )
        total, metrics = self._loss_from_outputs(variables, batch,
                                                 logits_l, init_l, refine_l)
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    def _loss_from_outputs(self, variables, batch, logits_l, init_l, refine_l):
        images = batch["image"]
        centers_np, counts, lvls_np = self._centers(images.shape[1:3])
        centers = jnp.asarray(centers_np)
        lvls = jnp.asarray(lvls_np)
        lvl_min = int(np.log2(self.strides[0]))
        lvl_max = int(np.log2(self.strides[-1]))

        init_boxes = jnp.concatenate(
            self._decode_boxes(init_l, centers_np, counts), axis=1)
        refine_boxes = jnp.concatenate(
            self._decode_boxes(refine_l, centers_np, counts), axis=1)
        logits = jnp.concatenate(logits_l, axis=1)

        stride_per_loc = jnp.asarray(
            np.concatenate([
                np.full(c, s, np.float32) for c, s in zip(counts, self.strides)
            ])
        )

        # init assignment -- matcher selected by SAMPLE_MODE, no dependence
        # on predictions
        if self.sample_mode == "inside":
            init_obj, init_gt_boxes = jax.vmap(
                partial(inside_assign, lvl_min=lvl_min, lvl_max=lvl_max,
                        scale=float(self.point_base_scale)),
                in_axes=(None, None, None, 0, 0),
            )(centers, lvls, stride_per_loc,
              batch["gt_boxes"], batch["gt_valid"])
        else:
            pos_num = (1 if self.sample_mode == "nearest_points"
                       else self.init_pos_num)
            init_obj, init_gt_boxes = jax.vmap(
                partial(rep_points_assign, lvl_min=lvl_min, lvl_max=lvl_max,
                        scale=float(self.point_base_scale),
                        pos_num=pos_num),
                in_axes=(None, None, 0, 0),
            )(centers, lvls, batch["gt_boxes"], batch["gt_valid"])

        # refine assignment: IoU match against the (detached) init boxes
        def refine_one(init_b, gt_b, gt_c, gt_v):
            midx, mlab = iou_matcher(
                init_b, gt_b, gt_v, self.iou_thresholds, self.iou_labels,
                allow_low_quality_matches=True,
            )
            cls = jnp.where(mlab == 1, gt_c[midx], self.num_classes)
            cls = jnp.where(mlab == -1, -1, cls)
            return cls.astype(jnp.int32), gt_b[midx]

        gt_cls, refine_gt_boxes = jax.vmap(refine_one)(
            jax.lax.stop_gradient(init_boxes),
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        )

        valid = gt_cls >= 0
        fg = valid & (gt_cls < self.num_classes)
        B = logits.shape[0]
        num_fg_per_img = jnp.sum(fg).astype(jnp.float32) / B

        # EMA loss normalizer (rpd.py:385-388: updated BEFORE use). The
        # running value lives in TrainState.buffers["loss_normalizer"]; the
        # train step writes back metrics["loss_normalizer"]. Falls back to
        # the per-batch mean when no buffer is supplied (pure-loss callers).
        prev = variables.get("buffers", {}).get("loss_normalizer", None)
        if prev is None:
            new_normalizer = num_fg_per_img
        else:
            m = self.loss_normalizer_momentum
            new_normalizer = m * prev + (1.0 - m) * num_fg_per_img
        normalizer = jnp.maximum(new_normalizer, 1.0)

        onehot = jax.nn.one_hot(gt_cls, self.num_classes, dtype=jnp.float32)
        cls_all = sigmoid_focal_loss(logits, onehot, self.focal_alpha,
                                     self.focal_gamma)
        loss_cls = jnp.sum(jnp.where(valid[..., None], cls_all, 0.0)) / normalizer

        norm_init = (stride_per_loc * self.point_base_scale)[None, :, None]
        safe_init_gt = jnp.where(init_obj[..., None], init_gt_boxes, 1.0)
        l_init = smooth_l1_loss(init_boxes / norm_init,
                                safe_init_gt / norm_init, 0.11)
        loss_init = jnp.sum(
            jnp.where(init_obj[..., None], l_init, 0.0)
        ) / jnp.maximum(jnp.sum(init_obj), 1.0) * 0.5

        safe_ref_gt = jnp.where(fg[..., None], refine_gt_boxes, 1.0)
        l_ref = smooth_l1_loss(refine_boxes / norm_init,
                               safe_ref_gt / norm_init, 0.11)
        loss_refine = jnp.sum(jnp.where(fg[..., None], l_ref, 0.0)) / normalizer

        total = loss_cls + loss_init + loss_refine
        return total, {
            "loss_cls": loss_cls,
            "loss_localization_init": loss_init,
            "loss_localization_refine": loss_refine,
            "num_pos": jnp.sum(fg),
            "loss_normalizer": jax.lax.stop_gradient(new_normalizer),
        }

    # ------------------------------------------------------------ inference
    def predict(self, variables, batch):
        from ...ops.quant import int8_predict_scope

        with int8_predict_scope(self.int8_predict):
            logits_l, init_l, refine_l = self.module.apply(
                self._module_variables(variables), batch["image"]
            )
        return self._predict_from_outputs(batch, logits_l, refine_l)

    def _predict_from_outputs(self, batch, logits_l, refine_l):
        images = batch["image"]
        centers_np, counts, _ = self._centers(images.shape[1:3])
        boxes_l = self._decode_boxes(refine_l, centers_np, counts)

        from ...ops.topk import pair_top_k

        cb, cs, cc, cv = [], [], [], []
        for lvl, (logits, boxes) in enumerate(zip(logits_l, boxes_l)):
            scores = jax.nn.sigmoid(logits.astype(jnp.float32))  # (B, L, C)
            top_scores, loc_idx, cls_idx = pair_top_k(
                scores, self.topk_candidates, approx=self.approx_topk)
            sel_boxes = jnp.take_along_axis(boxes, loc_idx[..., None], axis=1)
            cb.append(sel_boxes)
            cs.append(top_scores)
            cc.append(cls_idx)
            cv.append(top_scores > self.score_thresh)

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
