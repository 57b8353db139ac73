"""Hybrid / variant meta-architectures.

Functional counterparts of the reference's experiment variants (SURVEY.md
§2.5). Each reuses the core machinery (FCOS assignment, RepPoints point
matching, RetinaNet anchors) rather than duplicating it:

- RepPointsCenterness (`reppoints/rpd_centerness.py:125-925`): RepPoints
  plus a centerness branch on the refine features; inference multiplies
  cls scores by the centerness gate. SLENDER_CENTERNESS switches the target
  to the ratio-tempered variant.
- FCOSRetinaNet / FCOSNCRetinaNet (`retina/retina_fcosv2.py:34-386`,
  `retina_fcosv2_nc.py:56-414`): FCOS heads (LTRB at locations) on the
  RetinaNet chassis, with (NC = without) the centerness branch — the
  reference's centerness ablation pair.
- PointRetinaNet (`retina/retina_points.py:28-473`): RetinaNet with
  point-based (nearest-at-level) assignment.
- ReppointsRetinaNet (`retina/retina_reppoints.py:30-712`): RetinaNet-style
  single-anchor head regressing 2P point offsets decoded by minmax.
- FCOSRepPoints (`fcos/fcos_rpd_s1_topk.py:137-745`): FCOS towers with
  RepPoints deformable refinement; stage-1 point-match assignment, stage-2
  IoU matching on init boxes (the active hybrid variant).
- RepPointsV2 (`reppoints/reppointsv2.py:85-754`): the reference's
  self-contained RepPoints reimplementation — full-stride offset decode,
  MaxIoU .5/.4 refine assignment, batch-total loss normalizers (see the
  class docstring; the file contains NO verification/corner branch).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import optax_sigmoid_ce, sigmoid_focal_loss
from ...structures import boxes as box_ops
from .ablation import compute_slender_centerness_targets
from .fcos import FCOS, compute_centerness_targets
from .reppoints import (
    RepPointsDetector,
    RepPointsHead,
    RepPointsModule,
    rep_points_assign,
)
from .retinanet import RetinaNet


# --------------------------------------------------------- RepPoints + ctr
class RepPointsCenternessHead(RepPointsHead):
    """RepPointsHead with an extra centerness output on the refine branch."""

    @nn.compact
    def __call__(self, feats):
        logits_l, init_l, refine_l = super().__call__(feats)
        # centerness from the same per-level features: a light 1x1 over the
        # classification logits' spatial grid via a dedicated conv stack
        ctn = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=nn.initializers.normal(stddev=0.01),
                      name="ctn_out")
        ctr_l = []
        for feat, logits in zip(feats, logits_l):
            b, h, w, _ = feat.shape
            ctr_l.append(ctn(feat).astype(jnp.float32).reshape(b, h * w))
        return logits_l, init_l, refine_l, ctr_l


class RepPointsCenterness(RepPointsDetector):
    def __init__(self, cfg):
        super().__init__(cfg)
        rp = cfg.MODEL.REPPOINTS
        self.slender_centerness = cfg.MODEL.META_ARCH.SLENDER_CENTERNESS
        head = RepPointsCenternessHead(
            num_classes=self.num_classes,
            num_points=self.num_points,
            feat_channels=rp.POINT_FEAT_CHANNELS,
            stack_convs=rp.STACK_CONVS,
            gradient_mul=rp.GRADIENT_MUL,
            prior_prob=rp.PRIOR_PROB,
            dtype=self.module.dtype,
        )
        self.module = RepPointsModule(
            backbone=self.module.backbone,
            head=head,
            in_features=self.module.in_features,
            pixel_mean=self.module.pixel_mean,
            pixel_std=self.module.pixel_std,
            dtype=self.module.dtype,
        )

    def loss(self, variables, batch):
        # centerness-augmented variant of RepPointsDetector.loss
        images = batch["image"]
        centers_np, counts, lvls_np = self._centers(images.shape[1:3])
        from ..layers import apply_train

        (logits_l, init_l, refine_l, ctr_l), updated_buffers = apply_train(
            self.module, self._module_variables(variables), images
        )
        ctr = jnp.concatenate(ctr_l, axis=1)

        total, metrics = self._loss_from_outputs(
            variables, batch, logits_l, init_l, refine_l
        )

        # centerness target from the refine gt ltrb at each center
        refine_boxes = jnp.concatenate(
            self._decode_boxes(refine_l, centers_np, counts), axis=1)
        centers = jnp.asarray(centers_np)

        # per-image fg mask: positions matched by the refine matcher
        def one_img(rb, gt_b, gt_v):
            from ..matchers import iou_matcher

            midx, mlab = iou_matcher(jax.lax.stop_gradient(rb), gt_b, gt_v,
                                     self.iou_thresholds, self.iou_labels,
                                     allow_low_quality_matches=True)
            matched = gt_b[midx]
            ltrb = jnp.stack([
                centers[:, 0] - matched[:, 0], centers[:, 1] - matched[:, 1],
                matched[:, 2] - centers[:, 0], matched[:, 3] - centers[:, 1],
            ], axis=-1)
            return mlab == 1, ltrb

        fg, ltrb = jax.vmap(one_img)(
            refine_boxes, batch["gt_boxes"], batch["gt_valid"])
        safe = jnp.where(fg[..., None], ltrb, 1.0)
        ctr_fn = (compute_slender_centerness_targets
                  if self.slender_centerness else compute_centerness_targets)
        tgt = jnp.where(fg, ctr_fn(safe), 0.0)
        num_pos = jnp.maximum(jnp.sum(fg), 1.0)
        ctr_loss = jnp.sum(
            jnp.where(fg, optax_sigmoid_ce(ctr, tgt), 0.0)) / num_pos
        metrics = dict(metrics)
        metrics["centerness_loss"] = ctr_loss
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total + ctr_loss, metrics

    def predict(self, variables, batch):
        from ...ops.quant import int8_predict_scope

        images = batch["image"]
        with int8_predict_scope(self.int8_predict):
            logits_l, init_l, refine_l, ctr_l = self.module.apply(
                self._module_variables(variables), images
            )
        # gate logits by centerness before the shared decode
        gated = [
            lg + jax.nn.log_sigmoid(ct)[..., None]
            for lg, ct in zip(logits_l, ctr_l)
        ]
        return self._predict_from_outputs(batch, gated, refine_l)


# ------------------------------------------ RetinaNet-chassis FCOS variants
class FCOSRetinaNet(FCOS):
    """The reference's FCOSRetinaNet (retina_fcosv2.py:34-386) is an FCOS
    head — GN towers, per-level Scale, LTRB regression, CENTERNESS branch —
    mounted on the d2 RetinaNet chassis. Losses: focal/num_pos, IoU loss
    weighted by centerness targets normalized by their sum
    (retina_fcosv2.py:163-180), BCE centerness/num_pos; inference ranks by
    sqrt(cls*ctr). That is exactly this repo's FCOS-with-centerness."""

    def __init__(self, cfg):
        super().__init__(cfg, use_centerness=True)


class FCOSNCRetinaNet(FCOS):
    """No-centerness ablation partner (retina_fcosv2_nc.py:56-414): head
    WITHOUT the centerness conv (:373), reg loss normalized by num_pos
    instead of the centerness sum (:202-206), inference ranked by raw cls
    scores (:240-268)."""

    def __init__(self, cfg):
        super().__init__(cfg, use_centerness=False)


class PointRetinaNet(RetinaNet):
    """RetinaNet with point-based assignment (retina_points.py)."""

    def __init__(self, cfg):
        super().__init__(cfg, assign_mode="nearest")


# ------------------------------------------------- RetinaNet-head RepPoints
class ReppointsRetinaNetHead(RepPointsHead):
    """The reference's ReppointsRetinaNetHead (retina_reppoints.py:554-653):
    structurally the RepPoints stacked-conv + DCN head with hard-coded
    point_feat_channels=256, 3 stacked convs, gradient_mul=0.1 (:566,587,641)
    instead of the MODEL.REPPOINTS knobs. Upstream emits num_classes-1 cls
    channels with its own 'maybe not right' comment (:567) — corrected to
    num_classes here so the decode indexes real classes."""


class ReppointsRetinaNet(RepPointsDetector):
    """RetinaNet-chassis point-set detector (retina_reppoints.py:30-712):
    a 2P-point-offset head under MODEL.RETINANET config keys, num_points
    from MODEL.PROPOSAL_GENERATOR.NUM_POINTS (:47), init matcher selected by
    MODEL.PROPOSAL_GENERATOR.SAMPLE_MODE (:66-75), EMA loss normalizer
    (:56-57, inherited via RepPointsDetector buffers), minmax points2bbox
    with point_strides [1,2,4,8,16] (:117-118)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.num_points = cfg.MODEL.PROPOSAL_GENERATOR.NUM_POINTS
        self.transform_method = "minmax"  # points2bbox (:317-359) is minmax
        head = ReppointsRetinaNetHead(
            num_classes=self.num_classes,
            num_points=self.num_points,
            feat_channels=256,
            stack_convs=3,
            gradient_mul=0.1,
            prior_prob=0.01,
            dtype=self.module.dtype,
        )
        self.module = RepPointsModule(
            backbone=self.module.backbone,
            head=head,
            in_features=self.module.in_features,
            pixel_mean=self.module.pixel_mean,
            pixel_std=self.module.pixel_std,
            dtype=self.module.dtype,
        )


# ----------------------------------------- FCOS-RepPoints hybrid (s1 topk)
class FCOSRepPoints(RepPointsDetector):
    """FCOS+RepPoints hybrid (fcos_rpd_s1_topk.py): RepPoints structure with
    the init stage assigned by nearest-point matching with pos_num=3
    ("topk" stage-1) instead of 1."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.init_pos_num = 3


# ---------------------------------------------------------- RepPoints V2
class RepPointsV2(RepPointsDetector):
    """Faithful counterpart of the reference's RepPointsV2
    (reppointsv2.py:85-754). NOTE: despite its name, the reference class is
    NOT the mmdet RepPointsV2 paper — there is no corner/foreground
    verification branch anywhere in the file (the head at :616-754 is a
    plain RepPoints head, and `grep -r corner|heatmap` over the reference's
    modeling tree finds nothing). It is a self-contained RepPoints
    reimplementation whose observable differences from rpd.py are:

    - point offsets decoded at the FULL stride: pts*stride + center
      (:262-266,284), vs rpd.py's stride/8 point_strides convention
    - refine assignment by direct MaxIoU thresholds pos>=.5 / neg<.4 with NO
      ignore band, plus gt-max augmentation, on min-0-clamped init boxes
      (:431-484)
    - losses normalized by batch-TOTAL num_pos (no EMA, no /batch), with
      cfg weights LOSS_CLS/BBOX_INIT/BBOX_REFINE_WEIGHT (:296-321)
    - inference params read from MODEL.REPPOINTS.*_TEST (:124-128)
    - shift grid offset 0 (:47), same as the base class convention
    """

    def __init__(self, cfg):
        super().__init__(cfg)
        rp = cfg.MODEL.REPPOINTS
        self.num_classes = rp.NUM_CLASSES
        self.in_features = list(rp.IN_FEATURES)
        self.focal_alpha = rp.FOCAL_LOSS_ALPHA
        self.focal_gamma = rp.FOCAL_LOSS_GAMMA
        self.score_thresh = rp.SCORE_THRESH_TEST
        self.topk_candidates = rp.TOPK_CANDIDATES_TEST
        self.nms_thresh = rp.NMS_THRESH_TEST
        self.loss_cls_weight = rp.LOSS_CLS_WEIGHT
        self.loss_init_weight = rp.LOSS_BBOX_INIT_WEIGHT
        self.loss_refine_weight = rp.LOSS_BBOX_REFINE_WEIGHT
        self.strides = [self.backbone_spec.strides[f] for f in self.in_features]
        # V2 decodes offsets at the full stride (reppointsv2.py:262-266)
        self.point_strides = [float(s) for s in self.strides]
        head = RepPointsHead(
            num_classes=self.num_classes,
            num_points=self.num_points,
            feat_channels=rp.FEAT_CHANNELS,
            stack_convs=rp.STACK_CONVS,
            gradient_mul=rp.GRADIENT_MUL,
            prior_prob=rp.PRIOR_PROB,
            dtype=self.module.dtype,
        )
        self.module = RepPointsModule(
            backbone=self.module.backbone,
            head=head,
            in_features=tuple(self.in_features),
            pixel_mean=self.module.pixel_mean,
            pixel_std=self.module.pixel_std,
            dtype=self.module.dtype,
        )

    def init_variables(self, rng, image_hw=(128, 128), batch_size: int = 1):
        # no EMA normalizer in the reference V2 (losses :296-321)
        import jax as _jax

        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        return dict(_jax.jit(self.module.init)(rng, images))

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

        stride_per_loc = jnp.asarray(np.concatenate([
            np.full(c, s, np.float32) for c, s in zip(counts, self.strides)
        ]))

        # init: nearest-point per gt (point_targets, :371-430)
        init_obj, init_gt_boxes = jax.vmap(
            partial(rep_points_assign, lvl_min=lvl_min, lvl_max=lvl_max,
                    scale=float(self.point_base_scale), pos_num=1),
            in_axes=(None, None, 0, 0),
        )(centers, lvls, batch["gt_boxes"], batch["gt_valid"])

        # refine: MaxIoU .5/.4, no ignore band, gt-max augmentation
        # (bbox_targets, :431-484); candidates clamped at 0 first (:474-478)
        def refine_one(init_b, gt_b, gt_c, gt_v):
            cand = jnp.maximum(init_b, 0.0)
            ious = box_ops.pairwise_iou(cand, gt_b)           # (L, G)
            ious = jnp.where(gt_v[None, :], ious, -1.0)
            max_iou = jnp.max(ious, axis=1)
            arg = jnp.argmax(ious, axis=1)
            labels = jnp.where(max_iou >= 0.5, gt_c[arg], self.num_classes)
            # gt-max augmentation: any candidate tying a gt's best IoU
            gt_max = jnp.max(ious, axis=0)                    # (G,)
            tie = (ious == gt_max[None, :]) & (gt_max[None, :] > 0) \
                & gt_v[None, :]
            labels = jnp.where(tie.any(axis=1), gt_c[arg], labels)
            return labels.astype(jnp.int32), gt_b[arg]

        gt_cls, refine_gt_boxes = jax.vmap(refine_one)(
            jax.lax.stop_gradient(init_boxes),
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        )

        fg = gt_cls < self.num_classes
        num_pos_refine = jnp.maximum(jnp.sum(fg), 1.0)
        num_pos_init = jnp.maximum(jnp.sum(init_obj), 1.0)

        onehot = jax.nn.one_hot(gt_cls, self.num_classes, dtype=jnp.float32)
        cls_all = sigmoid_focal_loss(logits, onehot, self.focal_alpha,
                                     self.focal_gamma)
        loss_cls = jnp.sum(cls_all) / num_pos_refine * self.loss_cls_weight

        from ...ops.losses import smooth_l1_loss

        norm = (stride_per_loc * self.point_base_scale)[None, :, None]
        safe_init_gt = jnp.where(init_obj[..., None], init_gt_boxes, 1.0)
        l_init = smooth_l1_loss(init_boxes / norm, safe_init_gt / norm, 0.11)
        loss_init = jnp.sum(
            jnp.where(init_obj[..., None], l_init, 0.0)
        ) / num_pos_init * self.loss_init_weight

        safe_ref_gt = jnp.where(fg[..., None], refine_gt_boxes, 1.0)
        l_ref = smooth_l1_loss(refine_boxes / norm, safe_ref_gt / norm, 0.11)
        loss_refine = jnp.sum(
            jnp.where(fg[..., None], l_ref, 0.0)
        ) / num_pos_refine * self.loss_refine_weight

        total = loss_cls + loss_init + loss_refine
        return total, {
            "loss_cls": loss_cls,
            "loss_pts_init": loss_init,
            "loss_pts_refine": loss_refine,
            "num_pos": jnp.sum(fg),
        }
