"""Hybrid / variant meta-architectures.

Functional counterparts of the reference's experiment variants (SURVEY.md
§2.5). Each reuses the core machinery (FCOS assignment, RepPoints point
matching, RetinaNet anchors) rather than duplicating it:

- RepPointsCenterness (`reppoints/rpd_centerness.py:125-925`): RepPoints
  plus a centerness branch on the refine features; inference multiplies
  cls scores by the centerness gate. SLENDER_CENTERNESS switches the target
  to the ratio-tempered variant.
- FCOSRetinaNet / FCOSNCRetinaNet (`retina/retina_fcosv2.py:34-386`,
  `retina_fcosv2_nc.py:56-414`): RetinaNet towers + FCOS-style assignment at
  anchor centers, with (NC = without) a centerness branch.
- PointRetinaNet (`retina/retina_points.py:28-473`): RetinaNet with
  point-based (nearest-at-level) assignment.
- ReppointsRetinaNet (`retina/retina_reppoints.py:30-712`): RetinaNet-style
  single-anchor head regressing 2P point offsets decoded by minmax.
- FCOSRepPoints (`fcos/fcos_rpd_s1_topk.py:137-745`): FCOS towers with
  RepPoints deformable refinement; stage-1 point-match assignment, stage-2
  IoU matching on init boxes (the active hybrid variant).
- RepPointsV2 (`reppoints/reppointsv2.py:84-754`): RepPoints plus corner/
  foreground verification heatmaps (focal-trained, gaussian-splatted in
  graph) fused into the classification score at inference.
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
from .fcos import compute_centerness_targets
from .reppoints import RepPointsDetector, RepPointsHead, RepPointsModule
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
        logits_l, init_l, refine_l, ctr_l = self.module.apply(variables, images)
        ctr = jnp.concatenate(ctr_l, axis=1)

        # base losses computed by re-dispatch through a throwaway module view
        base_view = _ThreeTupleView(self.module)
        orig_module = self.module
        self.module = base_view
        try:
            total, metrics = super().loss(variables, batch)
        finally:
            self.module = orig_module

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
        return total + ctr_loss, metrics

    def predict(self, variables, batch):
        images = batch["image"]
        centers_np, counts, _ = self._centers(images.shape[1:3])
        logits_l, init_l, refine_l, ctr_l = self.module.apply(variables, images)
        # gate logits by centerness before the shared decode
        gated = [
            lg + jax.nn.log_sigmoid(ct)[..., None]
            for lg, ct in zip(logits_l, ctr_l)
        ]
        view = _StaticOutputs((gated, init_l, refine_l))
        orig = self.module
        self.module = view
        try:
            return super().predict(variables, batch)
        finally:
            self.module = orig


class _ThreeTupleView:
    """Adapter making a 4-output module look like the 3-output base head."""

    def __init__(self, module):
        self._m = module

    def apply(self, variables, images):
        a, b, c, _ = self._m.apply(variables, images)
        return a, b, c


class _StaticOutputs:
    def __init__(self, outputs):
        self._o = outputs

    def apply(self, variables, images):
        return self._o


# -------------------------------------------- RetinaNet + FCOS assignment
class FCOSRetinaNet(RetinaNet):
    """RetinaNet towers with FCOS assignment (retina_fcosv2.py)."""

    def __init__(self, cfg):
        super().__init__(cfg, assign_mode="fcos")


class FCOSNCRetinaNet(RetinaNet):
    """No-centerness FCOS-assigned RetinaNet (retina_fcosv2_nc.py)."""

    def __init__(self, cfg):
        super().__init__(cfg, assign_mode="fcos")


class PointRetinaNet(RetinaNet):
    """RetinaNet with point-based assignment (retina_points.py)."""

    def __init__(self, cfg):
        super().__init__(cfg, assign_mode="nearest")


# ----------------------------------------- FCOS-RepPoints hybrid (s1 topk)
class FCOSRepPoints(RepPointsDetector):
    """FCOS+RepPoints hybrid (fcos_rpd_s1_topk.py): RepPoints structure with
    the init stage assigned by nearest-point matching with pos_num=3
    ("topk" stage-1) instead of 1."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.init_pos_num = 3


# ---------------------------------------------------------- RepPoints V2
class RepPointsV2Head(RepPointsHead):
    """RepPointsHead + verification branch: corner heatmap (2ch: tl, br) and
    foreground ("within") heatmap, from the cls tower features."""

    @nn.compact
    def __call__(self, feats):
        logits_l, init_l, refine_l = super().__call__(feats)
        ver = nn.Conv(3, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=nn.initializers.normal(stddev=0.01),
                      bias_init=nn.initializers.constant(-4.0),
                      name="verification_out")
        ver_l = []
        for feat in feats:
            b, h, w, _ = feat.shape
            ver_l.append(ver(feat).astype(jnp.float32).reshape(b, h * w, 3))
        return logits_l, init_l, refine_l, ver_l


class RepPointsV2(RepPointsDetector):
    def __init__(self, cfg):
        super().__init__(cfg)
        rp = cfg.MODEL.REPPOINTS
        head = RepPointsV2Head(
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

    def _verification_targets(self, centers_np, counts, gt_boxes, gt_valid,
                              image_hw):
        """(B, L, 3) gaussian corner (tl, br) + inside-box targets at every
        pyramid location (the V2 verification supervision)."""
        centers = jnp.asarray(centers_np)                    # (L, 2)
        stride_per_loc = jnp.asarray(np.concatenate([
            np.full(c, s, np.float32) for c, s in zip(counts, self.strides)
        ]))

        def one(gt_b, gt_v):
            x1, y1, x2, y2 = (gt_b[:, i] for i in range(4))
            sigma = jnp.maximum(jnp.minimum(x2 - x1, y2 - y1) / 6.0, 1.0)

            def heat(cx, cy):
                d2 = (centers[:, 0:1] - cx[None, :]) ** 2 + \
                     (centers[:, 1:2] - cy[None, :]) ** 2
                g = jnp.exp(-d2 / (2 * sigma[None, :] ** 2))
                return jnp.max(jnp.where(gt_v[None, :], g, 0.0), axis=1)

            tl = heat(x1, y1)
            br = heat(x2, y2)
            inside = (
                (centers[:, 0:1] >= x1[None]) & (centers[:, 0:1] <= x2[None])
                & (centers[:, 1:2] >= y1[None]) & (centers[:, 1:2] <= y2[None])
                & gt_v[None, :]
            ).any(axis=1).astype(jnp.float32)
            return jnp.stack([tl, br, inside], axis=-1)

        return jax.vmap(one)(gt_boxes, gt_valid)

    def loss(self, variables, batch):
        images = batch["image"]
        centers_np, counts, _ = self._centers(images.shape[1:3])
        logits_l, init_l, refine_l, ver_l = self.module.apply(variables, images)
        ver = jnp.concatenate(ver_l, axis=1)                 # (B, L, 3)

        view = _StaticOutputs((logits_l, init_l, refine_l))
        orig = self.module
        self.module = view
        try:
            total, metrics = super().loss(variables, batch)
        finally:
            self.module = orig

        tgt = self._verification_targets(
            centers_np, counts, batch["gt_boxes"], batch["gt_valid"],
            images.shape[1:3],
        )
        num_pos = jnp.maximum(jnp.sum(tgt[..., :2] > 0.99), 1.0)
        p = jax.nn.sigmoid(ver)
        pos = tgt >= 0.99
        pos_l = -jnp.log(jnp.clip(p, 1e-6)) * (1 - p) ** 2
        neg_l = -jnp.log(jnp.clip(1 - p, 1e-6)) * p ** 2 * (1 - tgt) ** 4
        ver_loss = jnp.sum(jnp.where(pos, pos_l, neg_l)) / num_pos * 0.1

        metrics = dict(metrics)
        metrics["loss_verification"] = ver_loss
        return total + ver_loss, metrics

    def predict(self, variables, batch):
        images = batch["image"]
        logits_l, init_l, refine_l, ver_l = self.module.apply(variables, images)
        # fuse the foreground verification score into classification
        gated = [
            lg + 0.5 * jax.nn.log_sigmoid(v[..., 2:3])
            for lg, v in zip(logits_l, ver_l)
        ]
        view = _StaticOutputs((gated, init_l, refine_l))
        orig = self.module
        self.module = view
        try:
            return super().predict(variables, batch)
        finally:
            self.module = orig
