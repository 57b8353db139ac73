"""Generalized R-CNN / ProposalVisibleRCNN, TPU-native.

Counterpart of the reference's Faster R-CNN path
(`slender_det/modeling/meta_arch/rcnn/pvrcnn.py:10-63`: GeneralizedRCNN whose
inference also returns the post-processed proposals) over our fixed-shape
RPN (proposal_generator/rpn.py) and StandardROIHeads (roi_heads/roi_heads.py).

Training randomness (anchor/proposal subsampling) flows through
batch["rng"], a per-step PRNGKey supplied by the trainer.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.fpn import build_backbone
from ..proposal_generator.rpn import RPN, StandardRPNHead
from ..roi_heads.roi_heads import StandardROIHeads


class RCNNModule(nn.Module):
    """backbone + RPN head; ROI box head is a separate module because it runs
    on pooled features that depend on (non-module) proposal logic."""

    backbone: nn.Module
    rpn_head: StandardRPNHead
    rpn_in_features: Tuple[str, ...]
    roi_in_features: Tuple[str, ...]
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    dtype: Any = jnp.float32

    def __call__(self, images: jnp.ndarray):
        x = images.astype(jnp.float32)
        x = (x - jnp.asarray(self.pixel_mean)) / jnp.asarray(self.pixel_std)
        x = x.astype(self.dtype)
        feats = self.backbone(x)
        rpn_feats = [feats[f] for f in self.rpn_in_features]
        logits_l, deltas_l = self.rpn_head(rpn_feats)
        # keep ROI features in the compute dtype: fp32 here doubled the
        # (already large) bilinear-gather transients of RoIAlign
        roi_feats = tuple(feats[f] for f in self.roi_in_features)
        return logits_l, deltas_l, roi_feats


class ProposalVisibleRCNN:
    """Config-driven Faster R-CNN. predict() returns detections plus the
    RPN proposals (the reference's 'proposal visibility' diagnosis feature,
    pvrcnn.py:45-63).

    with_anchor=True enables the full anchor-diagnosis chain
    (ProposalVisibleRCNNWithAnchor, reference pvrcnnwa.py:12-28 +
    find_top_rpn_proposals_anchors + FastRCNNOutputLayersWithAnchor):
    each RPN proposal keeps its source anchor, and each final detection
    carries its source (anchor, proposal) pair in the output fields
    `anchors` / `det_proposals`."""

    def __init__(self, cfg, with_anchor: bool = False):
        self.cfg = cfg
        self.int8_predict = cfg.TPU.INT8_PREDICT
        # Rotated two-stage path (reference configs/rotated/faster_R_*.yaml,
        # configs/submit/test_dev.yaml): PROPOSAL_GENERATOR "RRPN" +
        # ROI_HEADS "RROIHeads" swap in the XYWHA machinery wholesale.
        self.rotated = (
            cfg.MODEL.PROPOSAL_GENERATOR.NAME == "RRPN"
            or cfg.MODEL.ROI_HEADS.NAME == "RROIHeads"
        )
        self.with_anchor = not self.rotated and (
            with_anchor or cfg.MODEL.PROPOSAL_GENERATOR.NAME == "RPNWithAnchor"
        )
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec

        rpn_in = list(cfg.MODEL.RPN.IN_FEATURES)
        rpn_strides = [spec.strides[f] for f in rpn_in]

        roi_in = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        roi_strides = [spec.strides[f] for f in roi_in]

        if self.rotated:
            from ..proposal_generator.rrpn import RotatedRPN
            from ..roi_heads.rotated import RotatedROIHeads

            self.rpn = RotatedRPN(cfg, rpn_strides)
            self.roi_heads = RotatedROIHeads(cfg, roi_strides, dtype=dtype)
        else:
            self.rpn = RPN(cfg, rpn_strides)
            self.roi_heads = StandardROIHeads(cfg, roi_strides, dtype=dtype)

        self.module = RCNNModule(
            backbone=spec.module,
            rpn_head=StandardRPNHead(
                num_anchors=self.rpn.num_cell_anchors,
                box_dim=5 if self.rotated else 4, dtype=dtype,
            ),
            rpn_in_features=tuple(rpn_in),
            roi_in_features=tuple(roi_in),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            dtype=dtype,
        )
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE

    # --------------------------------------------------------------- setup
    def init_variables(self, rng, image_hw: Tuple[int, int] = (128, 128),
                       batch_size: int = 1):
        del image_hw, batch_size
        r1, r2 = jax.random.split(rng)
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        backbone_vars = jax.jit(self.module.init)(r1, images)

        # ROI box module params (init on dummy pooled features)
        P = self.roi_heads.pooler_resolution
        C = self.backbone_spec.channels[self.roi_heads.in_features[0]]
        pooled = jnp.zeros((1, 4, P, P, C), jnp.float32)
        roi_vars = jax.jit(self.roi_heads.module.init)(r2, pooled)

        variables = dict(backbone_vars)
        params = dict(variables["params"])
        params["roi_box"] = roi_vars["params"]
        variables["params"] = params
        return variables

    def _split_variables(self, variables):
        params = dict(variables["params"])
        roi_params = params.pop("roi_box")
        main = {"params": params}
        if "buffers" in variables:
            main["buffers"] = variables["buffers"]
        return main, {"params": roi_params}

    def _rpn_anchors(self, image_hw):
        return self.rpn.anchor_spec.anchors(image_hw)

    # ---------------------------------------------------------------- loss
    def loss(self, variables, batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        images = batch["image"]
        rng = batch.get("rng", jax.random.PRNGKey(0))
        r_rpn, r_roi = jax.random.split(rng)

        from ..layers import apply_train

        main_vars, roi_vars = self._split_variables(variables)
        (logits_l, deltas_l, roi_feats), updated_buffers = apply_train(
            self.module, main_vars, images)
        logits = jnp.concatenate(logits_l, axis=1)
        deltas = jnp.concatenate(deltas_l, axis=1)

        anchors_np, counts = self._rpn_anchors(images.shape[1:3])
        anchors = jnp.asarray(anchors_np)

        gt_boxes = batch["gt_rboxes"] if self.rotated else batch["gt_boxes"]
        rpn_losses = self.rpn.losses(
            r_rpn, anchors, logits, deltas,
            gt_boxes, batch["gt_classes"], batch["gt_valid"],
        )

        image_sizes = batch.get(
            "image_size",
            jnp.broadcast_to(
                jnp.asarray(images.shape[1:3], jnp.int32), (images.shape[0], 2)
            ),
        )
        proposals, prop_scores, prop_valid = self.rpn.proposals(
            anchors_np, counts, jax.lax.stop_gradient(logits),
            jax.lax.stop_gradient(deltas), image_sizes, train=True,
        )

        roi_losses = self.roi_heads.losses(
            r_roi, roi_vars, roi_feats, proposals, prop_valid,
            gt_boxes, batch["gt_classes"], batch["gt_valid"],
        )

        metrics = {**rpn_losses}
        metrics["loss_cls"] = roi_losses["loss_cls"]
        metrics["loss_box_reg"] = roi_losses["loss_box_reg"]
        metrics["num_fg"] = roi_losses["num_fg"]
        total = (
            metrics["loss_rpn_cls"] + metrics["loss_rpn_loc"]
            + metrics["loss_cls"] + metrics["loss_box_reg"]
        )
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    # ------------------------------------------------------------ inference
    def predict(self, variables, batch) -> Dict[str, jnp.ndarray]:
        images = batch["image"]
        main_vars, roi_vars = self._split_variables(variables)
        from ...ops.quant import int8_predict_scope
        with int8_predict_scope(self.int8_predict):
            logits_l, deltas_l, roi_feats = self.module.apply(
                main_vars, images)
        logits = jnp.concatenate(logits_l, axis=1)
        deltas = jnp.concatenate(deltas_l, axis=1)

        anchors_np, counts = self._rpn_anchors(images.shape[1:3])
        image_sizes = batch.get(
            "image_size",
            jnp.broadcast_to(
                jnp.asarray(images.shape[1:3], jnp.int32), (images.shape[0], 2)
            ),
        )
        prop_anchors = None
        if self.with_anchor:
            proposals, prop_scores, prop_valid, prop_anchors = self.rpn.proposals(
                anchors_np, counts, logits, deltas, image_sizes, train=False,
                with_anchors=True,
            )
        else:
            proposals, prop_scores, prop_valid = self.rpn.proposals(
                anchors_np, counts, logits, deltas, image_sizes, train=False
            )

        out = self.roi_heads.inference(
            roi_vars, roi_feats, proposals, prop_valid,
            batch["scale"], batch["orig_size"], prop_anchors=prop_anchors,
        )
        # proposal visibility (reference pvrcnn.py inference extra outputs)
        scale = batch["scale"].astype(jnp.float32)[:, None, None]
        if self.rotated:
            # XYWHA: rescale cx, cy, w, h; angle is scale-invariant
            out["proposals"] = proposals.at[..., :4].set(
                proposals[..., :4] / scale)
        else:
            out["proposals"] = proposals / scale
        out["proposal_scores"] = prop_scores
        out["proposal_valid"] = prop_valid
        if self.with_anchor:
            out["proposal_anchors"] = prop_anchors / scale
        return out
