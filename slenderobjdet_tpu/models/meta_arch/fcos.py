"""FCOS, TPU-native.

Functional redesign of the reference FCOS
(`slender_det/modeling/meta_arch/fcos/fcos.py:174-582`) with identical
semantics but XLA-friendly structure:

- per-image Python loops in gt assignment (reference fcos.py:112-163) become a
  single vmapped fixed-shape computation over padded gt tensors
- variable-length candidate selection + CUDA NMS at inference
  (fcos.py:374-470) becomes per-level fixed-k top-k with validity masks and a
  fixed-shape greedy NMS (ops/nms.py)
- cross-GPU `reduce_sum` loss normalizers (fcos.py:26-31,286,304) are plain
  global sums: under jit-with-sharding the batch is logically global, so XLA
  inserts the psum automatically when the batch is sharded over the mesh
- normalization (x - mean) / std runs inside the jitted graph so uint8 images
  can be shipped to HBM and converted on-chip (4x less host->device traffic)

Head: shared 4-conv cls/bbox towers with GN, per-level learnable Scale on the
bbox pred, exp() decoding (NORM_REG_TARGETS=False path) — fcos.py:476-582.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.losses import iou_loss_ltrb, optax_sigmoid_ce, sigmoid_focal_loss
from ...ops.nms import batched_nms
from ...structures import boxes as box_ops
from ..anchors import fcos_locations
from ..backbones.fpn import build_backbone
from ..layers import GroupNorm32, Scale

INF = 1e8

# object size-of-interest ranges per FPN level (reference fcos.py:330-336)
SIZES_OF_INTEREST = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))


def _conv_init():
    return nn.initializers.normal(stddev=0.01)


class FCOSHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    prior_prob: float = 0.01
    centerness_on_reg: bool = False
    norm_reg_targets: bool = False
    use_dcn_in_tower: bool = False       # last tower conv -> DFConv2d
    use_dcn_v2: bool = True
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    with_ctr: bool = True                # False: FCOSNCRetinaNet-style head
    pack_levels: bool = False            # TPU.PACK_HEAD_LEVELS (ops/level_pack)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        """feats: list of (B, H_l, W_l, C). Returns per-level lists of
        (B, H*W, num_classes) logits, (B, H*W, 4) reg, (B, H*W) centerness."""
        from ..layers import DFConv2d

        c = feats[0].shape[-1]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob)
        )

        def tower_conv(prefix, i):
            if self.use_dcn_in_tower and i == self.num_convs - 1:
                return DFConv2d(c, modulated=self.use_dcn_v2,
                                dtype=self.dtype, name=f"{prefix}_tower{i}")
            return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                           param_dtype=jnp.float32, kernel_init=_conv_init(),
                           name=f"{prefix}_tower{i}")

        cls_tower = [
            (tower_conv("cls", i), GroupNorm32(c, name=f"cls_tower_gn{i}"))
            for i in range(self.num_convs)
        ]
        bbox_tower = [
            (tower_conv("bbox", i), GroupNorm32(c, name=f"bbox_tower_gn{i}"))
            for i in range(self.num_convs)
        ]
        cls_logits = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                             param_dtype=jnp.float32, kernel_init=_conv_init(),
                             bias_init=bias_init, name="cls_logits")
        bbox_pred = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=_conv_init(),
                            name="bbox_pred")
        centerness = (
            nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=_conv_init(),
                    name="centerness")
            if self.with_ctr else None
        )
        scales = [Scale(name=f"scale{i}") for i in range(len(feats))]

        # TPU.PACK_HEAD_LEVELS: mosaic-pack the small pyramid levels into
        # one canvas so each shared conv runs ONCE over them instead of
        # once per tiny level (ops/level_pack.py). The dominant first level
        # stays standalone (packing it would add its area's share of the
        # canvas slack). Per-level GroupNorm statistics are preserved by
        # applying gn per region (map_regions), which also re-zeroes the
        # 1-px gaps so region outputs equal the per-level path
        # (tests/test_level_pack.py). Deformable towers can't pack:
        # predicted offsets may reach across the gap into a neighbor level.
        packable = (self.pack_levels and len(feats) > 2
                    and not self.use_dcn_in_tower)

        def tower_apply(x, tower, region_map):
            for conv, gn in tower:
                x = conv(x)
                if region_map is None:
                    x = nn.relu(gn(x))
                else:
                    x = region_map(x, lambda i, r, gn=gn: nn.relu(gn(r)))
            return x

        if packable:
            from ...ops.level_pack import (map_regions, pack_levels,
                                           plan_level_packing, unpack_levels)
            tail = feats[1:]
            shapes = [f.shape[1:3] for f in tail]
            plan = plan_level_packing(shapes)
            canvas = pack_levels(tail, plan)
            units = [
                (feats[0], None, [0]),
                (canvas, lambda x, f: map_regions(x, shapes, plan, f),
                 list(range(1, len(feats)))),
            ]
        else:
            units = [(f, None, [lvl]) for lvl, f in enumerate(feats)]

        lvl_out: List[Any] = [None] * len(feats)
        for x, region_map, lvls in units:
            ct = tower_apply(x, cls_tower, region_map)
            bt = tower_apply(x, bbox_tower, region_map)
            logits = cls_logits(ct).astype(jnp.float32)
            reg_raw = bbox_pred(bt).astype(jnp.float32)
            ctr_out = None
            if self.with_ctr:
                ctr_src = bt if self.centerness_on_reg else ct
                ctr_out = centerness(ctr_src).astype(jnp.float32)
            if region_map is None:
                parts = [(logits, reg_raw, ctr_out)]
            else:
                parts = list(zip(
                    unpack_levels(logits, shapes, plan),
                    unpack_levels(reg_raw, shapes, plan),
                    (unpack_levels(ctr_out, shapes, plan)
                     if ctr_out is not None else [None] * len(shapes)),
                ))
            for lvl, part in zip(lvls, parts):
                lvl_out[lvl] = part

        logits_all, reg_all, ctr_all = [], [], []
        for lvl, (logits, reg_raw, ctr) in enumerate(lvl_out):
            b, h, w, _ = logits.shape
            reg = scales[lvl](reg_raw)
            if self.norm_reg_targets:
                reg = nn.relu(reg)
                if not train:
                    reg = reg * self.strides[lvl]
            else:
                # clamp the exponent: unbounded exp overflows fp32 (inf ltrb
                # areas -> NaN IoU loss) when a location's prediction runs
                # away early in training; 2^13=8192px is beyond any real box
                reg = jnp.exp(jnp.clip(reg, -12.0, 9.0))

            logits_all.append(logits.reshape(b, h * w, self.num_classes))
            reg_all.append(reg.reshape(b, h * w, 4))
            if self.with_ctr:
                ctr_all.append(ctr.reshape(b, h * w))
        return logits_all, reg_all, (ctr_all if self.with_ctr else None)


class FCOSModule(nn.Module):
    """Backbone + FPN + FCOS head over fixed-shape NHWC images."""

    backbone: nn.Module
    head: FCOSHead
    in_features: Tuple[str, ...]
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    dtype: Any = jnp.float32

    def __call__(self, images: jnp.ndarray, train: bool = False):
        x = images.astype(jnp.float32)
        x = (x - jnp.asarray(self.pixel_mean)) / jnp.asarray(self.pixel_std)
        x = x.astype(self.dtype)
        feats = self.backbone(x)
        feats = [feats[f] for f in self.in_features]
        return self.head(feats, train=train)


# ---------------------------------------------------------------- targets
def fcos_assign_single(
    locations: jnp.ndarray,       # (L, 2) xy
    sizes_of_interest: jnp.ndarray,  # (L, 2)
    gt_boxes: jnp.ndarray,        # (G, 4) XYXY
    gt_classes: jnp.ndarray,      # (G,) int32
    gt_valid: jnp.ndarray,        # (G,) bool
    num_classes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image FCOS target assignment (reference fcos.py:112-163),
    fully vectorized. Returns labels (L,) int32 and reg targets (L, 4).

    MEMORY: the four l/t/r/b planes are computed as separate (L, G)
    tensors and the matched pair's lrtb is RECOMPUTED after the argmin
    (identical fp ops -> bit-identical results) instead of gathered from
    a stacked (L, G, 4) tensor. The stacked form's minor dim pads
    4 -> 128 lanes under the TPU tiled layout (32x memory): at the
    reference B=16 train batch with the mapper's gt pad of 100 the
    padded copy is 19.08 GB and OOMs the 16 GB chip outright (measured
    round 5; B=8 at 9.5 GB is why earlier family benches fit). Same
    pathology and fix as the round-4 deform-conv (B,H,W,K,C) tap temps."""
    xs = locations[:, 0:1]  # (L, 1)
    ys = locations[:, 1:2]
    l = xs - gt_boxes[None, :, 0]  # (L, G) each
    t = ys - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - xs
    b = gt_boxes[None, :, 3] - ys
    is_in_box = jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b)) > 0
    max_reg = jnp.maximum(jnp.maximum(l, t), jnp.maximum(r, b))
    cared = (max_reg >= sizes_of_interest[:, 0:1]) & (
        max_reg <= sizes_of_interest[:, 1:2]
    )
    areas = box_ops.area(gt_boxes)  # (G,)
    loc2gt = jnp.where(
        is_in_box & cared & gt_valid[None, :], areas[None, :], INF
    )
    min_area = jnp.min(loc2gt, axis=1)
    gt_ind = jnp.argmin(loc2gt, axis=1)

    matched = gt_boxes[gt_ind]  # (L, 4)
    reg_targets = jnp.stack(
        [locations[:, 0] - matched[:, 0], locations[:, 1] - matched[:, 1],
         matched[:, 2] - locations[:, 0], matched[:, 3] - locations[:, 1]],
        axis=-1,
    )
    labels = jnp.where(min_area >= INF, num_classes, gt_classes[gt_ind])
    return labels.astype(jnp.int32), reg_targets, gt_ind.astype(jnp.int32)


def compute_centerness_targets(reg_targets: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) — fcos.py:166-171."""
    lr = reg_targets[..., 0::2]
    tb = reg_targets[..., 1::2]
    eps = 1e-12
    c = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), eps)) * (
        jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), eps)
    )
    return jnp.sqrt(jnp.clip(c, 0.0, None))


class FCOS:
    """Config-driven FCOS detector: owns the Flax module plus pure loss /
    inference functions over fixed-shape batches."""

    def __init__(self, cfg, use_centerness: bool = True):
        self.cfg = cfg
        # use_centerness=False gives the FCOSNCRetinaNet semantics
        # (retina_fcosv2_nc.py:163-215,306-413): no centerness branch, reg
        # loss normalized by num_pos instead of the centerness sum, and
        # inference ranked by raw cls scores.
        self.use_centerness = use_centerness
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        f = cfg.MODEL.FCOS
        spec = build_backbone(cfg, dtype=dtype)
        self.backbone_spec = spec
        head = FCOSHead(
            num_classes=f.NUM_CLASSES,
            num_convs=f.NUM_CONVS,
            prior_prob=f.PRIOR_PROB,
            centerness_on_reg=f.CENTERNESS_ON_REG,
            norm_reg_targets=f.NORM_REG_TARGETS,
            with_ctr=use_centerness,
            use_dcn_in_tower=f.USE_DCN_IN_TOWER,
            use_dcn_v2=f.USE_DCN_V2,
            strides=tuple(f.FPN_STRIDES),
            pack_levels=cfg.TPU.PACK_HEAD_LEVELS,
            dtype=dtype,
        )
        self.module = FCOSModule(
            backbone=spec.module,
            head=head,
            in_features=tuple(f.IN_FEATURES),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            dtype=dtype,
        )
        self.num_classes = f.NUM_CLASSES
        self.strides = list(f.FPN_STRIDES)
        self.focal_alpha = f.FOCAL_LOSS_ALPHA
        self.focal_gamma = f.FOCAL_LOSS_GAMMA
        self.iou_loss_type = f.IOU_LOSS_TYPE
        self.norm_reg_targets = f.NORM_REG_TARGETS
        self.pre_nms_thresh = f.INFERENCE_TH
        self.pre_nms_top_n = f.PRE_NMS_TOP_N
        self.nms_thresh = f.NMS_TH
        self.max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
        self.approx_topk = cfg.TPU.APPROX_TOPK
        self.int8_predict = cfg.TPU.INT8_PREDICT
        # FCOSTopK: restrict the REG loss to the top-k positives per gt by
        # centerness (reference fcos_topk.py:39-91,222-227); None = all
        self.topk_per_gt = None
        # FCOSV3: mask-based center sampling (fcosv3.py:129-142)
        self.mask_center_sampling = False
        self.mask_thresh = 0.2
        # FCOSWithAnchor (fcoswa.py:68-76): attach each detection's implicit
        # anchor — the source location as a degenerate (x,y,x,y) box
        self.with_anchor = False

    # ------------------------------------------------------------ helpers
    def init_variables(self, rng, image_hw: Tuple[int, int] = (128, 128),
                       batch_size: int = 1):
        # All parameters are shape-independent (convs/GN/Scale), so init runs
        # at a small canonical shape regardless of the training resolution —
        # and under jit, as ONE compiled program instead of thousands of
        # dispatches (critical under the axon TPU tunnel).
        del image_hw, batch_size
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        init_fn = jax.jit(partial(self.module.init, train=True))
        return init_fn(rng, images)

    def _locations(self, image_hw) -> Tuple[np.ndarray, List[int]]:
        return fcos_locations(image_hw, self.strides)

    def _sizes_of_interest(self, counts: List[int]) -> np.ndarray:
        soi = [
            np.broadcast_to(np.array(SIZES_OF_INTEREST[i], np.float32), (c, 2))
            for i, c in enumerate(counts)
        ]
        return np.concatenate(soi, axis=0)

    # --------------------------------------------------------------- loss
    def loss(self, variables, batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        images = batch["image"]
        image_hw = images.shape[1:3]
        locations_np, counts = self._locations(image_hw)
        locations = jnp.asarray(locations_np)
        soi = jnp.asarray(self._sizes_of_interest(counts))

        from ..layers import apply_train

        (logits_l, reg_l, ctr_l), updated_buffers = apply_train(
            self.module, variables, images, train=True)
        logits = jnp.concatenate(logits_l, axis=1)  # (B, L, C)
        reg = jnp.concatenate(reg_l, axis=1)        # (B, L, 4)
        ctr = jnp.concatenate(ctr_l, axis=1) if ctr_l is not None else None

        labels, reg_targets, gt_inds = jax.vmap(
            partial(fcos_assign_single, num_classes=self.num_classes),
            in_axes=(None, None, 0, 0, 0),
        )(locations, soi, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

        if self.mask_center_sampling and "center_mask" in batch:
            # FCOSV3 (fcosv3.py:129-142): locations whose rendered center
            # score falls below mask_thresh become background
            cm = batch["center_mask"]                       # (B, H, W)
            ix = jnp.clip(locations[:, 0].astype(jnp.int32), 0, cm.shape[2] - 1)
            iy = jnp.clip(locations[:, 1].astype(jnp.int32), 0, cm.shape[1] - 1)
            scores_at = cm[:, iy, ix]                        # (B, L)
            labels = jnp.where(
                (labels < self.num_classes) & (scores_at <= self.mask_thresh),
                self.num_classes, labels,
            )

        if self.norm_reg_targets:
            stride_per_loc = jnp.asarray(
                np.concatenate([
                    np.full((c,), s, np.float32)
                    for c, s in zip(counts, self.strides)
                ])
            )
            reg_targets = reg_targets / stride_per_loc[None, :, None]

        pos = labels < self.num_classes  # (B, L)
        num_pos = jnp.maximum(jnp.sum(pos), 1.0)

        # focal classification loss over all locations
        onehot = jax.nn.one_hot(labels, self.num_classes, dtype=jnp.float32)
        onehot = onehot * pos[..., None]
        cls_loss = jnp.sum(
            sigmoid_focal_loss(logits, onehot, self.focal_alpha, self.focal_gamma)
        ) / num_pos

        # centerness-weighted IoU regression loss on positives.
        # Non-positive lanes carry garbage reg targets (possibly negative
        # ltrb -> log of a negative inside the iou loss); substitute a safe
        # constant BEFORE the loss so no NaN can leak through the where
        # (the classic JAX masked-loss rule: where alone doesn't stop NaN
        # gradients from the untaken branch).
        safe_targets = jnp.where(pos[..., None], reg_targets, 1.0)
        ctr_targets = compute_centerness_targets(safe_targets)
        ctr_targets = jnp.where(pos, ctr_targets, 0.0)

        reg_pos = pos
        if self.topk_per_gt:
            # keep the top-k positives per gt by centerness for the reg loss
            G = batch["gt_boxes"].shape[1]
            per_gt = (
                jax.nn.one_hot(gt_inds, G, dtype=jnp.float32)
                * pos[..., None]
            )                                               # (B, L, G)
            scores = jnp.where(per_gt > 0, ctr_targets[..., None], -jnp.inf)
            kth = jax.lax.top_k(
                scores.transpose(0, 2, 1), self.topk_per_gt
            )[0][..., -1]                                   # (B, G)
            gate = scores >= jnp.where(
                jnp.isfinite(kth), kth, jnp.inf
            )[:, None, :]
            reg_pos = jnp.any(gate & (per_gt > 0), axis=-1)

        reg_losses = iou_loss_ltrb(reg, safe_targets, self.iou_loss_type)
        if self.use_centerness:
            sum_ctr = jnp.maximum(
                jnp.sum(jnp.where(reg_pos, ctr_targets, 0.0)), 1e-6
            )
            reg_loss = jnp.sum(
                jnp.where(reg_pos, reg_losses * ctr_targets, 0.0)
            ) / sum_ctr
            ctr_loss = jnp.sum(
                jnp.where(pos, optax_sigmoid_ce(ctr, ctr_targets), 0.0)
            ) / num_pos
            total = cls_loss + reg_loss + ctr_loss
            metrics = {
                "cls_loss": cls_loss,
                "reg_loss": reg_loss,
                "centerness_loss": ctr_loss,
                "num_pos": num_pos,
            }
        else:
            # NC variant: unweighted IoU loss / num_pos
            # (retina_fcosv2_nc.py:202-206)
            reg_loss = jnp.sum(jnp.where(reg_pos, reg_losses, 0.0)) / num_pos
            total = cls_loss + reg_loss
            metrics = {
                "cls_loss": cls_loss,
                "reg_loss": reg_loss,
                "num_pos": num_pos,
            }
        if updated_buffers is not None:
            metrics["_buffers"] = updated_buffers
        return total, metrics

    # ---------------------------------------------------------- inference
    def predict(self, variables, batch) -> Dict[str, jnp.ndarray]:
        """Returns fixed-shape detections in ORIGINAL image coordinates:
        boxes (B, D, 4), scores (B, D), classes (B, D), valid (B, D)."""
        images = batch["image"]
        image_hw = images.shape[1:3]
        locations_np, counts = self._locations(image_hw)

        from ...ops.quant import int8_predict_scope
        with int8_predict_scope(self.int8_predict):
            logits_l, reg_l, ctr_l = self.module.apply(
                variables, images, train=False)

        offsets = np.concatenate([[0], np.cumsum(counts)])
        cand_boxes, cand_scores, cand_classes, cand_valid, cand_locs = \
            [], [], [], [], []
        for lvl in range(len(counts)):
            locs = jnp.asarray(locations_np[offsets[lvl]: offsets[lvl + 1]])
            b, s, c, v, sl = _fcos_level_candidates(
                logits_l[lvl], reg_l[lvl],
                ctr_l[lvl] if ctr_l is not None else None, locs,
                self.pre_nms_thresh, self.pre_nms_top_n,
                approx=self.approx_topk,
            )
            cand_boxes.append(b)
            cand_scores.append(s)
            cand_classes.append(c)
            cand_valid.append(v)
            cand_locs.append(sl)

        boxes = jnp.concatenate(cand_boxes, axis=1)
        scores = jnp.concatenate(cand_scores, axis=1)
        classes = jnp.concatenate(cand_classes, axis=1)
        valid = jnp.concatenate(cand_valid, axis=1)
        locs = jnp.concatenate(cand_locs, axis=1)

        def _nms_one(bx, sc, cl, vl, lo, scale, orig_hw):
            keep_idx, keep_valid = batched_nms(
                bx, sc, cl, self.nms_thresh, self.max_dets, valid=vl
            )
            kb = bx[keep_idx] / scale
            kb = box_ops.clip(kb, orig_hw[0], orig_hw[1])
            return kb, sc[keep_idx], cl[keep_idx], keep_valid, lo[keep_idx]

        out_boxes, out_scores, out_classes, out_valid, out_locs = jax.vmap(
            _nms_one
        )(
            boxes, scores, classes, valid, locs,
            batch["scale"].astype(jnp.float32),
            batch["orig_size"].astype(jnp.float32),
        )
        out = {
            "boxes": out_boxes,
            "scores": out_scores,
            "classes": out_classes,
            "valid": out_valid,
        }
        if self.with_anchor:
            # implicit anchor = source location as (x,y,x,y) (fcoswa.py:68-76)
            scale = batch["scale"].astype(jnp.float32)[:, None, None]
            pts = out_locs / scale
            out["anchors"] = jnp.concatenate([pts, pts], axis=-1)
        return out


def _fcos_level_candidates(logits, reg, ctr, locations, pre_nms_thresh,
                           pre_nms_top_n, approx=True):
    """Fixed-shape per-level candidate selection (reference
    fcos.py:389-470 rewritten without data-dependent shapes).

    logits (B, L, C); reg (B, L, 4); ctr (B, L); locations (L, 2).
    Returns (B, K, 4), (B, K), (B, K) int32, (B, K) bool with
    K = min(pre_nms_top_n, L*C).

    Uses ops.topk.pair_top_k (two-stage location-first selection on large
    levels, selection-identical to the flat top-k — see its docstring and
    tests/test_postprocess.py); cut FCOS postprocess from 45 ms to 12 ms
    at B=32 800x1344. Every ranking factor (threshold mask, centerness) is
    baked into the rank tensor passed down, as pair_top_k requires.
    """
    from ...ops.topk import pair_top_k

    scores = jax.nn.sigmoid(logits.astype(jnp.float32))         # (B, L, C)
    candidate = scores > pre_nms_thresh
    if ctr is not None:
        ranked = scores * jax.nn.sigmoid(
            ctr.astype(jnp.float32))[:, :, None]  # cls * centerness
    else:
        ranked = scores       # NC variant (retina_fcosv2_nc.py:240-268)
    rank = jnp.where(candidate, ranked, 0.0)

    top_scores, loc_idx, cls_idx = pair_top_k(
        rank, pre_nms_top_n, approx=approx)
    valid = top_scores > 0.0

    sel_reg = jnp.take_along_axis(reg, loc_idx[..., None], axis=1)  # (B,K,4)
    sel_loc = locations[loc_idx]                                    # (B,K,2)
    boxes = box_ops.decode_ltrb(sel_loc, sel_reg)
    return boxes, jnp.sqrt(top_scores), cls_idx, valid, sel_loc


class FCOSTopK(FCOS):
    """FCOS whose regression loss is restricted to the 5 highest-centerness
    positives per gt (reference fcos_topk.py:102-468; cls/centerness losses
    keep all positives, fcos_topk.py:184-236)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.topk_per_gt = 5


class FCOSV3(FCOS):
    """FCOS with mask-based center sampling (reference fcosv3.py:55-343):
    only locations where the polygon-rendered center-score map exceeds 0.2
    stay positive. Requires cfg.NEED_MASKS so the data pipeline emits
    center_mask (structures/borders.py)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.mask_center_sampling = True
        self.mask_thresh = 0.2
