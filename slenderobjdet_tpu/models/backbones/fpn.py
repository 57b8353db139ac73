"""FPN neck + registered backbone builders (Flax, NHWC).

Mirrors the reference's backbone builder surface
(`slender_det/modeling/backbone/fpn.py:22-298` + detectron2 builders used by
configs):
- `build_resnet_fpn_backbone`           — P2..P6 (LastLevelMaxPool), R-CNN default
- `build_retinanet_resnet_fpn_backbone` — P3..P7, P6/P7 convs from res5
- `build_retinanet_resnet_fpn_backbone_use_p5` — P3..P7, P6/P7 from P5
  (the FCOS default, reference fpn.py:95-115)

TPU notes: nearest 2x upsample is implemented with reshape+broadcast (exactly
equivalent to F.interpolate(nearest, scale=2)) which XLA lowers to a cheap
relayout; all convs run in the configured compute dtype.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import Registry
from ..layers import get_norm
from .resnet import RESNET_STRIDES, resnet_from_cfg, resnet_output_channels

BACKBONE_REGISTRY = Registry("BACKBONE")

# strides of known bottom-up feature names (resnet + pvt)
FEATURE_STRIDES = dict(RESNET_STRIDES)
FEATURE_STRIDES.update({"pvt1": 4, "pvt2": 8, "pvt3": 16, "pvt4": 32})


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,2H,2W,C), exact nearest-neighbor 2x."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    """Feature pyramid over a bottom-up backbone.

    top_block: "" | "maxpool" (P6 = maxpool(P5)) | "p6p7_p5" | "p6p7_res5".
    """

    bottom_up: nn.Module
    in_features: Sequence[str]         # e.g. ("res3","res4","res5")
    out_channels: int = 256
    norm: str = ""
    fuse_type: str = "sum"
    top_block: str = "maxpool"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        bottom_up_features = self.bottom_up(x)
        in_feats = [bottom_up_features[f] for f in self.in_features]

        # lateral 1x1 + output 3x3, top-down pathway
        laterals: List[jnp.ndarray] = []
        for idx, feat in enumerate(in_feats):
            lat = nn.Conv(self.out_channels, (1, 1), use_bias=(self.norm == ""),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"fpn_lateral{idx}")(feat)
            if self.norm:
                # d2 FPN wraps lateral/output convs in Conv2d(norm=get_norm)
                lat = get_norm(self.norm, self.out_channels, dtype=self.dtype,
                               name=f"fpn_lateral{idx}_norm")(lat)
            laterals.append(lat)

        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for idx in range(len(laterals) - 2, -1, -1):
            top_down = upsample2x_nearest(merged[idx + 1])
            m = laterals[idx] + top_down
            if self.fuse_type == "avg":
                m = m / 2.0
            merged[idx] = m

        outputs: Dict[str, jnp.ndarray] = {}
        start_stage = int(FEATURE_STRIDES[self.in_features[0]]).bit_length() - 1
        names = []
        for idx, m in enumerate(merged):
            out = nn.Conv(self.out_channels, (3, 3), padding=1,
                          use_bias=(self.norm == ""), dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"fpn_output{idx}")(m)
            if self.norm:
                out = get_norm(self.norm, self.out_channels, dtype=self.dtype,
                               name=f"fpn_output{idx}_norm")(out)
            name = f"p{start_stage + idx}"
            outputs[name] = out
            names.append(name)

        last_p = names[-1]
        if self.top_block == "maxpool":
            outputs[f"p{int(last_p[1:]) + 1}"] = nn.max_pool(
                outputs[last_p], (1, 1), strides=(2, 2)
            )
        elif self.top_block in ("p6p7_p5", "p6p7_res5"):
            src = (
                outputs[last_p]
                if self.top_block == "p6p7_p5"
                else bottom_up_features[self.in_features[-1]]
            )
            p6 = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                         dtype=self.dtype, param_dtype=jnp.float32, name="top_p6")(src)
            p7 = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="top_p7")(nn.relu(p6))
            n = int(last_p[1:])
            outputs[f"p{n + 1}"] = p6
            outputs[f"p{n + 2}"] = p7
        return outputs


class BackboneSpec:
    """Static shape metadata for a built backbone (channels & strides per
    output feature), the counterpart of d2's Backbone.output_shape()."""

    def __init__(self, module: nn.Module, channels: Dict[str, int],
                 strides: Dict[str, int], size_divisibility: int):
        self.module = module
        self.channels = channels
        self.strides = strides
        self.size_divisibility = size_divisibility


def _fpn_feature_names(in_features: Sequence[str], top_block: str) -> List[str]:
    start = int(FEATURE_STRIDES[in_features[0]]).bit_length() - 1
    names = [f"p{start + i}" for i in range(len(in_features))]
    last = int(names[-1][1:])
    if top_block == "maxpool":
        names.append(f"p{last + 1}")
    elif top_block.startswith("p6p7"):
        names += [f"p{last + 1}", f"p{last + 2}"]
    return names


def _build_resnet_fpn(cfg, top_block: str, dtype) -> BackboneSpec:
    bottom_up = resnet_from_cfg(cfg, dtype=dtype)
    in_features = tuple(cfg.MODEL.FPN.IN_FEATURES)
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    fpn = FPN(
        bottom_up=bottom_up,
        in_features=in_features,
        out_channels=out_channels,
        norm=cfg.MODEL.FPN.NORM,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        top_block=top_block,
        dtype=dtype,
    )
    names = _fpn_feature_names(in_features, top_block)
    channels = {n: out_channels for n in names}
    strides = {n: 2 ** int(n[1:]) for n in names}
    max_stride = max(strides.values())
    return BackboneSpec(fpn, channels, strides, size_divisibility=max_stride)


@BACKBONE_REGISTRY.register(name="build_resnet_fpn_backbone")
def build_resnet_fpn_backbone(cfg, dtype=jnp.float32) -> BackboneSpec:
    return _build_resnet_fpn(cfg, top_block="maxpool", dtype=dtype)


@BACKBONE_REGISTRY.register(name="build_retinanet_resnet_fpn_backbone")
def build_retinanet_resnet_fpn_backbone(cfg, dtype=jnp.float32) -> BackboneSpec:
    return _build_resnet_fpn(cfg, top_block="p6p7_res5", dtype=dtype)


@BACKBONE_REGISTRY.register(name="build_retinanet_resnet_fpn_backbone_use_p5")
def build_retinanet_resnet_fpn_backbone_use_p5(cfg, dtype=jnp.float32) -> BackboneSpec:
    return _build_resnet_fpn(cfg, top_block="p6p7_p5", dtype=dtype)


@BACKBONE_REGISTRY.register(name="build_resnet_backbone")
def build_resnet_backbone(cfg, dtype=jnp.float32) -> BackboneSpec:
    module = resnet_from_cfg(cfg, dtype=dtype)
    chans = resnet_output_channels(cfg.MODEL.RESNETS.DEPTH,
                                   cfg.MODEL.RESNETS.RES2_OUT_CHANNELS)
    out = tuple(cfg.MODEL.RESNETS.OUT_FEATURES)
    return BackboneSpec(
        module,
        {n: chans[n] for n in out},
        {n: RESNET_STRIDES[n] for n in out},
        size_divisibility=max(RESNET_STRIDES[n] for n in out),
    )


def build_backbone(cfg, dtype=jnp.float32) -> BackboneSpec:
    return BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg, dtype=dtype)
