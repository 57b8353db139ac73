"""ResNet/ResNeXt backbone in Flax, NHWC, TPU-first.

Functional counterpart of the detectron2 ResNet the reference uses for every
model family (configs set MODEL.RESNETS.{DEPTH,NORM,OUT_FEATURES,...};
see SURVEY.md §2.4). Behavioral parity points:
- bottleneck (depth>=50) / basic (18/34) blocks, stride-in-1x1 option
  (Caffe-style, the d2 default), res5 dilation, groups/width_per_group
- stem: 7x7/2 conv + maxpool/2
- norm: FrozenBN default (fixed affine; see layers.FrozenBatchNorm)
- out features: res2..res5 with strides 4/8/16/32
- freeze-at: exposed as a param-mask helper (`trainable_mask`) because in JAX
  freezing means masking optimizer updates, not mutating modules.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import FrozenBatchNorm, get_norm


# NOTE on the stem (round-3 measurement, VALIDATION.md): the MLPerf
# space-to-depth trick — evaluating the 7x7/2 stem as a 4x4/1 conv over a
# 2x2 space-to-depth input to raise the MXU contraction from 3 to 192 lanes —
# was implemented and measured SLOWER end-to-end on v5e via XLA: the 4x4/1
# conv over (H/2, W/2, 12) lowers to 21.0 ms at B=32 800x1344 vs 10.2 ms for
# the plain 7x7/2 over (H, W, 3) (and the bf16 s2d relayout alone costs
# 8.1 ms). XLA's small-channel conv path already picks a better internal
# layout than the hand-packed 12-channel form. The stem therefore stays a
# plain conv; remaining stem headroom belongs to a fused Pallas
# conv+relu+maxpool kernel, not a reformulation.

# depth -> (block type, stage block counts)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                      use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv1")(x)
        out = get_norm(self.norm, self.features, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), (1, 1), padding=1, use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(out)
        out = get_norm(self.norm, self.features, self.dtype)(out)

        if x.shape[-1] != self.features or self.stride != 1:
            sc = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                         use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                         name="shortcut")(x)
            sc = get_norm(self.norm, self.features, self.dtype)(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class BottleneckBlock(nn.Module):
    features: int          # output channels (4x bottleneck width)
    bottleneck: int        # inner channels
    stride: int = 1
    stride_in_1x1: bool = True
    groups: int = 1
    dilation: int = 1
    norm: str = "FrozenBN"
    deform: bool = False           # DEFORM_ON_PER_STAGE: conv2 -> DFConv2d
    deform_modulated: bool = False
    fused: bool = False            # MODEL.RESNETS.FUSED_BLOCKS (Pallas)
    dtype: Any = jnp.float32

    def _fused_eligible(self) -> bool:
        return (self.fused and self.stride == 1 and not self.deform
                and self.groups == 1 and self.dilation == 1
                and self.norm == "FrozenBN" and not self.is_initializing())

    def _fused_call(self, x):
        """Single fused Pallas kernel for the whole block (ops/
        fused_bottleneck.py): FrozenBN is folded into per-conv (weight, bias)
        and the 1x1/3x3/1x1(+shortcut) chain runs VMEM-resident. Parameters
        were created by the normal path during init, so the pytree is
        identical; this path only reads them."""
        from ...ops.fused_bottleneck import fused_bottleneck

        p = self.variables["params"]
        bufs = self.variables["buffers"]

        def fold(kernel, idx):
            s = bufs[f"FrozenBatchNorm_{idx}"]["scale"]
            b = bufs[f"FrozenBatchNorm_{idx}"]["bias"]
            return (kernel * s).astype(self.dtype), b

        w1, b1 = fold(p["conv1"]["kernel"][0, 0], 0)
        w2, b2 = fold(p["conv2"]["kernel"], 1)
        w3, b3 = fold(p["conv3"]["kernel"][0, 0], 2)
        if "shortcut" in p:
            wsc, bsc = fold(p["shortcut"]["kernel"][0, 0], 3)
        else:
            wsc, bsc = None, None
        return fused_bottleneck(x.astype(self.dtype), w1, b1, w2, b2, w3,
                                b3, wsc, bsc)

    @nn.compact
    def __call__(self, x):
        if self._fused_eligible():
            return self._fused_call(x)
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        out = nn.Conv(self.bottleneck, (1, 1), (s1, s1), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        out = get_norm(self.norm, self.bottleneck, self.dtype)(out)
        out = nn.relu(out)

        if self.deform and s3 == 1 and self.groups == 1 and self.dilation == 1:
            from ..layers import DFConv2d

            out = DFConv2d(self.bottleneck, modulated=self.deform_modulated,
                           dtype=self.dtype, name="conv2")(out)
        else:
            out = nn.Conv(
                self.bottleneck, (3, 3), (s3, s3),
                padding=self.dilation, feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name="conv2",
            )(out)
        out = get_norm(self.norm, self.bottleneck, self.dtype)(out)
        out = nn.relu(out)

        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv3")(out)
        out = get_norm(self.norm, self.features, self.dtype)(out)

        if x.shape[-1] != self.features or self.stride != 1:
            sc = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                         use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                         name="shortcut")(x)
            sc = get_norm(self.norm, self.features, self.dtype)(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    depth: int = 50
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    fused_blocks: bool = False
    fused_stem: bool = False       # MODEL.RESNETS.FUSED_STEM (Pallas)
    remat: bool = False
    dtype: Any = jnp.float32

    def _fused_stem_call(self, x):
        """Whole stem as one Pallas kernel (ops/fused_stem.py): the FrozenBN
        affine is folded in and only the pooled output leaves the chip.
        Parameters were created by the normal path during init, so the
        pytree is identical; this path only reads them."""
        from ...ops.fused_stem import fused_stem

        w = self.variables["params"]["stem_conv1"]["kernel"]
        bn = self.variables["buffers"]["FrozenBatchNorm_0"]
        return fused_stem(x.astype(self.dtype), w, bn["scale"], bn["bias"])

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        block_type, stage_blocks = RESNET_SPECS[self.depth]
        # TPU.REMAT_BACKBONE: rematerialize each residual block in the
        # backward pass instead of storing its activations — trades ~33%
        # extra conv FLOPs in res2-5 for the dominant share of training
        # activation memory (bigger batches / resolutions per chip).
        # Gradients agree to recompute-fusion rounding
        # (tests/test_backbones.py).
        bottleneck_cls = (nn.remat(BottleneckBlock) if self.remat
                          else BottleneckBlock)
        basic_cls = nn.remat(BasicBlock) if self.remat else BasicBlock

        # ---- stem: 7x7/2 + 3x3 maxpool/2
        from ...ops.fused_stem import stem_eligible

        if (self.fused_stem and self.norm == "FrozenBN"
                and not self.is_initializing()
                and stem_eligible(x.shape, (7, 7, 3, self.stem_out_channels))):
            out = self._fused_stem_call(x)
        else:
            out = nn.Conv(self.stem_out_channels, (7, 7), (2, 2), padding=3,
                          use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name="stem_conv1")(x)
            out = get_norm(self.norm, self.stem_out_channels, self.dtype)(out)
            out = nn.relu(out)
            out = nn.max_pool(out, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))

        features: Dict[str, jnp.ndarray] = {}
        out_channels = self.res2_out_channels if block_type == "bottleneck" else 64
        bottleneck_channels = self.num_groups * self.width_per_group

        for stage_idx, num_blocks in enumerate(stage_blocks):
            name = f"res{stage_idx + 2}"
            first_stride = 1 if stage_idx == 0 else 2
            dilation = self.res5_dilation if name == "res5" else 1
            if dilation > 1:
                first_stride = 1
            for block_idx in range(num_blocks):
                stride = first_stride if block_idx == 0 else 1
                if block_type == "bottleneck":
                    out = bottleneck_cls(
                        features=out_channels,
                        bottleneck=bottleneck_channels,
                        stride=stride,
                        stride_in_1x1=self.stride_in_1x1,
                        groups=self.num_groups,
                        dilation=dilation,
                        norm=self.norm,
                        deform=self.deform_on_per_stage[stage_idx],
                        deform_modulated=self.deform_modulated,
                        fused=self.fused_blocks,
                        dtype=self.dtype,
                        name=f"{name}_{block_idx}",
                    )(out)
                else:
                    out = basic_cls(
                        features=out_channels,
                        stride=stride,
                        norm=self.norm,
                        dtype=self.dtype,
                        name=f"{name}_{block_idx}",
                    )(out)
            if name in self.out_features:
                features[name] = out
            out_channels *= 2
            bottleneck_channels *= 2

        return features


def resnet_output_channels(depth: int, res2_out_channels: int = 256) -> Dict[str, int]:
    base = res2_out_channels if depth >= 50 else 64
    return {f"res{i + 2}": base * (2 ** i) for i in range(4)}


RESNET_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


def resnet_from_cfg(cfg, dtype=jnp.float32) -> ResNet:
    r = cfg.MODEL.RESNETS
    return ResNet(
        depth=r.DEPTH,
        norm=r.NORM,
        out_features=tuple(r.OUT_FEATURES),
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        stride_in_1x1=r.STRIDE_IN_1X1,
        res5_dilation=r.RES5_DILATION,
        deform_on_per_stage=tuple(r.DEFORM_ON_PER_STAGE),
        deform_modulated=r.DEFORM_MODULATED,
        fused_blocks=getattr(r, "FUSED_BLOCKS", False),
        fused_stem=getattr(r, "FUSED_STEM", False),
        remat=cfg.TPU.REMAT_BACKBONE,
        dtype=dtype,
    )


def resnet_trainable_mask(params: Dict, freeze_at: int) -> Dict:
    """Pytree mask (True = trainable) implementing MODEL.BACKBONE.FREEZE_AT:
    freeze_at>=1 freezes the stem, >=2 also freezes res2, etc."""

    def frozen(path: str) -> bool:
        if freeze_at >= 1 and path.startswith("stem"):
            return True
        for stage in range(2, 6):
            if freeze_at >= stage and path.startswith(f"res{stage}_"):
                return True
        return False

    # Build mask recursively over the nested dict by top-level module name.
    def walk(tree, top_name=None):
        if isinstance(tree, dict):
            return {
                k: walk(v, top_name if top_name is not None else k)
                for k, v in tree.items()
            }
        return not frozen(top_name or "")

    return walk(params)
