"""Stacked-Hourglass backbone (CornerNet), Flax NHWC.

Counterpart of `slender_det/modeling/backbone/hourglass.py:10-262`:
stem at stride 4 (7x7/2 conv + stride-2 residual), then STACKS recursive
hourglass modules of depth DEPTH_BLOCK with per-depth channels
CHANNELS_BLOCK / block counts NUM_CONV_BLOCK; outputs "hourglass{i+2}" per
stack at stride 4 with inter-stack residual fusion (the CornerNet scheme).
Configured by MODEL.HOURGLASS.* (config.py:49-62).
"""

from __future__ import annotations

from itertools import count
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import get_norm
from .fpn import BackboneSpec, upsample2x_nearest


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "BN"
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=pad, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = get_norm(self.norm, self.features, self.dtype)(x)
        return nn.relu(x) if self.relu else x


class Residual(nn.Module):
    features: int
    stride: int = 1
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvBNRelu(self.features, 3, self.stride, self.norm,
                         dtype=self.dtype)(x)
        out = ConvBNRelu(self.features, 3, 1, self.norm, relu=False,
                         dtype=self.dtype)(out)
        if x.shape[-1] != self.features or self.stride != 1:
            sc = ConvBNRelu(self.features, 1, self.stride, self.norm,
                            relu=False, dtype=self.dtype)(x)
        else:
            sc = x
        return nn.relu(out + sc)


class HourglassBlock(nn.Module):
    """Recursive hourglass of given depth."""

    depth: int
    channels: Sequence[int]
    num_convs: Sequence[int]
    norm: str = "BN"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_cur, c_next = self.channels[0], self.channels[1]
        n_cur, n_next = self.num_convs[0], self.num_convs[1]

        # TPU.REMAT_BACKBONE: rematerialize each Residual in the backward
        # pass (same trade as ResNet's per-block remat). nn.remat renames
        # auto-named submodules (Residual_0 -> CheckpointResidual_0), so
        # every Residual gets its auto name EXPLICITLY, in instantiation
        # order — the variable tree is identical with remat on or off and
        # checkpoints stay interchangeable (tests/test_backbones.py).
        res_cls = nn.remat(Residual) if self.remat else Residual
        ridx = count()

        def res(feats, inp, stride=1):
            return res_cls(feats, stride=stride, norm=self.norm,
                           dtype=self.dtype,
                           name=f"Residual_{next(ridx)}")(inp)

        up1 = x
        for i in range(n_cur):
            up1 = res(c_cur, up1)

        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(n_cur):
            low = res(c_next, low)

        if self.depth > 1:
            low = HourglassBlock(self.depth - 1, self.channels[1:],
                                 self.num_convs[1:], self.norm,
                                 remat=self.remat, dtype=self.dtype)(low)
        else:
            for i in range(n_next):
                low = res(c_next, low)

        for i in range(n_cur):
            low = res(c_cur if i == n_cur - 1 else c_next, low)
        up2 = upsample2x_nearest(low)
        return up1 + up2


class Hourglass(nn.Module):
    stacks: int = 2
    depth_block: int = 5
    channels_block: Sequence[int] = (256, 256, 384, 384, 384, 512)
    num_conv_block: Sequence[int] = (2, 2, 2, 2, 2, 4)
    stem_out_channels: int = 128
    norm: str = "BN"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        c0 = self.channels_block[0]
        res_cls = nn.remat(Residual) if self.remat else Residual
        # stem: stride 4
        x = ConvBNRelu(self.stem_out_channels, 7, 2, self.norm,
                       dtype=self.dtype)(x)
        x = res_cls(c0, stride=2, norm=self.norm, dtype=self.dtype,
                    name="Residual_0")(x)

        outputs: Dict[str, jnp.ndarray] = {}
        inter = x
        for s in range(self.stacks):
            hg = HourglassBlock(self.depth_block, self.channels_block,
                                self.num_conv_block, self.norm,
                                remat=self.remat,
                                dtype=self.dtype, name=f"hg{s}")(inter)
            feat = ConvBNRelu(c0, 3, 1, self.norm, dtype=self.dtype,
                              name=f"out_conv{s}")(hg)
            outputs[f"hourglass{s + 2}"] = feat
            if s < self.stacks - 1:
                # inter-stack fusion (CornerNet): 1x1 on input + 1x1 on feat
                a = ConvBNRelu(c0, 1, 1, self.norm, relu=False,
                               dtype=self.dtype, name=f"inter_a{s}")(inter)
                b = ConvBNRelu(c0, 1, 1, self.norm, relu=False,
                               dtype=self.dtype, name=f"inter_b{s}")(feat)
                inter = res_cls(c0, norm=self.norm, dtype=self.dtype,
                                name=f"inter_res{s}")(nn.relu(a + b))
        return outputs


def build_hourglass_backbone(cfg, dtype=jnp.float32) -> BackboneSpec:
    h = cfg.MODEL.HOURGLASS
    module = Hourglass(
        stacks=h.STACKS,
        depth_block=h.DEPTH_BLOCK,
        channels_block=tuple(h.CHANNELS_BLOCK),
        num_conv_block=tuple(h.NUM_CONV_BLOCK),
        stem_out_channels=h.STEM_OUT_CHANNELS,
        norm=h.NORM,
        remat=cfg.TPU.REMAT_BACKBONE,
        dtype=dtype,
    )
    out = tuple(h.OUT_FEATURES)
    c0 = h.CHANNELS_BLOCK[0]
    return BackboneSpec(
        module,
        {n: c0 for n in out},
        {n: 4 for n in out},
        size_divisibility=2 ** h.DEPTH_BLOCK * 4,
    )
