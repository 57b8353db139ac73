"""Visual-Transformer FPN (VT-FPN) + PVT-FPN builders.

Counterparts of the reference's VT-FPN (`slender_det/modeling/backbone/
fpn.py:128-298` with blocks from `slender_det/layers/visual_transformer.py`:
Tokenizer -> Transformer -> Projector replacing the top-down pathway) and
`build_retinanet_pvt_fpn_backbone` (fpn.py:22-44).

VT-FPN scheme: each level's lateral feature is summarized into L visual
tokens via spatial attention; tokens from all levels attend to each other in
a small transformer; a projector injects the refined tokens back into every
level (pixels attend to tokens). All fixed-shape, attention on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import BACKBONE_REGISTRY, BackboneSpec
from .pvt import PVT_STRIDES, build_pvt_backbone_spec
from .resnet import RESNET_STRIDES, resnet_from_cfg


class Tokenizer(nn.Module):
    """(B, H, W, C) -> (B, L, C) via softmax spatial attention."""

    num_tokens: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        attn = nn.Conv(self.num_tokens, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="attn")(x)
        attn = jax.nn.softmax(
            attn.reshape(b, h * w, self.num_tokens).astype(jnp.float32), axis=1
        ).astype(self.dtype)
        feats = x.reshape(b, h * w, c)
        return jnp.einsum("bnl,bnc->blc", attn, feats,
                          preferred_element_type=jnp.float32).astype(self.dtype)


class TokenTransformer(nn.Module):
    num_layers: int = 2
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        c = tokens.shape[-1]
        for i in range(self.num_layers):
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln1_{i}")(
                tokens.astype(jnp.float32)).astype(self.dtype)
            h = nn.SelfAttention(num_heads=self.num_heads, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"attn{i}")(h)
            tokens = tokens + h
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(
                tokens.astype(jnp.float32)).astype(self.dtype)
            h = nn.Dense(c * 2, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc1_{i}")(h)
            h = nn.gelu(h)
            h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc2_{i}")(h)
            tokens = tokens + h
        return tokens


class Projector(nn.Module):
    """Pixels attend to tokens; residual injection."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tokens):
        b, h, w, c = x.shape
        q = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="q")(x.reshape(b, h * w, c))
        k = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="k")(tokens)
        v = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="v")(tokens)
        attn = jnp.einsum("bnc,blc->bnl", q, k,
                          preferred_element_type=jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnl,blc->bnc", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return x + out.reshape(b, h, w, c)


class VTFPN(nn.Module):
    bottom_up: nn.Module
    in_features: Sequence[str]
    out_channels: int = 256
    num_tokens: int = 16
    top_block_src: str = "p5"      # "p5" or the last bottom-up feature name
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        bu = self.bottom_up(x)
        feats = [bu[f] for f in self.in_features]

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        tokens = jnp.concatenate(
            [
                Tokenizer(self.num_tokens, dtype=self.dtype,
                          name=f"tokenizer{i}")(l)
                for i, l in enumerate(laterals)
            ],
            axis=1,
        )
        tokens = TokenTransformer(dtype=self.dtype, name="transformer")(tokens)

        start = int(RESNET_STRIDES.get(
            self.in_features[0], PVT_STRIDES.get(self.in_features[0], 8)
        )).bit_length() - 1
        outputs = {}
        names = []
        for i, l in enumerate(laterals):
            p = Projector(dtype=self.dtype, name=f"projector{i}")(l, tokens)
            p = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"output{i}")(p)
            name = f"p{start + i}"
            outputs[name] = p
            names.append(name)

        last = int(names[-1][1:])
        src = outputs[names[-1]] if self.top_block_src == "p5" \
            else bu[self.in_features[-1]]
        p6 = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="top_p6")(src)
        p7 = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="top_p7")(nn.relu(p6))
        outputs[f"p{last + 1}"] = p6
        outputs[f"p{last + 2}"] = p7
        return outputs


def _vt_fpn_spec(cfg, bottom_up, in_features, strides_map, top_src, dtype):
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    fpn = VTFPN(bottom_up=bottom_up, in_features=tuple(in_features),
                out_channels=out_channels, top_block_src=top_src, dtype=dtype)
    start = int(strides_map[in_features[0]]).bit_length() - 1
    names = [f"p{start + i}" for i in range(len(in_features))]
    names += [f"p{int(names[-1][1:]) + 1}", f"p{int(names[-1][1:]) + 2}"]
    channels = {n: out_channels for n in names}
    strides = {n: 2 ** int(n[1:]) for n in names}
    return BackboneSpec(fpn, channels, strides,
                        size_divisibility=max(strides.values()))


@BACKBONE_REGISTRY.register(name="build_retinanet_pvt_fpn_backbone")
def build_retinanet_pvt_fpn_backbone(cfg, dtype=jnp.float32) -> BackboneSpec:
    """PVT bottom-up + standard FPN with P6/P7 from pvt4 (fpn.py:22-44)."""
    from .fpn import FPN

    pvt_spec = build_pvt_backbone_spec(cfg, dtype=dtype)
    in_features = tuple(cfg.MODEL.FPN.IN_FEATURES)
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    fpn = FPN(
        bottom_up=pvt_spec.module,
        in_features=in_features,
        out_channels=out_channels,
        norm=cfg.MODEL.FPN.NORM,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        top_block="p6p7_res5",  # from the last bottom-up feature (pvt4)
        dtype=dtype,
    )
    start = int(PVT_STRIDES[in_features[0]]).bit_length() - 1
    names = [f"p{start + i}" for i in range(len(in_features))]
    names += [f"p{int(names[-1][1:]) + 1}", f"p{int(names[-1][1:]) + 2}"]
    return BackboneSpec(
        fpn, {n: out_channels for n in names},
        {n: 2 ** int(n[1:]) for n in names},
        size_divisibility=max(2 ** int(n[1:]) for n in names),
    )


@BACKBONE_REGISTRY.register(name="build_retinanet_pvtv2_fpn_backbone")
def build_retinanet_pvtv2_fpn_backbone(cfg, dtype=jnp.float32) -> BackboneSpec:
    """PVTv2 bottom-up + FPN. The reference ships pvt_v2.py unregistered
    ("model zoo for future use", SURVEY §2.4); registering it here makes
    the v2 zoo checkpoints (importable via import_pvt_weights) usable from
    a config by just swapping BACKBONE.NAME."""
    from .fpn import FPN
    from .pvt import build_pvt_backbone_spec as _spec

    pvt_spec = _spec(cfg, dtype=dtype, v2=True)
    in_features = tuple(cfg.MODEL.FPN.IN_FEATURES)
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    fpn = FPN(
        bottom_up=pvt_spec.module,
        in_features=in_features,
        out_channels=out_channels,
        norm=cfg.MODEL.FPN.NORM,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        top_block="p6p7_res5",
        dtype=dtype,
    )
    start = int(PVT_STRIDES[in_features[0]]).bit_length() - 1
    names = [f"p{start + i}" for i in range(len(in_features))]
    names += [f"p{int(names[-1][1:]) + 1}", f"p{int(names[-1][1:]) + 2}"]
    return BackboneSpec(
        fpn, {n: out_channels for n in names},
        {n: 2 ** int(n[1:]) for n in names},
        size_divisibility=max(2 ** int(n[1:]) for n in names),
    )


@BACKBONE_REGISTRY.register(name="build_retinanet_resnet_vt_fpn")
def build_retinanet_resnet_vt_fpn(cfg, dtype=jnp.float32) -> BackboneSpec:
    bottom_up = resnet_from_cfg(cfg, dtype=dtype)
    return _vt_fpn_spec(cfg, bottom_up, tuple(cfg.MODEL.FPN.IN_FEATURES),
                        RESNET_STRIDES, "p5", dtype)


@BACKBONE_REGISTRY.register(name="build_retinanet_resnet_vt_fpn_backbone_use_p5")
def build_retinanet_resnet_vt_fpn_use_p5(cfg, dtype=jnp.float32) -> BackboneSpec:
    bottom_up = resnet_from_cfg(cfg, dtype=dtype)
    return _vt_fpn_spec(cfg, bottom_up, tuple(cfg.MODEL.FPN.IN_FEATURES),
                        RESNET_STRIDES, "p5", dtype)
