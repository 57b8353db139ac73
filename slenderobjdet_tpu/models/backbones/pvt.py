"""Pyramid Vision Transformer (PVT v1) backbone, Flax NHWC.

Counterpart of `slender_det/modeling/backbone/pvt.py:182-374`: 4 stages of
(overlap-free patch embed -> spatial-reduction attention blocks), depths
selected by MODEL.PVT.DEPTH in {tiny, small, medium, large}, outputs
pvt1..pvt4 at strides 4/8/16/32. Position embeddings are bilinearly resized
to the runtime grid (shape-static under jit). DropPath/timm dependencies of
the reference are replaced by deterministic identity (rates are 0 in the
reference configs' eval path; stochastic depth can be added via rngs later).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

PVT_DEPTHS = {
    "tiny": (2, 2, 2, 2),
    "small": (3, 4, 6, 3),
    "medium": (3, 4, 18, 3),
    "large": (3, 8, 27, 3),
}
PVT_DIMS = (64, 128, 320, 512)
PVT_HEADS = (1, 2, 5, 8)
PVT_MLP_RATIOS = (8, 8, 4, 4)
PVT_SR_RATIOS = (8, 4, 2, 1)


class SRAttention(nn.Module):
    """Multi-head attention with spatial reduction of keys/values."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        B, N, C = x.shape
        H, W = hw
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5

        q = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="q")(x)
        if self.sr_ratio > 1:
            xr = x.reshape(B, H, W, C)
            xr = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                         (self.sr_ratio, self.sr_ratio), dtype=self.dtype,
                         param_dtype=jnp.float32, name="sr")(xr)
            xr = xr.reshape(B, -1, C)
            xr = nn.LayerNorm(dtype=jnp.float32, name="sr_norm")(
                xr.astype(jnp.float32)).astype(self.dtype)
        else:
            xr = x
        kv = nn.Dense(2 * C, dtype=self.dtype, param_dtype=jnp.float32,
                      name="kv")(xr)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(B, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        def ln(name):
            return nn.LayerNorm(dtype=jnp.float32, name=name)

        h = ln("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            dtype=self.dtype, name="attn")(h, hw)
        h = ln("norm2")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class PVT(nn.Module):
    depths: Sequence[int] = PVT_DEPTHS["small"]
    dims: Sequence[int] = PVT_DIMS
    num_heads: Sequence[int] = PVT_HEADS
    mlp_ratios: Sequence[int] = PVT_MLP_RATIOS
    sr_ratios: Sequence[int] = PVT_SR_RATIOS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        outputs = {}
        B = x.shape[0]
        patch = 4
        for stage in range(4):
            dim = self.dims[stage]
            x = nn.Conv(dim, (patch, patch), (patch, patch), dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"patch_embed{stage + 1}")(x)
            Bh, H, W, _ = x.shape
            x = x.reshape(B, H * W, dim)
            x = nn.LayerNorm(dtype=jnp.float32,
                             name=f"embed_norm{stage + 1}")(
                x.astype(jnp.float32)).astype(self.dtype)
            # learnable position embedding at a canonical 7x7 grid,
            # bilinearly resized to the runtime grid (static shapes)
            pos = self.param(f"pos_embed{stage + 1}",
                             nn.initializers.normal(stddev=0.02),
                             (1, 7, 7, dim), jnp.float32)
            pos = jax.image.resize(pos, (1, H, W, dim), "bilinear")
            x = x + pos.reshape(1, H * W, dim).astype(self.dtype)

            for blk in range(self.depths[stage]):
                x = PVTBlock(dim, self.num_heads[stage],
                             self.mlp_ratios[stage], self.sr_ratios[stage],
                             dtype=self.dtype,
                             name=f"stage{stage + 1}_block{blk}")(x, (H, W))
            x = nn.LayerNorm(dtype=jnp.float32,
                             name=f"stage_norm{stage + 1}")(
                x.astype(jnp.float32)).astype(self.dtype)
            x = x.reshape(B, H, W, dim)
            outputs[f"pvt{stage + 1}"] = x
            patch = 2
        return outputs


class PVTv2Block(nn.Module):
    """PVTv2 block: SRA attention + MLP with a 3x3 depthwise conv
    (reference `slender_det/modeling/backbone/pvt_v2.py:211-397`)."""

    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        H, W = hw
        B = x.shape[0]

        def ln(name):
            return nn.LayerNorm(dtype=jnp.float32, name=name)

        h = ln("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            dtype=self.dtype, name="attn")(h, hw)
        h = ln("norm2")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        # depthwise 3x3 between the MLP layers (the v2 addition)
        hh = h.reshape(B, H, W, -1)
        hh = nn.Conv(hh.shape[-1], (3, 3), padding=1,
                     feature_group_count=hh.shape[-1], dtype=self.dtype,
                     param_dtype=jnp.float32, name="dwconv")(hh)
        h = hh.reshape(B, H * W, -1)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class PVTv2(nn.Module):
    """PVTv2: overlapping patch embeds (7/4 then 3/2) + DWConv MLP blocks;
    no absolute position embeddings (the dwconv provides positions)."""

    depths: Sequence[int] = PVT_DEPTHS["small"]
    dims: Sequence[int] = PVT_DIMS
    num_heads: Sequence[int] = PVT_HEADS
    mlp_ratios: Sequence[int] = PVT_MLP_RATIOS
    sr_ratios: Sequence[int] = PVT_SR_RATIOS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        outputs = {}
        B = x.shape[0]
        for stage in range(4):
            dim = self.dims[stage]
            if stage == 0:
                x = nn.Conv(dim, (7, 7), (4, 4), padding=3, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"patch_embed{stage + 1}")(x)
            else:
                x = nn.Conv(dim, (3, 3), (2, 2), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"patch_embed{stage + 1}")(x)
            Bh, H, W, _ = x.shape
            x = x.reshape(B, H * W, dim)
            x = nn.LayerNorm(dtype=jnp.float32,
                             name=f"embed_norm{stage + 1}")(
                x.astype(jnp.float32)).astype(self.dtype)
            for blk in range(self.depths[stage]):
                x = PVTv2Block(dim, self.num_heads[stage],
                               self.mlp_ratios[stage], self.sr_ratios[stage],
                               dtype=self.dtype,
                               name=f"stage{stage + 1}_block{blk}")(x, (H, W))
            x = nn.LayerNorm(dtype=jnp.float32,
                             name=f"stage_norm{stage + 1}")(
                x.astype(jnp.float32)).astype(self.dtype)
            x = x.reshape(B, H, W, dim)
            outputs[f"pvt{stage + 1}"] = x
        return outputs


PVT_STRIDES = {"pvt1": 4, "pvt2": 8, "pvt3": 16, "pvt4": 32}


def build_pvt_backbone_spec(cfg, dtype=jnp.float32, v2: bool = False):
    from .fpn import BackboneSpec

    depth = cfg.MODEL.PVT.DEPTH
    cls = PVTv2 if v2 else PVT
    module = cls(depths=PVT_DEPTHS[depth], dtype=dtype)
    out = tuple(cfg.MODEL.PVT.OUT_FEATURES)
    return BackboneSpec(
        module,
        {n: PVT_DIMS[int(n[-1]) - 1] for n in out},
        {n: PVT_STRIDES[n] for n in out},
        size_divisibility=32,
    )
