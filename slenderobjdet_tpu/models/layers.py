"""Shared Flax building blocks (NHWC, mixed-precision-ready).

TPU-first counterparts of the reference's layer zoo:
- `Scale` — learnable scalar (reference `slender_det/layers/scale.py:5-11`)
- `FrozenBatchNorm` — fixed affine, matching detectron2 FrozenBN semantics
  (stats folded into scale/bias; never updated). Stored in the `buffers`
  collection so optimizers never touch it.
- `get_norm` — norm factory ("FrozenBN" | "GN" | "BN"→GN fallback | "").

All convs run in `dtype` (bfloat16 by default on TPU) with float32 params.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class Scale(nn.Module):
    """Learnable scalar multiplier (per-FPN-level bbox scaling in FCOS)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", lambda rng: jnp.asarray(self.init_value, jnp.float32)
        )
        return x * scale.astype(x.dtype)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine parameters frozen.

    Equivalent to detectron2's FrozenBatchNorm2d after folding: a fixed
    per-channel affine y = x * scale + bias. Parameters live in the
    `buffers` variable collection (excluded from gradients/optimizer).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.variable(
            "buffers", "scale", lambda: jnp.ones((self.features,), jnp.float32)
        )
        bias = self.variable(
            "buffers", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        return x * scale.value.astype(x.dtype) + bias.value.astype(x.dtype)


class GroupNorm32(nn.Module):
    features: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # GroupNorm reduces in float32 for stability, casts back to input dtype
        return nn.GroupNorm(
            num_groups=self.num_groups, dtype=jnp.float32, param_dtype=jnp.float32
        )(x.astype(jnp.float32)).astype(x.dtype)


def get_norm(norm: str, features: int, dtype: Dtype = jnp.float32,
             name: Optional[str] = None) -> Optional[nn.Module]:
    if norm == "" or norm is None:
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features=features, dtype=dtype, name=name)
    if norm in ("GN",):
        return GroupNorm32(features=features, dtype=dtype, name=name)
    if norm in ("BN", "SyncBN"):
        # Plain BN is rarely used in the reference's detector configs (FrozenBN
        # or GN everywhere). Map BN→FrozenBN for inference-compatible behavior.
        return FrozenBatchNorm(features=features, dtype=dtype, name=name)
    raise ValueError(f"Unknown norm {norm!r}")


class DFConv2d(nn.Module):
    """Offset-predicting deformable conv (reference `slender_det/layers/
    df_conv.py:6-79`): a 3x3 conv predicts 18 offsets (v1) or 27 offsets+mask
    (v2 / modulated), feeding a deformable 3x3 conv. Offsets are produced in
    torch DCN convention ((dy,dx)*9 relative to the kernel grid) and shifted
    to the absolute convention of ops.deform_conv."""

    features: int
    modulated: bool = True       # v2
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.deform_conv import deform_conv2d_batched, kernel_base_offsets

        assert self.stride == 1, "strided DFConv2d not needed by the reference"
        b, h, w, cin = x.shape
        off_ch = 27 if self.modulated else 18
        pred = nn.Conv(off_ch, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros,
                       name="offset_conv")(x).astype(jnp.float32)
        rel = pred[..., :18].reshape(b, h, w, 9, 2)
        mask = jax.nn.sigmoid(pred[..., 18:]) if self.modulated else None

        base = jnp.asarray(kernel_base_offsets(3))
        weight = self.param("weight", nn.initializers.normal(stddev=0.01),
                            (9, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # gather in the compute dtype (bandwidth-bound); fp32 accumulation
        # happens inside the deform-conv matmul
        return deform_conv2d_batched(
            x, rel + base, weight, bias, mask
        ).astype(self.dtype)


def conv3x3(features: int, stride: int = 1, use_bias: bool = True, dtype=jnp.float32,
            name: Optional[str] = None, kernel_init=None) -> nn.Conv:
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=1, use_bias=use_bias,
        dtype=dtype, param_dtype=jnp.float32, name=name, **kwargs,
    )


def conv1x1(features: int, stride: int = 1, use_bias: bool = True, dtype=jnp.float32,
            name: Optional[str] = None, kernel_init=None) -> nn.Conv:
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(
        features, (1, 1), strides=(stride, stride), padding=0, use_bias=use_bias,
        dtype=dtype, param_dtype=jnp.float32, name=name, **kwargs,
    )
