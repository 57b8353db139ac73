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


def get_norm(norm: str, features: int, dtype: Dtype = jnp.float32) -> Optional[nn.Module]:
    if norm == "" or norm is None:
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features=features, dtype=dtype)
    if norm in ("GN",):
        return GroupNorm32(features=features, dtype=dtype)
    if norm in ("BN", "SyncBN"):
        # Plain BN is rarely used in the reference's detector configs (FrozenBN
        # or GN everywhere). Map BN→FrozenBN for inference-compatible behavior.
        return FrozenBatchNorm(features=features, dtype=dtype)
    raise ValueError(f"Unknown norm {norm!r}")


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
