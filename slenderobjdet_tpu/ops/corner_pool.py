"""Corner pooling (CornerNet), TPU-native.

Replaces the reference's C++ ATen op (`slender_det/layers/csrc/corner_pool/
corner_pool.cpp`, doubling-stride max-scan) and its Python wrappers
(`slender_det/layers/corner_pool.py:10-192`). On TPU the directional
cumulative max is exactly `jax.lax.associative_scan(max)` along the spatial
axis — XLA lowers it to a logarithmic scan on the VPU, the same algorithm the
C++ code hand-rolls. Autodiff through the scan gives the exact subgradient
(grad flows to the argmax element), so no custom VJP is needed for parity
with the CUDA backward's argmax scatter.

Directions follow the reference naming:
- top_pool:    out(y) = max over y' >= y  (scan from bottom upward)
- bottom_pool: out(y) = max over y' <= y
- left_pool:   out(x) = max over x' >= x
- right_pool:  out(x) = max over x' <= x
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cummax(x: jnp.ndarray, axis: int, reverse: bool = False) -> jnp.ndarray:
    axis = axis % x.ndim  # associative_scan requires a nonnegative axis
    return jax.lax.associative_scan(jnp.maximum, x, axis=axis, reverse=reverse)


def top_pool(x: jnp.ndarray, axis: int = -3) -> jnp.ndarray:
    """Max over rows below (inclusive): reverse cummax along H. NHWC default."""
    return _cummax(x, axis=axis, reverse=True)


def bottom_pool(x: jnp.ndarray, axis: int = -3) -> jnp.ndarray:
    return _cummax(x, axis=axis, reverse=False)


def left_pool(x: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    return _cummax(x, axis=axis, reverse=True)


def right_pool(x: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    return _cummax(x, axis=axis, reverse=False)


def tl_pool(x_t: jnp.ndarray, x_l: jnp.ndarray) -> jnp.ndarray:
    """Top-left corner pooling: top_pool(a) + left_pool(b)."""
    return top_pool(x_t) + left_pool(x_l)


def br_pool(x_b: jnp.ndarray, x_r: jnp.ndarray) -> jnp.ndarray:
    return bottom_pool(x_b) + right_pool(x_r)
