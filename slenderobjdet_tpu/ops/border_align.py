"""BorderAlign, TPU-native.

Replaces the reference CUDA kernel (`slender_det/layers/csrc/border_align/
BorderAlign_cuda.cu`: for each box, max-pool of pool_size+1 bilinear samples
along each of the 4 borders; channel group i of the 4C input serves border i
in (left, top, right, bottom) order; wrapper `layers/border_align.py:9-43`).

XLA formulation: build all sample coordinates (K, 4, S, 2), one bilinear
gather per border group, max over the sample axis — gathers + VPU max, no
custom kernel required for correctness (a fused Pallas version is the perf
follow-up).
"""

from __future__ import annotations

import jax.numpy as jnp

from .deform_conv import _gather_bilinear_zeropad


def border_align(
    feat: jnp.ndarray,    # (H, W, 4C)
    boxes: jnp.ndarray,   # (K, 4) XYXY in feature coords
    pool_size: int = 10,
) -> jnp.ndarray:
    """-> (K, 4C): per-border max of pool_size+1 bilinear samples."""
    H, W, C4 = feat.shape
    C = C4 // 4
    K = boxes.shape[0]
    S = pool_size + 1

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    t = jnp.linspace(0.0, 1.0, S)[None, :]                 # (1, S)

    # border sample coordinates (K, S): left, top, right, bottom
    coords = [
        (x1[:, None] + 0 * t, y1[:, None] + (y2 - y1)[:, None] * t),   # left
        (x1[:, None] + (x2 - x1)[:, None] * t, y1[:, None] + 0 * t),   # top
        (x2[:, None] + 0 * t, y1[:, None] + (y2 - y1)[:, None] * t),   # right
        (x1[:, None] + (x2 - x1)[:, None] * t, y2[:, None] + 0 * t),   # bottom
    ]

    outs = []
    for b, (xs, ys) in enumerate(coords):
        group = feat[:, :, b * C: (b + 1) * C]
        samples = _gather_bilinear_zeropad(group, ys, xs)  # (K, S, C)
        outs.append(jnp.max(samples, axis=1))              # (K, C)
    return jnp.concatenate(outs, axis=-1)
