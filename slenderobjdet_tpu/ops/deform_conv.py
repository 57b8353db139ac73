"""Deformable convolution (v1/v2) for TPU.

Replaces the CUDA DeformConv/ModulatedDeformConv the reference pulls from
detectron2 (`slender_det/layers/df_conv.py`, `meta_arch/reppoints/rpd.py:16`,
the "feature adaption" of every RepPoints/DCN variant).

TPU-first formulation: the irregular 3x3 sampling becomes a batched bilinear
gather (VPU + fast single-axis gather) producing (H, W, K, Cin) samples, and
the convolution collapses into ONE large matmul (H*W, K*Cin) @ (K*Cin, Cout)
that maps straight onto the MXU — instead of the CUDA kernel's
im2col+gemm-per-group. Out-of-bounds samples contribute zero (torch DCN
boundary semantics).

Offset convention: `offsets[..., k, :] = (dy, dx)` is the ABSOLUTE sampling
displacement of kernel point k from the output pixel (kernel base included).
Callers porting torch semantics pass `torch_offset + kernel_base`; RepPoints
passes its predicted points directly (its dcn_offset = points - base followed
by the kernel's + base is a no-op chain, rpd.py:624-640).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kernel_base_offsets(kernel_size: int = 3) -> np.ndarray:
    """(K, 2) (dy, dx) grid of a centered kernel, matching the reference's
    dcn_base_offset construction (rpd.py:105-110)."""
    pad = (kernel_size - 1) // 2
    base = np.arange(-pad, pad + 1, dtype=np.float32)
    dy = np.repeat(base, kernel_size)
    dx = np.tile(base, kernel_size)
    return np.stack([dy, dx], axis=1)


def _gather_bilinear_zeropad(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """feat (H, W, C); ys/xs (...,) -> (..., C); zero outside the image.

    The gather is HBM-bandwidth-bound (each tap reads a full C-row); it runs
    in feat's OWN dtype (bf16 halves the traffic vs the old fp32 upcast) and
    the interpolation weights are applied in that dtype too — the following
    MXU matmul accumulates in fp32."""
    h, w, _ = feat.shape
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    ly = (ys - y0f)[..., None].astype(feat.dtype)
    lx = (xs - x0f)[..., None].astype(feat.dtype)
    one = jnp.ones((), feat.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    flat = feat.reshape(h * w, -1)

    def tap(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, -1)
        return vals * (wgt * inside[..., None].astype(feat.dtype))

    return (
        tap(y0, x0, (one - ly) * (one - lx))
        + tap(y0, x0 + 1, (one - ly) * lx)
        + tap(y0 + 1, x0, ly * (one - lx))
        + tap(y0 + 1, x0 + 1, ly * lx)
    )


def deform_conv2d(
    x: jnp.ndarray,                  # (H, W, Cin)
    offsets: jnp.ndarray,            # (H, W, K, 2) absolute (dy, dx)
    weight: jnp.ndarray,             # (K, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,   # (H, W, K) modulation (v2)
) -> jnp.ndarray:
    """Single-image deformable conv; vmap for batches. -> (H, W, Cout)."""
    h, w, cin = x.shape
    k = offsets.shape[2]

    yy = jnp.arange(h, dtype=offsets.dtype)[:, None, None] + offsets[..., 0]
    xx = jnp.arange(w, dtype=offsets.dtype)[None, :, None] + offsets[..., 1]

    samples = _gather_bilinear_zeropad(x, yy, xx)        # (H, W, K, Cin)
    if mask is not None:
        samples = samples * mask[..., None].astype(samples.dtype)

    out = jax.lax.dot_general(
        samples.reshape(h * w, k * cin),
        weight.reshape(k * cin, -1).astype(samples.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(h, w, -1)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d_batched(x, offsets, weight, bias=None, mask=None):
    """(B, H, W, Cin) variant."""
    fn = lambda xi, oi, mi: deform_conv2d(xi, oi, weight, bias, mi)
    if mask is None:
        return jax.vmap(lambda xi, oi: deform_conv2d(xi, oi, weight, bias))(
            x, offsets
        )
    return jax.vmap(fn)(x, offsets, mask)


def deform_sample(x: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling only: (H, W, Cin) x (H, W, K, 2) -> (H, W, K, Cin).

    Lets callers that apply several deformable convs AT THE SAME OFFSETS
    (e.g. RepPoints' deform_cls/deform_reg pair, rpd.py:641-645) gather ONCE
    from the channel-concatenated features: the gather is the
    bandwidth-bound part, and wider rows gather faster on TPU."""
    h, w, _ = x.shape
    yy = jnp.arange(h, dtype=offsets.dtype)[:, None, None] + offsets[..., 0]
    xx = jnp.arange(w, dtype=offsets.dtype)[None, :, None] + offsets[..., 1]
    return _gather_bilinear_zeropad(x, yy, xx)


def deform_sample_batched(x, offsets):
    return jax.vmap(deform_sample)(x, offsets)


def deform_apply(samples: jnp.ndarray, weight: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None,
                 out_dtype=None) -> jnp.ndarray:
    """(B, H, W, K, Cin) samples x (K, Cin, Cout) -> (B, H, W, Cout): the MXU
    half of the deformable conv (fp32 accumulation)."""
    b, h, w, k, cin = samples.shape
    out = jax.lax.dot_general(
        samples.reshape(b * h * w, k * cin),
        weight.reshape(k * cin, -1).astype(samples.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, h, w, -1)
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype or samples.dtype)
