"""Dynamic int8 inference: route the wide 3x3 convs through the MXU's
s8 x s8 -> s32 path (2x bf16 peak on v5e) without touching any model code.

How: `int8_predict_scope(enabled)` installs a `flax.linen.intercept_methods`
interceptor around `module.apply` that replaces eligible `nn.Conv.__call__`s
with a quantized equivalent:

  - weights: per-output-channel symmetric int8 (max-abs / 127), computed
    in-graph from the fp32 params — loop-invariant, so XLA hoists it out of
    serving scan loops; no separate calibrated checkpoint needed
  - activations: per-tensor dynamic symmetric int8 (max-abs / 127) —
    calibration-free; the quantize pass is elementwise and fuses into the
    producer's epilogue (GN/relu) under XLA
  - conv: `lax.conv_general_dilated(s8, s8, preferred_element_type=s32)`,
    then one fused rescale by (act_scale * per-channel weight_scale) + bias

Eligibility is measured, not guessed (tools/int8_conv_probe.py, on-chip
v5e, full-output-consumed protocol): the realistic dynamic-quantize path
wins only on wide >=3x3 convs — head 3x3 256ch 1.19x, res4 3x3 256ch
1.12x, res5 3x3 512ch 1.19x — and LOSES on 1x1 (0.67x: memory-bound, the
quantize pass costs more than int8 saves) and on 128-ch 3x3 (0.91x). So:
kernel taps >= 9 AND in_features >= 256 AND features >= 128. The
features >= 128 floor also keeps every final predictor conv (cls_logits 80,
bbox_pred 4, centerness 1) in full precision.

No reference counterpart: the reference serves fp32 torch
(`/root/reference/slender_det/evaluation/evaluator.py:42-85` times the fp
model); this is a TPU-native serving feature. Default OFF
(`cfg.TPU.INT8_PREDICT`); `tools/coco_rehearsal.py` A/Bs its AP against fp
the same way APPROX_TOPK is gated.
"""

from contextlib import nullcontext
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

# measured win thresholds (tools/int8_conv_probe.py, VALIDATION round 4)
MIN_IN_FEATURES = 256
MIN_OUT_FEATURES = 128
MIN_KERNEL_TAPS = 9


def quantize_conv_kernel(kernel: jnp.ndarray):
    """(kh, kw, in, out) float kernel -> (int8 kernel, (out,) f32 scales)."""
    k32 = kernel.astype(jnp.float32)
    s = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(k32 / s), -127, 127).astype(jnp.int8)
    return q, s


def dynamic_quantize(x: jnp.ndarray):
    """Per-tensor symmetric int8: (int8 tensor, scalar f32 scale)."""
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32)) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _pair(v, default=1):
    if v is None:
        return (default, default)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _padding_2d(padding):
    """Normalize flax Conv padding to what conv_general_dilated accepts."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding),) * 2
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(out)


def _conv_is_plain(mod: nn.Conv) -> bool:
    """Only take over convs whose semantics we replicate exactly."""
    if _pair(getattr(mod, "input_dilation", None) or 1) != (1, 1):
        return False
    if _pair(getattr(mod, "kernel_dilation", None) or 1) != (1, 1):
        return False
    if getattr(mod, "mask", None) is not None:
        return False
    return True


def eligible(mod: Any, x: jnp.ndarray) -> bool:
    if type(mod) is not nn.Conv or x.ndim != 4:
        return False
    ks = _pair(mod.kernel_size)
    if ks[0] * ks[1] < MIN_KERNEL_TAPS:
        return False
    if x.shape[-1] < MIN_IN_FEATURES or mod.features < MIN_OUT_FEATURES:
        return False
    return _conv_is_plain(mod)


def int8_conv_call(mod: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """Quantized replacement for an eligible bound nn.Conv's __call__."""
    ks = _pair(mod.kernel_size)
    in_feat = x.shape[-1]
    groups = mod.feature_group_count
    kshape = ks + (in_feat // groups, mod.features)
    # same (name, init, shape, dtype) as nn.Conv -> retrieves the existing
    # param under apply and creates the identical one under init
    kernel = mod.param("kernel", mod.kernel_init, kshape, mod.param_dtype)
    bias = (mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
            if mod.use_bias else None)

    wq, ws = quantize_conv_kernel(kernel)
    xq, xs = dynamic_quantize(x)
    acc = lax.conv_general_dilated(
        xq, wq,
        window_strides=_pair(mod.strides),
        padding=_padding_2d(mod.padding),
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, kshape, ("NHWC", "HWIO", "NHWC")),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (xs * ws)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(mod.dtype or x.dtype)


def _interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if (context.method_name == "__call__" and args
            and isinstance(args[0], jnp.ndarray) and eligible(mod, args[0])):
        return int8_conv_call(mod, args[0])
    return next_fn(*args, **kwargs)


def int8_predict_scope(enabled: bool):
    """`with int8_predict_scope(cfg.TPU.INT8_PREDICT): module.apply(...)`."""
    if not enabled:
        return nullcontext()
    return nn.intercept_methods(_interceptor)
