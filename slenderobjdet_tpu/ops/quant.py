"""Int8 inference: route wide convs through the MXU's s8 x s8 -> s32 path
(2x bf16 peak on v5e) without touching any model code. Two modes:

  - DYNAMIC (calibration-free, cfg.TPU.INT8_PREDICT alone): per-tensor
    max-abs activation scales computed in-graph; only the measured-winner
    wide 3x3s are taken over. FCOS R-50 predict 282.0 vs 255.7 img/s fp
    (1.11x, v5e B=32 800x1344). Suits SHALLOW wide towers only: on
    hourglass-104 CornerNet (~185 eligible sites) the per-site max
    reductions swamp the s8 win — 0.70x measured (round 5).
  - STATIC (calibrated, + cfg.TPU.INT8_SCALES json from
    tools/int8_calibrate.py): per-conv constant scales make the quantize
    pass pure elementwise and extend coverage to >=128-ch convs incl.
    1x1s. FCOS 312.9 img/s (1.22x fp, round-5 floor A/B below);
    RetinaNet 1.19x; CornerNet 1.40x (the deep-stack case dynamic
    loses).

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

import os
from contextlib import contextmanager, nullcontext
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

# measured win thresholds (tools/int8_conv_probe.py, VALIDATION round 4)
MIN_IN_FEATURES = 256
MIN_OUT_FEATURES = 128
MIN_KERNEL_TAPS = 9

# Static (calibrated) mode extends eligibility to convs that LOSE under
# dynamic quantization (the per-tensor max-abs reduction costs more than
# int8 saves on them — round-4 probe: 1x1 0.67x, 128-ch 3x3 0.91x) but win
# once the scale is a calibrated constant and the quantize pass is pure
# elementwise (tools/int8_conv_probe.py `s8+st` column: 128-ch 3x3 flips
# to 1.14x). Floor A/B'd end-to-end on v5e (FCOS R-50 B=32 800x1344,
# round 5): floor 128 = 312.9 img/s vs floor 256 = 306.5 vs dynamic 282.0
# vs fp 255.7 — so 128 is the default. The env knobs exist for on-chip
# floor A/Bs (re-run tools/int8_calibrate.py with the same override so the
# scales JSON covers the widened set); res2's 64-ch convs stay fp
# (unmeasured, and the dynamic probe trend says they lose).
STATIC_MIN_IN_FEATURES = int(os.environ.get(
    "SLENDER_INT8_STATIC_MIN_IN", 128))
STATIC_MIN_OUT_FEATURES = int(os.environ.get(
    "SLENDER_INT8_STATIC_MIN_OUT", 128))

# Active static scales: {"path/to/conv": float_amax}. Two layers:
#   - `static_scales_scope(...)` — per-call override (tests, probes);
#   - `set_default_scales(...)` — process default, set by build_model from
#     cfg.TPU.INT8_SCALES (so every predict harness picks it up).
# _UNSET in the scope slot means "fall through to the default";
# static_scales_scope(None) explicitly disables static scales.
_UNSET = object()
_STATIC_SCALES: Any = _UNSET
_DEFAULT_SCALES: Optional[Dict[str, float]] = None

# Active calibration sink: {"path/to/conv": running_amax}. When set (via
# `calibration_scope`), eligible convs run in FULL precision and record the
# max-abs of their input activation. Requires EAGER execution (the recorded
# values are pulled to host floats) — run predict un-jitted to calibrate.
_CALIB_SINK: Optional[Dict[str, float]] = None


def module_path(mod: nn.Module) -> str:
    return "/".join(mod.path)


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
    """Dynamic-quantize eligibility (the measured round-4 winners)."""
    if type(mod) is not nn.Conv or x.ndim != 4:
        return False
    ks = _pair(mod.kernel_size)
    if ks[0] * ks[1] < MIN_KERNEL_TAPS:
        return False
    if x.shape[-1] < MIN_IN_FEATURES or mod.features < MIN_OUT_FEATURES:
        return False
    return _conv_is_plain(mod)


def static_eligible(mod: Any, x: jnp.ndarray) -> bool:
    """Static-scale eligibility: any plain conv wide enough on both ends
    (1x1s included — they win once the scale is a constant)."""
    if type(mod) is not nn.Conv or x.ndim != 4:
        return False
    if (x.shape[-1] < STATIC_MIN_IN_FEATURES
            or mod.features < STATIC_MIN_OUT_FEATURES):
        return False
    return _conv_is_plain(mod)


def int8_conv_call(mod: nn.Conv, x: jnp.ndarray,
                   act_scale: Optional[float] = None) -> jnp.ndarray:
    """Quantized replacement for an eligible bound nn.Conv's __call__.

    act_scale None -> per-tensor dynamic max-abs (calibration-free);
    act_scale set  -> static calibrated scalar (elementwise quantize, no
    cross-tensor reduction; values clip at the calibrated range).
    """
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
    if act_scale is None:
        xq, xs = dynamic_quantize(x)
    else:
        xs = jnp.float32(max(act_scale, 1e-12) / 127.0)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                      -127, 127).astype(jnp.int8)
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


def _active_scales() -> Optional[Dict[str, float]]:
    return _DEFAULT_SCALES if _STATIC_SCALES is _UNSET else _STATIC_SCALES


def set_default_scales(scales: Optional[Dict[str, float]]) -> None:
    """Process-wide default static scales (build_model wires this from
    cfg.TPU.INT8_SCALES); `static_scales_scope` overrides per call."""
    global _DEFAULT_SCALES
    _DEFAULT_SCALES = dict(scales) if scales else None


def load_json_scales(path: str) -> Dict[str, float]:
    import json

    with open(path) as f:
        return {str(k): float(v) for k, v in json.load(f).items()}


def _interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if (context.method_name == "__call__" and args
            and isinstance(args[0], jnp.ndarray)):
        x = args[0]
        scales = _active_scales()
        if scales is not None and static_eligible(mod, x):
            amax = scales.get(module_path(mod))
            if amax is not None:
                return int8_conv_call(mod, x, act_scale=amax)
        if eligible(mod, x):
            return int8_conv_call(mod, x)
    return next_fn(*args, **kwargs)


def _calib_interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if (context.method_name == "__call__" and args
            and isinstance(args[0], jnp.ndarray) and _CALIB_SINK is not None
            and static_eligible(mod, args[0])):
        key = module_path(mod)
        amax = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
        _CALIB_SINK[key] = max(_CALIB_SINK.get(key, 0.0), amax)
    return next_fn(*args, **kwargs)


def int8_predict_scope(enabled: bool):
    """`with int8_predict_scope(cfg.TPU.INT8_PREDICT): module.apply(...)`.

    Dynamic-quantizes the measured-winner convs; additionally uses static
    calibrated scales for any conv present in the surrounding
    `static_scales_scope` (which widens eligibility to 1x1s)."""
    if not enabled:
        return nullcontext()
    return nn.intercept_methods(_interceptor)


@contextmanager
def static_scales_scope(scales: Optional[Dict[str, float]]):
    """Provide calibrated per-conv activation max-abs values
    ({module path: amax}) to any `int8_predict_scope` opened inside,
    overriding the process default; None explicitly disables static
    scales. The dict comes from `calibration_scope` /
    tools/int8_calibrate.py."""
    global _STATIC_SCALES
    prev = _STATIC_SCALES
    _STATIC_SCALES = dict(scales) if scales else None
    try:
        yield
    finally:
        _STATIC_SCALES = prev


def traced_calibration(fn):
    """Wrap a predict-like callable so it ALSO returns {path: amax} for
    every static-eligible conv — jit-compatible (the amax values are traced
    scalars computed in-graph, one device execution per batch):

        out, amaxes = jax.jit(traced_calibration(det.predict))(vars, batch)
        scales = {k: float(v) for k, v in amaxes.items()}

    Accumulate `max` over batches on the host. Unlike `calibration_scope`
    (eager, host-float sink) this costs one extra reduction per conv but
    runs at full jit speed."""

    def wrapped(*args, **kwargs):
        records: Dict[str, Any] = {}

        def icpt(next_fn, a, k, context):
            mod = context.module
            if (context.method_name == "__call__" and a
                    and isinstance(a[0], jnp.ndarray)
                    and static_eligible(mod, a[0])):
                key = module_path(mod)
                amax = jnp.max(jnp.abs(a[0].astype(jnp.float32)))
                records[key] = (jnp.maximum(records[key], amax)
                                if key in records else amax)
            return next_fn(*a, **k)

        with nn.intercept_methods(icpt):
            out = fn(*args, **kwargs)
        return out, records

    return wrapped


@contextmanager
def calibration_scope(sink: Dict[str, float]):
    """Record per-conv input max-abs into `sink` while running the model in
    FULL precision. Must run EAGERLY (not under jit): the maxima are pulled
    to host floats. Accumulates the running max across calls, so loop over
    calibration batches inside one scope (or reuse the same sink)."""
    global _CALIB_SINK
    prev = _CALIB_SINK
    _CALIB_SINK = sink
    try:
        with nn.intercept_methods(_calib_interceptor):
            yield
    finally:
        _CALIB_SINK = prev
