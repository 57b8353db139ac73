"""Dynamic int8 inference path (ops/quant.py, cfg.TPU.INT8_PREDICT).

No reference counterpart (the reference serves fp32 torch); this guards the
TPU-native serving feature: interceptor fidelity (params unchanged, only the
measured-win conv shapes taken over) and end-to-end closeness to fp."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_tiny_cfg


def _apply_conv(conv, x, quant):
    from slenderobjdet_tpu.ops.quant import int8_predict_scope

    v = conv.init(jax.random.PRNGKey(0), x)
    with int8_predict_scope(quant):
        return np.asarray(conv.apply(v, x)), v


def test_int8_conv_close_to_fp():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 14, 14, 256), jnp.float32)
    conv = nn.Conv(128, (3, 3), padding=1, param_dtype=jnp.float32)
    fp, _ = _apply_conv(conv, x, quant=False)
    q, _ = _apply_conv(conv, x, quant=True)
    # per-tensor act + per-channel weight int8: a few % relative error
    rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
    assert rel < 0.05, rel
    assert np.isfinite(q).all()


def test_ineligible_convs_untouched():
    """1x1, narrow, and predictor-sized convs must be bit-identical to fp
    (the interceptor leaves them alone — the probe measured them as losses)."""
    r = np.random.RandomState(1)
    cases = [
        (nn.Conv(256, (1, 1)), r.randn(2, 8, 8, 256)),     # 1x1
        (nn.Conv(128, (3, 3), padding=1), r.randn(2, 8, 8, 128)),  # narrow in
        (nn.Conv(80, (3, 3), padding=1), r.randn(2, 8, 8, 256)),   # predictor
    ]
    for conv, x in cases:
        x = jnp.asarray(x, jnp.float32)
        fp, _ = _apply_conv(conv, x, quant=False)
        q, _ = _apply_conv(conv, x, quant=True)
        np.testing.assert_array_equal(fp, q)


def test_init_tree_unchanged_under_scope():
    from slenderobjdet_tpu.ops.quant import int8_predict_scope

    conv = nn.Conv(256, (3, 3), padding=1, param_dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 256), jnp.float32)
    v_fp = conv.init(jax.random.PRNGKey(7), x)
    with int8_predict_scope(True):
        v_q = conv.init(jax.random.PRNGKey(7), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_fp, v_q)


def test_strided_eligible_conv_matches_fp_shape_and_value():
    """Stride-2 3x3 (the res4/res5 downsampling shape) through the quant
    path: correct output shape and close values."""
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(1, 16, 16, 256), jnp.float32)
    conv = nn.Conv(256, (3, 3), strides=(2, 2), padding=1,
                   param_dtype=jnp.float32, use_bias=False)
    fp, _ = _apply_conv(conv, x, quant=False)
    q, _ = _apply_conv(conv, x, quant=True)
    assert q.shape == fp.shape == (1, 8, 8, 256)
    rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
    assert rel < 0.05, rel


# ---------------------------------------------------------------- families
# Every meta-arch predict path is wired through int8_predict_scope (the
# reference serves each family through the same fp evaluator,
# /root/reference/slender_det/evaluation/evaluator.py:42-85; here each gets
# the same TPU s8 serving switch). This matrix guards two things per family:
# the scope plumbing (predict runs, outputs finite) and the eligibility
# floor (wide R-18 trunks MUST diverge bitwise from fp because res4/res5
# 3x3 convs are taken over; the narrow tiny hourglass has no eligible conv
# so CornerNet must stay bit-identical).


def _family_setup(arch):
    from test_model_fcos import make_batch

    from conftest import make_tiny_cfg

    batch = make_batch()
    if arch == "CornerNet":
        from slenderobjdet_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.MODEL.META_ARCHITECTURE = "CornerNet"
        cfg.MODEL.HOURGLASS.STACKS = 1
        cfg.MODEL.HOURGLASS.DEPTH_BLOCK = 3
        cfg.MODEL.HOURGLASS.CHANNELS_BLOCK = [64, 64, 96, 96]
        cfg.MODEL.HOURGLASS.NUM_CONV_BLOCK = [1, 1, 1, 2]
        cfg.MODEL.HOURGLASS.STEM_OUT_CHANNELS = 32
        cfg.MODEL.HOURGLASS.OUT_FEATURES = ["hourglass2"]
        cfg.MODEL.CORNER_NET.IN_FEATURES = ["hourglass2"]
        cfg.MODEL.CORNER_NET.NUM_CLASSES = 8
        cfg.TPU.COMPUTE_DTYPE = "float32"
        return cfg, batch
    if arch == "ProposalVisibleRCNN":
        from test_anchor_chain import _rcnn_cfg

        cfg = _rcnn_cfg(arch)
        cfg.defrost()
        return cfg, batch
    if arch.startswith("Ablation:"):
        from test_model_ablation import ablation_cfg

        cfg = ablation_cfg(arch.split(":")[1], "Empty")
        cfg.defrost()
        # random-init sigmoid scores sit near prior_prob ~0.01; keep some
        # detections alive so the fp-vs-s8 comparison is non-degenerate
        cfg.MODEL.META_ARCH.SCORE_THRESH_TEST = 0.0
        cfg.MODEL.META_ARCH.PRE_NMS_THRESH = 0.0
        return cfg, batch

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = arch
    if arch == "RotatedRetinaNet":
        from test_rotated_model import make_rotated_batch

        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
        cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0]]
        cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[-45, 0, 45]]
        batch = make_rotated_batch()
    elif arch == "FCOSAnchor":
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[64], [128], [256], [512], [1024]]
        cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    elif arch == "RetinaNet":
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
            [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)]
            for x in [32, 64, 128, 256, 512]
        ]
    elif arch == "ProposalNetworkWithMasks":
        cfg.NEED_MASKS = True
    return cfg, batch


def _first_output(out):
    for key in ("scores", "proposals", "boxes"):
        if key in out:
            return key, np.asarray(out[key], np.float32)
    raise AssertionError(f"no comparable output in {sorted(out)}")


@pytest.mark.slow
@pytest.mark.parametrize("arch", [
    "RetinaNet",
    "RepPointsDetector",
    "RepPointsCenterness",
    "FCOSAnchor",
    "RotatedRetinaNet",
    "ProposalVisibleRCNN",
    "ProposalNetworkWithMasks",
    "CornerNet",
    "Ablation:LRTBHead",
    "Ablation:PointSetHead",
    "Ablation:AnchorHead",
])
def test_family_int8_predict(arch):
    from slenderobjdet_tpu.models import build_model

    cfg, batch = _family_setup(arch)
    cfg.TPU.INT8_PREDICT = True
    cfg.freeze()
    det_q = build_model(cfg)
    variables = det_q.init_variables(jax.random.PRNGKey(0))
    out_q = det_q.predict(variables, batch)
    for k, v in out_q.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), (arch, k)

    cfg_fp = cfg.clone()
    cfg_fp.defrost()
    cfg_fp.TPU.INT8_PREDICT = False
    cfg_fp.freeze()
    out_fp = build_model(cfg_fp).predict(variables, batch)
    key, q = _first_output(out_q)
    fp = np.asarray(out_fp[key], np.float32)
    assert q.shape == fp.shape, (arch, key)
    if arch == "CornerNet":
        # tiny hourglass: every conv is below the 256-in-channel floor ->
        # the interceptor must leave the whole model alone
        np.testing.assert_array_equal(q, fp)
    else:
        # R-18 trunk: res4/res5 3x3 convs are eligible -> the s8 path ran
        assert not np.array_equal(q, fp), (arch, key)


@pytest.mark.slow
def test_fcos_int8_predict_close_to_fp():
    """End to end: tiny FCOS head outputs under TPU.INT8_PREDICT stay close
    to fp, and predict returns finite fixed-shape detections."""
    from slenderobjdet_tpu.models import build_model

    cfg = make_tiny_cfg()
    cfg.TPU.INT8_PREDICT = True
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0), (64, 64),
                                   batch_size=1)

    r = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(r.randint(0, 255, (1, 64, 64, 3)), jnp.uint8),
        "scale": jnp.ones((1,), jnp.float32),
        "orig_size": jnp.asarray([[64, 64]], jnp.float32),
    }
    out = det.predict(variables, batch)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    assert np.isfinite(np.asarray(out["scores"])).all()

    # head-output closeness vs the fp path on the same variables
    from slenderobjdet_tpu.ops.quant import int8_predict_scope

    images = batch["image"]
    with int8_predict_scope(True):
        q_logits, q_reg, _ = det.module.apply(variables, images, train=False)
    fp_logits, fp_reg, _ = det.module.apply(variables, images, train=False)
    for ql, fl in zip(q_logits, fp_logits):
        ql, fl = np.asarray(ql, np.float32), np.asarray(fl, np.float32)
        assert np.abs(ql - fl).max() < 0.15, np.abs(ql - fl).max()
    for qr, fr in zip(q_reg, fp_reg):
        qr, fr = np.asarray(qr, np.float32), np.asarray(fr, np.float32)
        denom = max(1.0, np.abs(fr).max())
        assert np.abs(qr - fr).max() / denom < 0.1


# ---------------------------------------------------------------------------
# Static (calibrated) scales: round-5 extension. Calibration records each
# eligible conv's input max-abs eagerly; with the scales present, the
# quantize pass uses a constant scalar scale (no per-tensor max reduction),
# which extends int8 to the 1x1 convs the dynamic path leaves in fp
# (tools/int8_conv_probe.py `s8+st` column).
# ---------------------------------------------------------------------------


class _TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(256, (3, 3), padding=1, name="wide3x3",
                    param_dtype=jnp.float32)(x)
        x = nn.Conv(256, (1, 1), name="squeeze1x1",
                    param_dtype=jnp.float32)(x)
        return x


def test_calibration_records_eligible_sites():
    from slenderobjdet_tpu.ops.quant import calibration_scope

    m = _TwoConv()
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(1, 8, 8, 256), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    sink = {}
    with calibration_scope(sink):
        out_cal = m.apply(v, x)
        m.apply(v, 2.0 * x)  # running max accumulates across calls
    assert set(sink) == {"wide3x3", "squeeze1x1"}, sink
    # calibration itself must not perturb the fp forward
    np.testing.assert_array_equal(np.asarray(out_cal), np.asarray(m.apply(v, x)))
    assert sink["wide3x3"] == pytest.approx(
        float(jnp.max(jnp.abs(2.0 * x))), rel=1e-6)


def test_static_scales_quantize_1x1_and_stay_close():
    from slenderobjdet_tpu.ops.quant import (
        calibration_scope,
        int8_predict_scope,
        static_scales_scope,
    )

    m = _TwoConv()
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(2, 8, 8, 256), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x)
    fp = np.asarray(m.apply(v, x))

    sink = {}
    with calibration_scope(sink):
        m.apply(v, x)

    # dynamic-only: 1x1 untouched -> removing the 3x3's input dependence
    # is impossible here, so instead check static != dynamic outputs
    with int8_predict_scope(True):
        dyn = np.asarray(m.apply(v, x))
    with static_scales_scope(sink), int8_predict_scope(True):
        st = np.asarray(m.apply(v, x))

    # both close to fp; static engages the extra 1x1 so differs from dynamic
    for q in (dyn, st):
        rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
        assert rel < 0.08, rel
    assert not np.array_equal(st, dyn)

    # scales missing the 1x1 -> the 1x1 stays fp: quantizing only the 3x3
    # statically must match dynamic-3x3-only more closely than full static
    part = {k: v_ for k, v_ in sink.items() if k == "wide3x3"}
    with static_scales_scope(part), int8_predict_scope(True):
        st_part = np.asarray(m.apply(v, x))
    assert not np.array_equal(st_part, st)


def test_default_scales_and_explicit_override():
    from slenderobjdet_tpu.ops import quant

    m = _TwoConv()
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(1, 8, 8, 256), jnp.float32)
    v = m.init(jax.random.PRNGKey(2), x)

    sink = {}
    with quant.calibration_scope(sink):
        m.apply(v, x)
    with quant.int8_predict_scope(True):
        dyn = np.asarray(m.apply(v, x))

    quant.set_default_scales(sink)
    try:
        with quant.int8_predict_scope(True):
            st_default = np.asarray(m.apply(v, x))
        # explicit None override disables static -> back to dynamic
        with quant.static_scales_scope(None), quant.int8_predict_scope(True):
            dyn2 = np.asarray(m.apply(v, x))
    finally:
        quant.set_default_scales(None)

    assert not np.array_equal(st_default, dyn)
    np.testing.assert_array_equal(dyn2, dyn)


def test_static_scale_clips_outliers_but_tracks_range():
    """An activation beyond the calibrated range clips (by design); within
    range the static path matches the dynamic path's accuracy."""
    from slenderobjdet_tpu.ops.quant import int8_predict_scope, static_scales_scope

    conv = nn.Conv(256, (3, 3), padding=1, param_dtype=jnp.float32)
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(1, 8, 8, 256), jnp.float32)
    v = conv.init(jax.random.PRNGKey(3), x)
    fp = np.asarray(conv.apply(v, x))

    amax = float(jnp.max(jnp.abs(x)))
    with static_scales_scope({"": amax}), int8_predict_scope(True):
        st = np.asarray(conv.apply(v, x))
    rel = np.linalg.norm(st - fp) / np.linalg.norm(fp)
    assert rel < 0.05, rel


def test_traced_calibration_matches_eager_sink():
    from slenderobjdet_tpu.ops.quant import calibration_scope, traced_calibration

    m = _TwoConv()
    r = np.random.RandomState(4)
    x = jnp.asarray(r.randn(1, 8, 8, 256), jnp.float32)
    v = m.init(jax.random.PRNGKey(4), x)

    sink = {}
    with calibration_scope(sink):
        out_eager = m.apply(v, x)

    out_jit, amaxes = jax.jit(traced_calibration(m.apply))(v, x)
    np.testing.assert_allclose(np.asarray(out_jit), np.asarray(out_eager),
                               rtol=1e-6)
    assert set(amaxes) == set(sink)
    for k in sink:
        assert float(amaxes[k]) == pytest.approx(sink[k], rel=1e-6)


@pytest.mark.slow  # R-50 build + one traced predict on CPU
def test_bench_scales_json_matches_flagship_sites():
    """The committed bench calibration JSON
    (configs/int8_scales/fcos_R_50_bench.json, used by bench.py's static
    int8 timing) must cover EXACTLY the flagship FCOS R-50's
    static-eligible conv sites — if module naming or the eligibility
    floors drift, bench would silently time a partially-quantized
    program. Conv-site keys depend only on channel widths, not image
    size, so a tiny spatial calibration reproduces the bench key set."""
    import json
    import os

    import jax

    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.ops.quant import traced_calibration

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "configs", "int8_scales",
                        "fcos_R_50_bench.json")
    committed = set(json.load(open(path)))

    import sys

    sys.path.insert(0, repo)
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    cfg.defrost()
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU has no bf16 units
    cfg.freeze()
    det = build_model(cfg)
    H = W = 64
    variables = det.init_variables(jax.random.PRNGKey(0), (H, W),
                                   batch_size=1)
    r = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(r.randint(0, 255, (1, H, W, 3)), jnp.uint8),
        "scale": jnp.full((1,), 1.0, jnp.float32),
        "orig_size": jnp.asarray([[H, W]], jnp.float32),
    }
    _, amaxes = jax.jit(traced_calibration(det.predict))(variables, batch)
    assert set(amaxes) == committed, (
        sorted(set(amaxes) ^ committed))
