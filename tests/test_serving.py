"""Serving artifact (slenderobjdet_tpu/serving.py): export -> reload ->
bit-identical predict, loadable without model code."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from slenderobjdet_tpu.serving import export_detector, load_detector


def _batch(B, H, W, seed=0):
    r = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(r.randint(0, 255, (B, H, W, 3)), jnp.uint8),
        "scale": jnp.full((B,), 1.0, jnp.float32),
        "orig_size": jnp.asarray([[H, W]] * B, jnp.float32),
    }


def test_export_roundtrip(tiny_fcos, tmp_path):
    det, variables = tiny_fcos
    B, H, W = 2, 64, 64
    path = export_detector(det, variables, str(tmp_path / "art"),
                           batch_size=B, image_hw=(H, W),
                           platforms=["cpu"])
    predict_fn = load_detector(path)
    batch = _batch(B, H, W)
    out = predict_fn(batch)
    ref = jax.jit(det.predict)(variables, batch)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]))
    # the loader must not need the model/config stack: it reads only the
    # three artifact files
    import os
    assert sorted(os.listdir(path)) == [
        "meta.json", "model.stablehlo", "params.msgpack"]


@pytest.mark.slow  # 26s quantize+rt; roundtrip stays in smoke
def test_export_quantized_int8(tiny_fcos, tmp_path):
    """Weight-only int8 artifact: ~4x smaller weights, outputs within
    quantization tolerance of the fp32 artifact."""
    import os

    from slenderobjdet_tpu.serving import quantize_variables

    det, variables = tiny_fcos
    B, H, W = 1, 64, 64
    fp = export_detector(det, variables, str(tmp_path / "fp"),
                         batch_size=B, image_hw=(H, W), platforms=["cpu"])
    q = export_detector(det, variables, str(tmp_path / "q"),
                        batch_size=B, image_hw=(H, W), platforms=["cpu"],
                        quantize=True)
    size_fp = os.path.getsize(os.path.join(fp, "params.msgpack"))
    size_q = os.path.getsize(os.path.join(q, "params.msgpack"))
    assert size_q < 0.5 * size_fp, (size_q, size_fp)

    batch = _batch(B, H, W)
    out_fp = load_detector(fp)(batch)
    out_q = load_detector(q)(batch)
    assert np.abs(np.asarray(out_q["scores"], np.float32)
                  - np.asarray(out_fp["scores"], np.float32)).max() < 0.05
    import json
    meta = json.load(open(os.path.join(q, "meta.json")))
    assert meta["quantize"] == "int8-weight-only"


@pytest.mark.slow  # second export compile
def test_export_int8_compute_static_scales_baked(tiny_fcos, tmp_path):
    """`export_serving --int8 --int8-scales`: the static-calibrated int8
    COMPUTE path (cfg.TPU.INT8_SCALES, ops/quant.py) bakes into the
    exported StableHLO — the reloaded artifact matches the in-process
    int8 predict exactly, with no quant state needed at load time."""
    from conftest import make_tiny_cfg

    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.ops import quant

    _, variables = tiny_fcos
    B, H, W = 1, 64, 64
    batch = _batch(B, H, W)

    # at random init the focal-prior cls bias puts every score under the
    # default 0.05 pre-NMS threshold (all-zero outputs would compare equal
    # vacuously) — zero it so real candidate scores flow through
    cfg_fp = make_tiny_cfg()
    cfg_fp.MODEL.FCOS.INFERENCE_TH = 0.0
    cfg_fp.freeze()
    det_fp = build_model(cfg_fp)

    # calibrate the fp model (traced, one jitted call)
    _, amaxes = jax.jit(quant.traced_calibration(det_fp.predict))(
        variables, batch)
    scales = {k: float(v) for k, v in amaxes.items()}
    assert scales, "tiny FCOS should have static-eligible convs"

    cfg = make_tiny_cfg()
    cfg.MODEL.FCOS.INFERENCE_TH = 0.0
    cfg.TPU.INT8_PREDICT = True
    cfg.freeze()
    det_q = build_model(cfg)
    quant.set_default_scales(scales)
    try:
        path = export_detector(det_q, variables, str(tmp_path / "q8"),
                               batch_size=B, image_hw=(H, W),
                               platforms=["cpu"])
        ref = jax.jit(det_q.predict)(variables, batch)
    finally:
        quant.set_default_scales(None)

    # loaded artifact runs the baked static-int8 program; the process-level
    # scales are gone, so equality proves they were baked in
    out = load_detector(path)(batch)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]))
    # and it is a genuinely different program from the fp export
    out_fp = jax.jit(det_fp.predict)(variables, batch)
    assert not np.array_equal(np.asarray(out["scores"]),
                              np.asarray(out_fp["scores"]))


def test_quantize_roundtrip_error_bound():
    """Per-channel int8 quantization error is bounded by scale/2 per
    weight (symmetric rounding)."""
    from slenderobjdet_tpu.serving import (dequantize_variables,
                                           quantize_variables)

    rng = np.random.RandomState(0)
    tree = {"layer": {"kernel": rng.randn(3, 3, 8, 16).astype(np.float32),
                      "bias": rng.randn(16).astype(np.float32)}}
    qt = quantize_variables(tree)
    assert qt["layer"]["kernel"]["q"].dtype == np.int8
    assert qt["layer"]["bias"].dtype == np.float32  # untouched
    back = dequantize_variables(qt)
    w = tree["layer"]["kernel"]
    s = np.abs(w).max(axis=(0, 1, 2)) / 127.0
    err = np.abs(np.asarray(back["layer"]["kernel"]) - w)
    assert (err <= s / 2 + 1e-7).all()
