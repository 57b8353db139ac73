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
