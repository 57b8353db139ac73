import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.structures.borders import (
    BorderMasks,
    offset_convex_polygon,
    radial_fraction,
)


def square_poly(x0, y0, w, h):
    return [np.array([x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h],
                     np.float64)]


def test_offset_square():
    hull = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    out = offset_convex_polygon(hull, 2.0)
    assert out[:, 0].min() == pytest.approx(-2.0, abs=1e-6)
    assert out[:, 0].max() == pytest.approx(12.0, abs=1e-6)


def test_radial_fraction_square():
    hull = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    xs = np.array([5.0, 10.0, 7.5, 20.0])
    ys = np.array([5.0, 5.0, 5.0, 5.0])
    t = radial_fraction(hull, xs, ys)
    np.testing.assert_allclose(t, [0.0, 1.0, 0.5, 3.0], atol=1e-6)


def test_center_mask_peak_at_center():
    masks = BorderMasks([square_poly(10, 10, 20, 20)])
    cm = masks.center_masks((50, 50), standard="gaussian", sigma=0.5)
    assert cm.shape == (50, 50)
    assert cm[20, 20] == pytest.approx(1.0, abs=0.02)  # center
    assert cm[10, 20] < cm[20, 20]                     # border lower
    assert cm[45, 45] == 0.0                            # far outside
    # linear variant
    cl = masks.center_masks((50, 50), standard="linear")
    assert cl[20, 20] == pytest.approx(1.0, abs=0.05)
    # the original border sits inside the 10%-dilated hull, so its linear
    # score is small but nonzero (~= dilation fraction)
    assert cl[20, 10] < 0.3


def test_border_masks_maps():
    masks = BorderMasks([square_poly(4, 4, 12, 8)])
    border, sizes = masks.border_masks((24, 24))
    # center pixel: border score ~0, sizes = (8, 12)
    assert border[8, 10] < 0.2
    np.testing.assert_allclose(sizes[8, 10], [8.0, 12.0])
    # outside: zero
    assert border[22, 22] == 0.0


def test_fcosv3_end_to_end():
    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "FCOSV3"
    cfg.NEED_MASKS = True
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))

    from test_model_fcos import make_batch

    batch = make_batch()
    # center mask covering only the middle region
    cm = np.zeros((1, 64, 64), np.float32)
    cm[:, 16:48, 16:48] = 1.0
    batch["center_mask"] = jnp.asarray(cm)
    total, metrics = det.loss(variables, batch)
    assert np.isfinite(float(total))

    # fewer positives than base FCOS (mask screens out off-center ones)
    cfg2 = make_tiny_cfg()
    cfg2.freeze()
    det2 = build_model(cfg2)
    base_total, base_metrics = det2.loss(variables, {
        k: v for k, v in batch.items() if k != "center_mask"
    })
    assert float(metrics["num_pos"]) <= float(base_metrics["num_pos"])
