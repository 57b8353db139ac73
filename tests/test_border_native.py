"""Native border-map renderer (structures/csrc/border_render.c) vs the
pure-numpy oracle in structures/borders.py — every map, random polygons."""

import numpy as np
import pytest

from slenderobjdet_tpu.structures import borders
from slenderobjdet_tpu.structures import native


def _random_polys(seed, n=6, canvas=(240, 320)):
    rng = np.random.RandomState(seed)
    H, W = canvas
    polys = []
    for _ in range(n):
        cx, cy = rng.rand() * (W - 80) + 40, rng.rand() * (H - 80) + 40
        m = rng.randint(4, 9)
        ang = np.sort(rng.rand(m) * 2 * np.pi)
        r = rng.rand(m) * 35 + 6
        xs, ys = cx + r * np.cos(ang), cy + r * np.sin(ang)
        polys.append([np.stack([xs, ys], 1).reshape(-1).astype(np.float64)])
    return polys


@pytest.fixture(autouse=True)
def _require_native():
    if not native.available():
        pytest.skip("no C compiler for the native renderer")


def _both(fn):
    old = borders.USE_NATIVE
    try:
        borders.USE_NATIVE = True
        a = fn()
        borders.USE_NATIVE = False
        b = fn()
    finally:
        borders.USE_NATIVE = old
    return a, b


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_masks_native_matches_numpy(seed):
    m = borders.BorderMasks(_random_polys(seed))
    (nb, nc, ns), (pb, pc, ps) = _both(lambda: m.masks((240, 320)))
    np.testing.assert_allclose(nb, pb, atol=1e-5)
    np.testing.assert_allclose(nc, pc, atol=1e-5)
    np.testing.assert_allclose(ns, ps, atol=1e-3)
    assert pb.max() > 0.9  # maps are non-trivial


@pytest.mark.parametrize("standard,sigma", [("gaussian", 0.5),
                                            ("linear", 0.5),
                                            ("gaussian", 1.5)])
def test_center_masks_native_matches_numpy(standard, sigma):
    m = borders.BorderMasks(_random_polys(3))
    nat, ref = _both(
        lambda: m.center_masks((240, 320), standard=standard, sigma=sigma))
    np.testing.assert_allclose(nat, ref, atol=1e-5)
    assert ref.max() > 0.9


def test_degenerate_window_and_clip():
    """Polygons clipped by the canvas edge: window clipping must agree."""
    polys = [[np.array([-30.0, -20.0, 60.0, -10.0, 50.0, 70.0, -25.0, 55.0])],
             [np.array([300.0, 220.0, 340.0, 230.0, 335.0, 260.0])]]
    m = borders.BorderMasks(polys)
    (nb, nc, ns), (pb, pc, ps) = _both(lambda: m.masks((240, 320)))
    np.testing.assert_allclose(nb, pb, atol=1e-5)
    np.testing.assert_allclose(nc, pc, atol=1e-5)
    np.testing.assert_allclose(ns, ps, atol=1e-3)
