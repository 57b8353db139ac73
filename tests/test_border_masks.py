import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.structures.borders import (
    BorderMasks,
    offset_convex_polygon,
    radial_fraction,
)

# full-tier: heavy oracle/convergence coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


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
    # box [4,4]-[16,12], center (10,8), dilate dist = sqrt(96)*0.1 ~ 0.98
    assert border[8, 10] < 0.2          # deep inside: low ramp, no band
    assert border[8, 4] == pytest.approx(1.0, abs=1e-5)   # on the border
    assert border[8, 16] == pytest.approx(1.0, abs=1e-5)
    assert border[22, 22] == 0.0        # far outside
    # size map: each fan triangle carries |edge midpoint - center| per axis;
    # probe a point clearly inside the top-edge triangle: (x=10, y=5)
    # midpoint (10,4), center (10,8) -> (0,4) (or the L2 tail value 4 if the
    # closing triangle) — y channel must be 4 either way
    assert sizes[5, 10, 1] == pytest.approx(4.0, abs=1e-5)
    # inside the right-edge triangle (x=14, y=8): midpoint (16,8) -> x ch 6
    assert sizes[8, 14, 0] == pytest.approx(6.0, abs=1e-5)
    assert sizes[22, 22].max() == 0.0


# ---------------------------------------------------------------------------
# golden-value parity against a direct transcription of the reference
# renderer (slender_det/structures/borders.py:90-192,291-390) — cv2-based,
# test-only oracle in the spirit of the reference's test_deformable_conv.
# pyclipper's rounded offset is replaced by the exact convex offset (the
# dilation only sets the crop window + band radius).
# ---------------------------------------------------------------------------
def _oracle_maps(hull, mask_size):
    import cv2

    H, W = mask_size
    o = hull.mean(0)
    area = cv2.contourArea(hull.astype(np.float32))
    dist = np.sqrt(area) * 0.1

    xs = np.broadcast_to(np.arange(W, dtype=np.float64)[None], (H, W))
    ys = np.broadcast_to(np.arange(H, dtype=np.float64)[:, None], (H, W))

    # draw_border_map: per-edge point-to-segment distance (compute_distance)
    k = hull.shape[0]
    dmap = np.full((k, H, W), np.inf)
    for i in range(k):
        p1, p2 = hull[i], hull[(i + 1) % k]
        sq1 = (xs - p1[0]) ** 2 + (ys - p1[1]) ** 2
        sq2 = (xs - p2[0]) ** 2 + (ys - p2[1]) ** 2
        sq = (p1[0] - p2[0]) ** 2 + (p1[1] - p2[1]) ** 2
        cosin = (sq - sq1 - sq2) / (2 * np.sqrt(sq1 * sq2) + 1e-12)
        sinsq = np.nan_to_num(1 - cosin ** 2)
        res = np.sqrt(sq1 * sq2 * np.clip(sinsq, 0, None) / sq)
        res[cosin < 0] = np.sqrt(np.fmin(sq1, sq2))[cosin < 0]
        dmap[i] = np.clip(res / dist, 0, 1)
    border = 1 - dmap.min(axis=0)

    # mask_in_triangle via affine-warped standard maps (the reference warp)
    def warp_fan(reverse):
        res = 512  # higher than the reference's 128 to cut quantization
        grid = (np.mgrid[0:res, 0:res] / res).astype(np.float32).sum(0)
        std = (grid < 1) * ((1 - grid) if reverse else grid)
        out = np.zeros((H, W), np.float32)
        px = hull[0]
        for i in list(range(1, k)) + [0]:
            py = hull[i]
            src = np.array([[0, 0], [0, res], [res, 0]], np.float32)
            dst = np.array([o, py, px], np.float32)
            M = cv2.getAffineTransform(src, dst)
            local = cv2.warpAffine(std, M, (W, H))
            out = np.maximum(out, np.clip(local, 0, 1))
            px = py
        return out

    border = np.maximum(border, warp_fan(reverse=False))
    center = warp_fan(reverse=True)

    # distance_in_triangle (fillPoly rasterization, exactly as upstream)
    size = np.zeros((H, W, 2), np.float32)
    px = hull[0]
    for idx, i in enumerate(list(range(1, k)) + [0]):
        py = hull[i]
        canvas = size.copy()
        if idx < k - 1:
            val = np.abs((px + py) / 2 - o)
        else:
            val = np.full(2, np.sqrt(np.square((px + py) / 2 - o).sum()))
        cv2.fillPoly(
            canvas,
            [(np.array([px, py, o]) + 0.5).astype(np.int32).reshape(-1, 1, 2)],
            val.tolist(),
        )
        size = np.maximum(size, canvas)
        px = py
    return border, center, size


@pytest.mark.parametrize("poly", [
    [[4.0, 4.0, 16.0, 4.0, 16.0, 12.0, 4.0, 12.0]],        # box
    [[6.0, 3.0, 20.0, 6.0, 17.0, 14.0, 5.0, 10.0]],        # quad
    [[10.0, 2.0, 22.0, 8.0, 18.0, 20.0, 8.0, 18.0, 4.0, 9.0]],  # pentagon
])
def test_masks_match_reference_oracle(poly):
    import cv2

    masks = BorderMasks([[np.asarray(p, np.float64) for p in poly]])
    H = W = 26
    border, center, size = masks.masks((H, W))

    pts = np.asarray(poly[0], np.float64).reshape(-1, 2)
    hull = cv2.convexHull(pts.astype(np.float32), clockwise=False)
    hull = hull.reshape(-1, 2).astype(np.float64)
    o_border, o_center, o_size = _oracle_maps(hull, (H, W))

    # rasterization differs at triangle/edge boundaries — compare away from
    # discontinuities: mean abs error small, plus strict interior probes
    for got, want, tol in ((border, o_border, 0.08), (center, o_center, 0.08)):
        err = np.abs(got - want)
        assert err.mean() < tol, err.mean()
        assert np.median(err) < 0.02
    # size map: identical off the (rasterized) triangle boundaries
    err = np.abs(size - o_size).max(-1)
    assert (err < 1e-3).mean() > 0.9, err.mean()


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
