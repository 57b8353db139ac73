import numpy as np
import jax
import jax.numpy as jnp

from slenderobjdet_tpu.ops.border_align import border_align
from slenderobjdet_tpu.ops.corner_pool import (
    bottom_pool,
    br_pool,
    left_pool,
    right_pool,
    tl_pool,
    top_pool,
)


def test_corner_pools_match_numpy(rng):
    x = rng.rand(2, 5, 6, 3).astype(np.float32)  # NHWC
    xj = jnp.asarray(x)

    # top: max over y' >= y
    want = np.maximum.accumulate(x[:, ::-1], axis=1)[:, ::-1]
    np.testing.assert_allclose(np.asarray(top_pool(xj)), want)

    want = np.maximum.accumulate(x, axis=1)
    np.testing.assert_allclose(np.asarray(bottom_pool(xj)), want)

    want = np.maximum.accumulate(x[:, :, ::-1], axis=2)[:, :, ::-1]
    np.testing.assert_allclose(np.asarray(left_pool(xj)), want)

    want = np.maximum.accumulate(x, axis=2)
    np.testing.assert_allclose(np.asarray(right_pool(xj)), want)


def test_corner_pool_gradient_is_argmax_scatter():
    x = jnp.asarray([[1.0, 3.0, 2.0]]).reshape(1, 3, 1, 1)
    # bottom_pool along H of [1,3,2] -> [1,3,3]; d(sum)/dx = [1,2,0]
    g = jax.grad(lambda v: bottom_pool(v).sum())(x).reshape(-1)
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 0.0])


def test_tl_br_pools(rng):
    a = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tl_pool(a, b)),
        np.asarray(top_pool(a)) + np.asarray(left_pool(b)),
    )
    np.testing.assert_allclose(
        np.asarray(br_pool(a, b)),
        np.asarray(bottom_pool(a)) + np.asarray(right_pool(b)),
    )


def test_border_align_known_values():
    # 4x4 feature, C=1 per border group; integer-grid samples are exact reads
    H, W, C = 4, 4, 1
    feat = np.zeros((H, W, 4), np.float32)
    base = np.arange(16, dtype=np.float32).reshape(4, 4)
    for g in range(4):
        feat[:, :, g] = base + 100 * g

    boxes = np.array([[0.0, 0.0, 3.0, 3.0]], np.float32)
    out = np.asarray(
        border_align(jnp.asarray(feat), jnp.asarray(boxes), pool_size=3)
    )[0]
    # left border x=0, y in 0..3 -> max of col 0 of group0 = 12
    assert out[0] == 12.0
    # top border y=0 -> max of row 0 of group1 = 103
    assert out[1] == 103.0
    # right border x=3 -> max col 3 group2 = 215
    assert out[2] == 215.0
    # bottom border y=3 -> max row 3 group3 = 315
    assert out[3] == 315.0
