"""ops/level_pack: the packed shared-head execution strategy must be
output-equal to the per-level path (it is the SAME math — 3x3/pad-1 convs
whose padding zeros are supplied by the 1-px inter-level gaps)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from slenderobjdet_tpu.ops.level_pack import (
    map_regions, pack_levels, plan_level_packing, unpack_levels)

# TPU.PACK_HEAD_LEVELS is default-off (measured on-chip loss, VALIDATION
# round-3); its parity record runs in the full tier only.
pytestmark = pytest.mark.slow

SHAPES = [(32, 48), (16, 24), (8, 12), (4, 6), (2, 3)]


def _feats(key, shapes=SHAPES, c=16, b=2):
    ks = jax.random.split(key, len(shapes))
    return [jax.random.normal(k, (b, h, w, c), jnp.float32)
            for k, (h, w) in zip(ks, shapes)]


def test_plan_is_disjoint_and_gapped():
    (H, W), offsets = plan_level_packing(SHAPES, gap=1)
    cover = np.zeros((H, W), np.int32)
    for (h, w), (y, x) in zip(SHAPES, offsets):
        assert y + h <= H and x + w <= W
        # including the 1-px halo, regions must not touch each other
        y0, x0 = max(y - 1, 0), max(x - 1, 0)
        cover[y0:y + h + 1, x0:x + w + 1] += 0  # bounds check only
        cover[y:y + h, x:x + w] += 1
    assert cover.max() == 1
    for (ha, wa), (ya, xa) in zip(SHAPES, offsets):
        for (hb, wb), (yb, xb) in zip(SHAPES, offsets):
            if (ya, xa) == (yb, xb):
                continue
            # expanded-by-gap rectangles must stay disjoint
            assert (ya >= yb + hb + 1 or yb >= ya + ha + 1
                    or xa >= xb + wb + 1 or xb >= xa + wa + 1)


def test_pack_unpack_roundtrip():
    feats = _feats(jax.random.PRNGKey(0))
    plan = plan_level_packing(SHAPES)
    canvas = pack_levels(feats, plan)
    # gaps are zero
    total = sum(float(jnp.sum(jnp.abs(f))) for f in feats)
    assert np.isclose(float(jnp.sum(jnp.abs(canvas))), total, rtol=1e-6)
    back = unpack_levels(canvas, SHAPES, plan)
    for f, g in zip(feats, back):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(g))


def test_map_regions_rezeroes_gaps():
    feats = _feats(jax.random.PRNGKey(1))
    plan = plan_level_packing(SHAPES)
    canvas = pack_levels(feats, plan) + 100.0  # pollute the gaps
    out = map_regions(canvas, SHAPES, plan, lambda i, r: r * 0 + (i + 1))
    back = unpack_levels(out, SHAPES, plan)
    for i, g in enumerate(back):
        np.testing.assert_array_equal(np.asarray(g), i + 1)
    # everything outside the regions is zero again
    region_px = sum(h * w for h, w in SHAPES)
    expect = sum((i + 1) * h * w for i, (h, w) in enumerate(SHAPES))
    assert float(jnp.sum(out[0, :, :, 0])) == expect
    del region_px


def test_fcos_head_packed_equals_per_level():
    from slenderobjdet_tpu.models.meta_arch.fcos import FCOSHead

    feats = _feats(jax.random.PRNGKey(2), c=32)
    kw = dict(num_classes=7, num_convs=2, strides=(8, 16, 32, 64, 128))
    ref = FCOSHead(pack_levels=False, dtype=jnp.float32, **kw)
    packed = FCOSHead(pack_levels=True, dtype=jnp.float32, **kw)
    variables = ref.init(jax.random.PRNGKey(0), feats)
    # identical parameter tree: packing is an execution strategy, not an
    # architecture change — checkpoints interchange
    v2 = packed.init(jax.random.PRNGKey(0), feats)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    lo0, re0, ct0 = ref.apply(variables, feats)
    lo1, re1, ct1 = packed.apply(variables, feats)
    for a, b in zip(lo0 + re0 + ct0, lo1 + re1 + ct1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_retinanet_head_packed_equals_per_level():
    from slenderobjdet_tpu.models.meta_arch.retinanet import RetinaNetHead

    feats = _feats(jax.random.PRNGKey(3), c=16)
    kw = dict(num_classes=7, num_anchors=9, num_convs=2)
    ref = RetinaNetHead(pack_levels=False, dtype=jnp.float32, **kw)
    packed = RetinaNetHead(pack_levels=True, dtype=jnp.float32, **kw)
    variables = ref.init(jax.random.PRNGKey(0), feats)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(packed.init(jax.random.PRNGKey(0),
                                                 feats))
    lo0, re0 = ref.apply(variables, feats)
    lo1, re1 = packed.apply(variables, feats)
    for a, b in zip(lo0 + re0, lo1 + re1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fcos_packed_grads_match():
    """Training uses the same head; gradients through the packed path must
    match the per-level path (remat-style rounding tolerance)."""
    from slenderobjdet_tpu.models.meta_arch.fcos import FCOSHead

    feats = _feats(jax.random.PRNGKey(4), c=32)
    kw = dict(num_classes=3, num_convs=1, strides=(8, 16, 32, 64, 128))

    def loss(params, pack):
        head = FCOSHead(pack_levels=pack, dtype=jnp.float32, **kw)
        lo, re, ct = head.apply({"params": params}, feats, train=True)
        return (sum(jnp.sum(jnp.square(x)) for x in lo)
                + sum(jnp.sum(jnp.square(x)) for x in re)
                + sum(jnp.sum(jnp.square(x)) for x in ct))

    head = FCOSHead(pack_levels=False, dtype=jnp.float32, **kw)
    params = head.init(jax.random.PRNGKey(0), feats)["params"]
    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
