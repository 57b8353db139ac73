import jax
import numpy as np
import jax.numpy as jnp

from slenderobjdet_tpu.ops.roi_align import (
    assign_fpn_levels,
    multilevel_roi_align,
    roi_align,
)


def oracle_roi_align(feat, roi, scale, P, S):
    """Literal loop implementation of aligned RoIAlign for one roi."""
    H, W, C = feat.shape
    x1, y1, x2, y2 = [v * scale - 0.5 for v in roi]
    bh, bw = (y2 - y1) / P, (x2 - x1) / P
    out = np.zeros((P, P, C), np.float64)

    def bilinear(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        ly, lx = y - y0, x - x0
        y0c, x0c = np.clip(y0, 0, H - 1), np.clip(x0, 0, W - 1)
        y1c, x1c = np.clip(y0 + 1, 0, H - 1), np.clip(x0 + 1, 0, W - 1)
        return (
            feat[y0c, x0c] * (1 - ly) * (1 - lx)
            + feat[y0c, x1c] * (1 - ly) * lx
            + feat[y1c, x0c] * ly * (1 - lx)
            + feat[y1c, x1c] * ly * lx
        )

    for py in range(P):
        for px in range(P):
            acc = np.zeros(C, np.float64)
            for sy in range(S):
                for sx in range(S):
                    y = y1 + (py + (sy + 0.5) / S) * bh
                    x = x1 + (px + (sx + 0.5) / S) * bw
                    acc += bilinear(y, x)
            out[py, px] = acc / (S * S)
    return out


def test_roi_align_matches_oracle(rng):
    feat = rng.rand(16, 20, 3).astype(np.float32)
    rois = np.array(
        [[8.0, 4.0, 56.0, 40.0], [0.0, 0.0, 80.0, 64.0], [10.0, 10.0, 30.0, 22.0]],
        np.float32,
    )
    scale, P, S = 0.25, 7, 2
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), scale, P, S))
    for i, roi in enumerate(rois):
        want = oracle_roi_align(feat, roi, scale, P, S)
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_level_assignment():
    rois = np.array(
        [
            [0, 0, 56, 56],      # sqrt(area)=56 -> lvl 2 (4+log2(56/224)=2)
            [0, 0, 224, 224],    # -> lvl 4
            [0, 0, 448, 448],    # -> lvl 5
            [0, 0, 1000, 1000],  # clamps to 5
        ],
        np.float32,
    )
    lv = np.asarray(assign_fpn_levels(jnp.asarray(rois), 2, 5))
    np.testing.assert_array_equal(lv, [2, 4, 5, 5])


def test_multilevel_selects_right_level(rng):
    # constant-valued features per level let us see which level was pooled
    feats = [jnp.full((64 // s, 64 // s, 2), float(i + 1))
             for i, s in enumerate([4, 8, 16, 32])]
    rois = jnp.asarray([[0, 0, 56, 56], [0, 0, 14, 14]], jnp.float32)
    out = np.asarray(
        multilevel_roi_align(feats, [4, 8, 16, 32], rois, output_size=2)
    )
    assert np.allclose(out[0], 1.0)  # lvl2 -> first feature
    assert np.allclose(out[1], 1.0)  # tiny box clamps to min level


def test_custom_vjp_matches_scatter_autodiff(rng):
    """The matmul-adjoint backward must equal XLA's scatter-add transpose of
    the plain gather implementation (exact in fp32)."""
    import jax
    import jax.numpy as jnp

    from slenderobjdet_tpu.ops.roi_align import _roi_align_impl, roi_align

    H, W, C, N = 24, 20, 8, 6
    feat = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    rois = jnp.asarray(
        np.stack([
            rng.rand(N) * 30, rng.rand(N) * 30,
            rng.rand(N) * 40 + 35, rng.rand(N) * 40 + 35,
        ], 1).astype(np.float32)
    )
    g = jnp.asarray(rng.rand(N, 7, 7, C).astype(np.float32))

    def loss_custom(f):
        return jnp.sum(roi_align(f, rois, 0.5, 7, 2) * g)

    def loss_plain(f):
        return jnp.sum(_roi_align_impl(f, rois, 0.5, 7, 2) * g)

    gf_custom = jax.grad(loss_custom)(feat)
    gf_plain = jax.grad(loss_plain)(feat)
    np.testing.assert_allclose(np.asarray(gf_custom), np.asarray(gf_plain),
                               rtol=1e-4, atol=1e-5)
    # forward unchanged
    np.testing.assert_allclose(
        np.asarray(roi_align(feat, rois, 0.5, 7, 2)),
        np.asarray(_roi_align_impl(feat, rois, 0.5, 7, 2)),
        rtol=1e-6,
    )


def test_custom_vjp_chunked_path(rng):
    """Gradient flows through the lax.map chunked path too."""
    import jax
    import jax.numpy as jnp

    from slenderobjdet_tpu.ops.roi_align import roi_align

    H, W, C, N = 16, 16, 4, 9
    feat = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    rois = jnp.asarray(
        np.stack([
            rng.rand(N) * 10, rng.rand(N) * 10,
            rng.rand(N) * 10 + 12, rng.rand(N) * 10 + 12,
        ], 1).astype(np.float32)
    )
    gf = jax.grad(
        lambda f: jnp.sum(roi_align(f, rois, 1.0, 7, 2, roi_chunk=4) ** 2)
    )(feat)
    gf_ref = jax.grad(
        lambda f: jnp.sum(roi_align(f, rois, 1.0, 7, 2, roi_chunk=100) ** 2)
    )(feat)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_matches_all_level_path(rng):
    """The single-gather flattened-level pooler (inference hot path) must
    match the pool-every-level-and-select path — same sample grid, same taps,
    same weights, just 1/4 the gathered bytes. The two compiled programs may
    reassociate the bin reduction differently, so equality is up to fp
    rounding (~1e-6 rel observed), not bitwise."""
    from slenderobjdet_tpu.ops.roi_align import multilevel_roi_align_fused

    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.rand(64 // s, 80 // s, 6).astype(np.float32))
             for s in strides]
    n = 37  # exercises the chunked lax.map path at roi_chunk=16
    x1 = rng.rand(n) * 100
    y1 = rng.rand(n) * 80
    w = rng.rand(n) * 500 + 4   # spans all pyramid levels incl. clamping
    h = rng.rand(n) * 500 + 4
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32))

    want = np.asarray(multilevel_roi_align(feats, strides, rois, output_size=7))
    got = np.asarray(multilevel_roi_align_fused(
        feats, strides, rois, output_size=7, roi_chunk=16))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # bf16 features (the production dtype) agree too (taps are bf16 exactly
    # widened to fp32 in both paths; only reduction order differs)
    feats16 = [f.astype(jnp.bfloat16) for f in feats]
    want16 = np.asarray(
        multilevel_roi_align(feats16, strides, rois, output_size=7))
    got16 = np.asarray(multilevel_roi_align_fused(
        feats16, strides, rois, output_size=7, roi_chunk=16))
    np.testing.assert_allclose(got16, want16, rtol=1e-5, atol=1e-6)

    # unchunked path (n <= roi_chunk)
    got1 = np.asarray(multilevel_roi_align_fused(
        feats, strides, rois, output_size=7, roi_chunk=64))
    np.testing.assert_allclose(got1, want, rtol=1e-5, atol=1e-6)


def test_train_pooler_forward_and_grad_match_select_path(rng):
    """multilevel_roi_align_train (fused forward + custom VJP) must match
    the pool-every-level-and-select path in BOTH directions: same pooled
    values (fp reassociation tolerance) and the same feature gradient —
    its per-level masked separable-matmul adjoint is algebraically the
    adjoint the select path computes through roi_align's VJP."""
    from slenderobjdet_tpu.ops.roi_align import multilevel_roi_align_train

    strides = [4, 8, 16, 32]
    shapes = [(64 // s, 80 // s) for s in strides]
    feats = [jnp.asarray(rng.rand(h, w, 6).astype(np.float32))
             for h, w in shapes]
    n = 37
    x1 = rng.rand(n) * 100
    y1 = rng.rand(n) * 80
    w = rng.rand(n) * 500 + 4
    h = rng.rand(n) * 500 + 4
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32))
    cot = jnp.asarray(rng.rand(n, 7, 7, 6).astype(np.float32))

    want = np.asarray(multilevel_roi_align(feats, strides, rois, output_size=7))
    got = np.asarray(multilevel_roi_align_train(
        feats, strides, rois, output_size=7, roi_chunk=16))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    g_want = jax.grad(lambda fs: jnp.sum(multilevel_roi_align(
        fs, strides, rois, output_size=7) * cot))(feats)
    g_got = jax.grad(lambda fs: jnp.sum(multilevel_roi_align_train(
        fs, strides, rois, output_size=7, roi_chunk=16) * cot))(feats)
    for a, b, s in zip(g_got, g_want, strides):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"stride {s}")

    # unchunked core too
    got1 = np.asarray(multilevel_roi_align_train(
        feats, strides, rois, output_size=7, roi_chunk=64))
    np.testing.assert_allclose(got1, want, rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda fs: jnp.sum(multilevel_roi_align_train(
        fs, strides, rois, output_size=7, roi_chunk=64) * cot))(feats)
    for a, b in zip(g1, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
