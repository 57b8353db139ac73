"""Deformable conv vs a literal numpy oracle — following the reference's own
gold-standard test (`tests/test_deformable_conv.py:11-87`, the one real unit
test in the reference repo)."""

import numpy as np
import jax.numpy as jnp

from slenderobjdet_tpu.ops.deform_conv import (
    deform_conv2d,
    kernel_base_offsets,
)


def oracle_deform_conv(x, offsets, weight, bias):
    """x (H,W,C); offsets (H,W,K,2) absolute (dy,dx); weight (K,Cin,Cout)."""
    H, W, Cin = x.shape
    K, _, Cout = weight.shape
    out = np.zeros((H, W, Cout), np.float64)

    def sample(y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        ly, lx = y - y0, xx - x0
        acc = np.zeros(Cin, np.float64)
        # explicit four taps with zero padding
        for dy, dx, wgt in (
            (0, 0, (1 - ly) * (1 - lx)),
            (0, 1, (1 - ly) * lx),
            (1, 0, ly * (1 - lx)),
            (1, 1, ly * lx),
        ):
            yy, xx2 = y0 + dy, x0 + dx
            if 0 <= yy < H and 0 <= xx2 < W:
                acc += x[yy, xx2] * wgt
        return acc

    for i in range(H):
        for j in range(W):
            for k in range(K):
                dy, dx = offsets[i, j, k]
                s = sample(i + dy, j + dx)
                out[i, j] += s @ weight[k]
            out[i, j] += bias
    return out


def test_deform_conv_matches_oracle(rng):
    H, W, Cin, Cout = 6, 7, 4, 5
    x = rng.rand(H, W, Cin).astype(np.float32)
    base = kernel_base_offsets(3)  # (9, 2)
    offsets = (
        base[None, None] + rng.randn(H, W, 9, 2).astype(np.float32) * 0.7
    )
    weight = rng.randn(9, Cin, Cout).astype(np.float32) * 0.1
    bias = rng.randn(Cout).astype(np.float32)

    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                      jnp.asarray(weight), jnp.asarray(bias))
    )
    want = oracle_deform_conv(x, offsets, weight, bias)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deform_conv_zero_offsets_is_conv(rng):
    """With kernel-base offsets it must equal an ordinary 3x3 conv."""
    H, W, Cin, Cout = 8, 8, 3, 6
    x = rng.rand(H, W, Cin).astype(np.float32)
    base = np.broadcast_to(kernel_base_offsets(3)[None, None], (H, W, 9, 2))
    weight = rng.randn(9, Cin, Cout).astype(np.float32) * 0.1

    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(base.copy()),
                      jnp.asarray(weight))
    )

    # ordinary conv via explicit zero-padded loop
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    want = np.zeros((H, W, Cout), np.float64)
    for i in range(H):
        for j in range(W):
            patch = xp[i:i + 3, j:j + 3].reshape(9, Cin)
            want[i, j] = np.einsum("kc,kco->o", patch, weight)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_modulated_mask(rng):
    H, W, Cin, Cout = 5, 5, 2, 3
    x = rng.rand(H, W, Cin).astype(np.float32)
    base = np.broadcast_to(kernel_base_offsets(3)[None, None], (H, W, 9, 2)).copy()
    weight = rng.randn(9, Cin, Cout).astype(np.float32)
    full = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(base),
                                    jnp.asarray(weight)))
    half = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(base), jnp.asarray(weight),
                      mask=jnp.full((H, W, 9), 0.5))
    )
    np.testing.assert_allclose(half, full * 0.5, atol=1e-5)


def test_pair_gather_matches_flat(rng):
    """The pair-table gather (2 rows of 2C per sample) must agree with the
    4-tap flat gather everywhere, including boundary and far-outside
    positions and exact-integer coordinates (fp32: identical weights, only
    the summation grouping differs)."""
    from slenderobjdet_tpu.ops.deform_conv import (
        _gather_bilinear_pair_batched,
        _gather_bilinear_zeropad_batched,
    )

    B, H, W, C, K = 2, 9, 11, 4, 7
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ys = np.concatenate(
        [
            rng.rand(B, H, W, K - 3).astype(np.float32) * (H + 6) - 3,
            rng.randint(-3, H + 3, (B, H, W, 3)).astype(np.float32),
        ],
        axis=-1,
    )
    xs = np.concatenate(
        [
            rng.rand(B, H, W, K - 3).astype(np.float32) * (W + 6) - 3,
            rng.randint(-3, W + 3, (B, H, W, 3)).astype(np.float32),
        ],
        axis=-1,
    )
    a = _gather_bilinear_zeropad_batched(feat, jnp.asarray(ys), jnp.asarray(xs))
    b = _gather_bilinear_pair_batched(feat, jnp.asarray(ys), jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pairslice_gather_matches_flat(rng):
    """The pair-SLICE gather (2 dynamic-slices of (2, C) consecutive rows of
    the original table) must agree with the 4-tap flat gather everywhere:
    boundary and far-outside positions, exact-integer coordinates, and both
    edge columns (where the pair start clamps)."""
    from slenderobjdet_tpu.ops.deform_conv import (
        _gather_bilinear_pairslice_batched,
        _gather_bilinear_zeropad_batched,
    )

    B, H, W, C, K = 2, 9, 11, 4, 7
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ys = np.concatenate(
        [
            rng.rand(B, H, W, K - 3).astype(np.float32) * (H + 6) - 3,
            rng.randint(-3, H + 3, (B, H, W, 3)).astype(np.float32),
        ],
        axis=-1,
    )
    xs = np.concatenate(
        [
            rng.rand(B, H, W, K - 3).astype(np.float32) * (W + 6) - 3,
            rng.randint(-3, W + 3, (B, H, W, 3)).astype(np.float32),
        ],
        axis=-1,
    )
    a = _gather_bilinear_zeropad_batched(feat, jnp.asarray(ys), jnp.asarray(xs))
    b = _gather_bilinear_pairslice_batched(feat, jnp.asarray(ys),
                                           jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # bf16 (production dtype) stays within one bf16 ulp of the 4-tap path
    a16 = _gather_bilinear_zeropad_batched(
        feat.astype(jnp.bfloat16), jnp.asarray(ys), jnp.asarray(xs))
    b16 = _gather_bilinear_pairslice_batched(
        feat.astype(jnp.bfloat16), jnp.asarray(ys), jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(a16, np.float32),
                               np.asarray(b16, np.float32),
                               atol=0.05, rtol=0.05)


def test_custom_vjp_grads_match_autodiff(rng):
    """The custom backward (recompute-in-bwd + scatter-add feature adjoint
    + fp32-accumulated offset grads) must match plain autodiff through the
    gather for BOTH feat and offsets, including boundary samples whose taps
    fall outside the image."""
    import jax

    from slenderobjdet_tpu.ops.deform_conv import (
        _gather_core,
        _gather_impl,
        deform_conv2d_batched,
    )

    B, H, W, C, K = 2, 9, 11, 6, 9
    feat = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    # offsets spanning in-bounds, boundary-straddling, and fully-outside
    offs = jnp.asarray(
        (rng.rand(B, H, W, K, 2).astype(np.float32) - 0.5) * 8.0)
    weight = jnp.asarray(rng.rand(K, C, 4).astype(np.float32) - 0.5)
    cot = jnp.asarray(rng.rand(B, H, W, 4).astype(np.float32))

    def loss(fn):
        def f(fe, of):
            yy = (jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
                  + of[..., 0])
            xx = (jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
                  + of[..., 1])
            s = fn(fe, yy, xx)
            out = jax.lax.dot_general(
                s.reshape(B * H * W, K * C), weight.reshape(K * C, 4),
                dimension_numbers=(((1,), (0,)), ((), ())))
            return jnp.sum(out.reshape(B, H, W, 4) * cot)
        return f

    g_auto = jax.grad(loss(_gather_impl), argnums=(0, 1))(feat, offs)
    g_cust = jax.grad(loss(_gather_core), argnums=(0, 1))(feat, offs)
    np.testing.assert_allclose(np.asarray(g_cust[0]), np.asarray(g_auto[0]),
                               rtol=1e-5, atol=1e-6, err_msg="dfeat")
    np.testing.assert_allclose(np.asarray(g_cust[1]), np.asarray(g_auto[1]),
                               rtol=1e-4, atol=1e-5, err_msg="doffsets")

    # and through the public op (mask + bias + batched), value unchanged
    mask = jnp.asarray(rng.rand(B, H, W, K).astype(np.float32))
    bias = jnp.asarray(rng.rand(4).astype(np.float32))
    out = deform_conv2d_batched(feat, offs, weight, bias, mask)
    assert out.shape == (B, H, W, 4)
    g = jax.grad(lambda fe: jnp.sum(
        deform_conv2d_batched(fe, offs, weight, bias, mask) * cot))(feat)
    assert np.isfinite(np.asarray(g)).all()
