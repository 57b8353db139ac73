"""Fused Pallas bottleneck (ops/fused_bottleneck.py): oracle equivalence to
the plain-XLA composition, gradient correctness through the custom VJP, and
whole-backbone equivalence with MODEL.RESNETS.FUSED_BLOCKS. On the CPU test
backend the kernel runs in interpret mode (same code path as Mosaic up to
lowering)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.ops.fused_bottleneck import (
    fused_bottleneck,
    reference_bottleneck,
)


def _t(rng, shape, s=0.1):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * s)


@pytest.mark.parametrize(
    "B,H,W,cin,cm,cout,proj",
    [
        (2, 13, 24, 64, 16, 64, True),    # ragged rows + projection
        (1, 16, 24, 64, 16, 64, False),   # identity shortcut
        (2, 7, 9, 32, 16, 32, False),     # H < tile
        (1, 5, 160, 64, 32, 128, True),   # wide row, chunked cout
    ],
)
def test_fused_matches_reference(rng, B, H, W, cin, cm, cout, proj):
    x = _t(rng, (B, H, W, cin), 1.0)
    w1, b1 = _t(rng, (cin, cm)), _t(rng, (cm,))
    w2, b2 = _t(rng, (3, 3, cm, cm)), _t(rng, (cm,))
    w3, b3 = _t(rng, (cm, cout)), _t(rng, (cout,))
    wsc, bsc = (_t(rng, (cin, cout)), _t(rng, (cout,))) if proj else (None,
                                                                      None)
    got = np.asarray(fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wsc, bsc))
    want = np.asarray(reference_bottleneck(x, w1, b1, w2, b2, w3, b3, wsc,
                                           bsc))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-5, err


def test_fused_gradients_match_reference(rng):
    x = _t(rng, (1, 8, 12, 32), 1.0)
    w1, b1 = _t(rng, (32, 16)), _t(rng, (16,))
    w2, b2 = _t(rng, (3, 3, 16, 16)), _t(rng, (16,))
    w3, b3 = _t(rng, (16, 32)), _t(rng, (32,))

    def f_fused(*a):
        return jnp.sum(fused_bottleneck(*a, None, None) ** 2)

    def f_ref(*a):
        return jnp.sum(reference_bottleneck(*a) ** 2)

    gf = jax.grad(f_fused, argnums=tuple(range(7)))(x, w1, b1, w2, b2, w3,
                                                    b3)
    gr = jax.grad(f_ref, argnums=tuple(range(7)))(x, w1, b1, w2, b2, w3, b3)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.slow
def test_fused_resnet_matches_plain(rng):
    """FUSED_BLOCKS=True must reproduce the plain backbone bit-closely with
    non-trivial FrozenBN affines (exercises the folding)."""
    from slenderobjdet_tpu.models.backbones.resnet import ResNet

    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    plain = ResNet(depth=50, out_features=("res2", "res3", "res4", "res5"),
                   dtype=jnp.float32)
    fused = ResNet(depth=50, out_features=("res2", "res3", "res4", "res5"),
                   fused_blocks=True, dtype=jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x)
    bufs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) * 0.5
                              + 0.75),
        variables["buffers"],
    )
    variables = {"params": variables["params"], "buffers": bufs}
    o1 = plain.apply(variables, x)
    o2 = fused.apply(variables, x)
    for k in o1:
        a, b = np.asarray(o1[k]), np.asarray(o2[k])
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-5, (k, err)
