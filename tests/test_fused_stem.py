"""Fused Pallas stem (ops/fused_stem.py): oracle equivalence to the XLA
conv+affine+relu+maxpool composition, gradient correctness through the
custom VJP, and eligibility gating. On the CPU test backend the kernel runs
in interpret mode (same code path as Mosaic up to lowering)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# RESNETS.FUSED_STEM is default-off (measured on-chip loss, VALIDATION
# round-3); parity record runs in the full tier only.
pytestmark = pytest.mark.slow

from slenderobjdet_tpu.ops.fused_stem import (
    fused_stem,
    reference_stem,
    stem_eligible,
)


def _inputs(rng, B, H, W, cs, dtype=jnp.float32):
    x = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32), dtype)
    w = jnp.asarray(rng.randn(7, 7, 3, cs).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(cs).astype(np.float32) * 0.5 + 0.75)
    bias = jnp.asarray(rng.randn(cs).astype(np.float32) * 0.1)
    return x, w, scale, bias


@pytest.mark.parametrize(
    "B,H,W,cs",
    [
        (2, 16, 32, 64),    # minimal shape, TG=4
        (1, 32, 48, 64),    # multiple tiles
        (1, 48, 16, 32),    # tall-narrow, Cs=32
        (2, 80, 64, 64),    # TG=20 path
    ],
)
def test_fused_stem_matches_reference(rng, B, H, W, cs):
    x, w, scale, bias = _inputs(rng, B, H, W, cs)
    got = np.asarray(fused_stem(x, w, scale, bias))
    want = np.asarray(reference_stem(x, w, scale, bias))
    assert got.shape == want.shape == (B, H // 4, W // 4, cs)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-5, err


def test_fused_stem_bf16(rng):
    """bf16 activations: the shipped inference path."""
    x, w, scale, bias = _inputs(rng, 1, 32, 32, 64, jnp.bfloat16)
    got = np.asarray(fused_stem(x, w, scale, bias), np.float32)
    want = np.asarray(reference_stem(x, w, scale, bias), np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 3e-2, err


def test_fused_stem_gradients_match_reference(rng):
    x, w, scale, bias = _inputs(rng, 1, 16, 16, 32)

    def f_fused(*a):
        return jnp.sum(fused_stem(*a) ** 2)

    def f_ref(*a):
        return jnp.sum(reference_stem(*a) ** 2)

    gf = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.slow
def test_fused_stem_resnet_matches_plain(rng):
    """MODEL.RESNETS.FUSED_STEM=True must reproduce the plain backbone with
    non-trivial FrozenBN affines (exercises the scale/bias folding and the
    params/buffers plumbing)."""
    from slenderobjdet_tpu.models.backbones.resnet import ResNet

    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    plain = ResNet(depth=18, out_features=("res2",), dtype=jnp.float32)
    fused = ResNet(depth=18, out_features=("res2",), fused_stem=True,
                   dtype=jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x)
    bufs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) * 0.5
                              + 0.75),
        variables["buffers"],
    )
    variables = {"params": variables["params"], "buffers": bufs}
    o1 = plain.apply(variables, x)["res2"]
    o2 = fused.apply(variables, x)["res2"]
    a, b = np.asarray(o1), np.asarray(o2)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    assert err < 1e-5, err


def test_stem_eligibility_gate():
    assert stem_eligible((1, 800, 1344, 3), (7, 7, 3, 64))
    assert stem_eligible((1, 1344, 800, 3), (7, 7, 3, 64))
    assert not stem_eligible((1, 800, 1344, 4), (7, 7, 4, 64))   # Cin != 3
    assert not stem_eligible((1, 802, 1344, 3), (7, 7, 3, 64))   # H % 4
    assert not stem_eligible((1, 800, 1344, 3), (5, 5, 3, 64))   # kernel
    assert not stem_eligible((1, 800, 1344, 3), (7, 7, 3, 256))  # N > 256
