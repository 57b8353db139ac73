"""Random tensor through every registered backbone — the reference's own
test_backbone.py pattern (SURVEY.md §4), extended to all builders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.config import get_cfg
from slenderobjdet_tpu.models import BACKBONE_REGISTRY, build_backbone


def _cfg(name):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = name
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    if "pvt" in name:
        cfg.MODEL.PVT.DEPTH = "tiny"
        cfg.MODEL.FPN.IN_FEATURES = ["pvt2", "pvt3", "pvt4"]
    if "hourglass" in name:
        cfg.MODEL.HOURGLASS.STACKS = 1
        cfg.MODEL.HOURGLASS.DEPTH_BLOCK = 2
        cfg.MODEL.HOURGLASS.CHANNELS_BLOCK = [32, 48, 64]
        cfg.MODEL.HOURGLASS.NUM_CONV_BLOCK = [1, 1, 1]
        cfg.MODEL.HOURGLASS.STEM_OUT_CHANNELS = 16
        cfg.MODEL.HOURGLASS.OUT_FEATURES = ["hourglass2"]
    if name == "build_resnet_fpn_backbone":
        cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    return cfg


@pytest.mark.parametrize("name", sorted(BACKBONE_REGISTRY.keys()))
def test_backbone_shapes(name):
    cfg = _cfg(name)
    spec = build_backbone(cfg, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 128, 128, 3), jnp.float32)
    variables = jax.jit(spec.module.init)(jax.random.PRNGKey(0), x)
    feats = spec.module.apply(variables, x)
    for fname, channels in spec.channels.items():
        assert fname in feats, (name, fname, list(feats))
        f = feats[fname]
        stride = spec.strides[fname]
        assert f.shape == (1, 128 // stride, 128 // stride, channels), (
            name, fname, f.shape, stride, channels)
        assert np.isfinite(np.asarray(f)).all()


def test_pvtv2_shapes():
    from slenderobjdet_tpu.models.backbones.pvt import PVT_DEPTHS, PVTv2

    m = PVTv2(depths=PVT_DEPTHS["tiny"], dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert feats["pvt1"].shape == (1, 16, 16, 64)
    assert feats["pvt4"].shape == (1, 2, 2, 512)
    assert np.isfinite(np.asarray(feats["pvt4"])).all()


def test_fpn_gn_norm_applied():
    """cfg.MODEL.FPN.NORM='GN' must insert GroupNorm after lateral/output
    convs (d2 FPN semantics; rep-points configs rely on it)."""
    cfg = _cfg("build_retinanet_resnet_fpn_backbone_use_p5")
    cfg.MODEL.FPN.NORM = "GN"
    spec = build_backbone(cfg, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    variables = jax.jit(spec.module.init)(jax.random.PRNGKey(0), x)
    params = variables["params"]
    assert "fpn_lateral0_norm" in params, sorted(params)
    assert "fpn_output0_norm" in params, sorted(params)
    # norm replaces conv bias
    assert "bias" not in params["fpn_lateral0"]
    feats = spec.module.apply(variables, x)
    assert np.isfinite(np.asarray(feats["p3"])).all()



@pytest.mark.slow  # heavy grad-parity oracle (full tier)
def test_remat_backbone_identical_loss_and_grads():
    """TPU.REMAT_BACKBONE recomputes block activations in the backward pass;
    loss must be identical and gradients equal up to recompute-fusion
    rounding (XLA fuses the recomputed forward differently, so the last
    float digits can differ)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import jax
    import numpy as np
    from conftest import make_tiny_cfg
    from test_model_fcos import make_batch

    from slenderobjdet_tpu.models import build_model

    def run(remat):
        cfg = make_tiny_cfg()
        cfg.TPU.REMAT_BACKBONE = remat
        cfg.freeze()
        det = build_model(cfg)
        variables = det.init_variables(jax.random.PRNGKey(0))
        batch = make_batch()

        def loss_fn(params):
            total, _ = det.loss({**variables, "params": params}, batch)
            return total

        total, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return float(total), jax.device_get(grads)

    t0, g0 = run(False)
    t1, g1 = run(True)
    assert t0 == t1
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow  # heavy grad-parity oracle (full tier)
def test_remat_hourglass_tree_and_grads():
    """Hourglass remat must (1) keep the variable tree IDENTICAL to the
    unrematted module (nn.remat renames auto-named children, so every
    Residual carries its auto name explicitly — checkpoints stay
    interchangeable), (2) reproduce loss/grads, and (3) update BN running
    stats identically (hourglass trains real BN)."""
    from slenderobjdet_tpu.models.backbones.hourglass import Hourglass

    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)

    def run(remat):
        m = Hourglass(stacks=2, depth_block=2, channels_block=(16, 24, 32),
                      num_conv_block=(1, 1, 2), stem_out_channels=8,
                      norm="BN", remat=remat, dtype=jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)

        def loss_fn(params):
            out, mut = m.apply({**variables, "params": params}, x,
                               mutable=["buffers"])
            return sum(jnp.sum(jnp.square(v)) for v in out.values()), mut

        (total, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        return variables, float(total), jax.device_get(grads), \
            jax.device_get(mut["buffers"])

    v0, t0, g0, b0 = run(False)
    v1, t1, g1, b1 = run(True)
    # identical variable trees (names + shapes), so checkpoints interchange
    p0 = {"/".join(p): l.shape for p, l in
          jax.tree_util.tree_flatten_with_path(v0)[0] for p in [tuple(
              str(k) for k in p)]}
    p1 = {"/".join(p): l.shape for p, l in
          jax.tree_util.tree_flatten_with_path(v1)[0] for p in [tuple(
              str(k) for k in p)]}
    assert p0 == p1
    assert t0 == t1
    # BN's mean/var cancellations amplify recompute-fusion rounding a bit
    # beyond the ResNet case (observed: rel 2.4e-4 on O(100) grads, abs
    # 5e-5 on near-zero ones)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(b0),
                    jax.tree_util.tree_leaves(b1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
