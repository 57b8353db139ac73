"""DFConv2d layer + DCN-enabled model variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model
from slenderobjdet_tpu.models.layers import DFConv2d

from test_model_fcos import make_batch

# full-tier: heavy oracle/convergence coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


def test_dfconv2d_zero_offsets_equal_plain_conv(rng):
    """offset_conv is zero-initialized, so at init DFConv2d(v1) == plain
    3x3 conv with the same weights (zero-pad boundary semantics)."""
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    m = DFConv2d(6, modulated=False)
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))

    w = np.asarray(v["params"]["weight"])  # (9, 4, 6)
    b = np.asarray(v["params"]["bias"])
    xp = np.pad(np.asarray(x[0]), ((1, 1), (1, 1), (0, 0)))
    want = np.zeros((8, 8, 6))
    for i in range(8):
        for j in range(8):
            patch = xp[i:i + 3, j:j + 3].reshape(9, 4)
            want[i, j] = np.einsum("kc,kco->o", patch, w) + b
    np.testing.assert_allclose(out[0], want, atol=1e-4)


def test_dfconv2d_modulated_halves_at_init(rng):
    """v2 mask starts at sigmoid(0)=0.5, scaling every sample by half."""
    x = jnp.asarray(rng.rand(1, 6, 6, 3).astype(np.float32))
    v1 = DFConv2d(4, modulated=False)
    v2 = DFConv2d(4, modulated=True)
    p1 = v1.init(jax.random.PRNGKey(0), x)
    p2 = jax.tree_util.tree_map(lambda a: a, v2.init(jax.random.PRNGKey(0), x))
    # copy weights from v1 into v2 (offset conv shapes differ; weight matches)
    p2["params"]["weight"] = p1["params"]["weight"]
    p2["params"]["bias"] = jnp.zeros_like(p2["params"]["bias"])
    p1["params"]["bias"] = jnp.zeros_like(p1["params"]["bias"])
    out1 = np.asarray(v1.apply(p1, x))
    out2 = np.asarray(v2.apply(p2, x))
    np.testing.assert_allclose(out2, out1 * 0.5, atol=1e-5)


@pytest.mark.parametrize("arch,tweak", [
    ("FCOS", {"MODEL.FCOS.USE_DCN_IN_TOWER": True}),
    ("DeformableConvRetinaNet", {}),
])
def test_dcn_model_variants(arch, tweak):
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = arch
    if arch == "DeformableConvRetinaNet":
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
            [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)]
            for x in [32, 64, 128, 256, 512]
        ]
    for k, v in tweak.items():
        cfg.merge_from_list([k, str(v)])
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()
    total, metrics = det.loss(variables, batch)
    assert np.isfinite(float(total))
    out = det.predict(variables, batch)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_resnet_deform_stage():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, True, True]
    cfg.MODEL.RESNETS.DEFORM_MODULATED = True
    cfg.freeze()
    from slenderobjdet_tpu.models import build_backbone

    spec = build_backbone(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(spec.module.init)(jax.random.PRNGKey(0), x)
    # deform offset convs exist exactly in res4/res5 blocks
    bu = v["params"]["bottom_up"]
    assert "offset_conv" in bu["res4_0"]["conv2"]
    assert "offset_conv" in bu["res5_0"]["conv2"]
    assert "offset_conv" not in bu["res3_0"]["conv2"]
    feats = spec.module.apply(v, x)
    assert np.isfinite(np.asarray(feats["p5"])).all()


@pytest.mark.parametrize("arch", ["FCOSTopK", "CenternessRetinaNet",
                                  "NearestRetinaNet"])
def test_assignment_variants(arch):
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = arch
    if "RetinaNet" in arch:
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
            [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)]
            for x in [32, 64, 128, 256, 512]
        ]
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()
    total, metrics = det.loss(variables, batch)
    assert np.isfinite(float(total)), (arch, metrics)
    out = det.predict(variables, batch)
    assert np.isfinite(np.asarray(out["boxes"])).all()


@pytest.mark.parametrize("arch", ["RepPointsCenterness", "RepPointsV2",
                                  "FCOSRepPoints", "FCOSRetinaNet",
                                  "PointRetinaNet"])
def test_hybrid_variants(arch):
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = arch
    if "RetinaNet" in arch and arch not in ("ReppointsRetinaNet",):
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
            [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)]
            for x in [32, 64, 128, 256, 512]
        ]
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total)), (arch, metrics)
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(g) and g > 0, arch
    out = det.predict(variables, batch)
    assert np.isfinite(np.asarray(out["boxes"])).all(), arch


def test_fcos_anchor():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "FCOSAnchor"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[64], [128], [256], [512], [1024]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total)), metrics
    assert np.isfinite(float(metrics["shape_loss"]))
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(g) and g > 0
    out = det.predict(variables, batch)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_proposal_network_with_masks():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "ProposalNetworkWithMasks"
    cfg.NEED_MASKS = True
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()
    cm = np.zeros((1, 64, 64), np.float32)
    cm[:, 10:50, 10:50] = 1.0
    batch["center_mask"] = jnp.asarray(cm)
    total, metrics = det.loss(variables, batch)
    assert np.isfinite(float(total))
    out = det.predict(variables, batch)
    assert out["proposals"].shape[2] == 4
    assert np.isfinite(np.asarray(out["proposals"])).all()
