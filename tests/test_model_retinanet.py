import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model

from test_model_fcos import make_batch

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_retinanet():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    # per-level sizes as in configs/retina/Base-RetinaNet.yaml's eval expr
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
        [x, x * 2 ** (1.0 / 3), x * 2 ** (2.0 / 3)]
        for x in [32, 64, 128, 256, 512]
    ]
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return det, variables


def test_retinanet_loss_and_grads(tiny_retinanet):
    det, variables = tiny_retinanet
    batch = make_batch()

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert float(metrics["num_pos"]) > 0
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_retinanet_predict(tiny_retinanet):
    det, variables = tiny_retinanet
    batch = make_batch()
    dets = jax.jit(det.predict)(variables, batch)
    D = det.max_dets
    assert dets["boxes"].shape == (1, D, 4)
    assert np.isfinite(np.asarray(dets["boxes"])).all()


def test_retinanet_anchor_count(tiny_retinanet):
    det, _ = tiny_retinanet
    anchors, counts = det._anchors((64, 64))
    # strides 8..128 at 64x64: 8x8 + 4x4 + 2x2 + 1x1 + 1x1 cells, 9 anchors
    assert counts == [8 * 8 * 9, 4 * 4 * 9, 2 * 2 * 9, 1 * 1 * 9, 1 * 1 * 9]
    assert anchors.shape == (sum(counts), 4)
    # d2 cell anchor: size 32, ratio 1 at cell (0,0) is centered at origin
    first_sq = anchors[1]  # ratios ordered [0.5, 1, 2] -> index 1 is square
    w = first_sq[2] - first_sq[0]
    h = first_sq[3] - first_sq[1]
    assert w == pytest.approx(32.0, rel=1e-5)
    assert h == pytest.approx(32.0, rel=1e-5)


def test_retinanet_empty_gt(tiny_retinanet):
    det, variables = tiny_retinanet
    batch = make_batch()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, metrics = jax.jit(det.loss)(variables, batch)
    assert np.isfinite(float(total))
