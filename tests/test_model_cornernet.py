import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model

from test_model_fcos import make_batch

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_cornernet():
    from slenderobjdet_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CornerNet"
    cfg.MODEL.HOURGLASS.STACKS = 1
    cfg.MODEL.HOURGLASS.DEPTH_BLOCK = 3
    cfg.MODEL.HOURGLASS.CHANNELS_BLOCK = [64, 64, 96, 96]
    cfg.MODEL.HOURGLASS.NUM_CONV_BLOCK = [1, 1, 1, 2]
    cfg.MODEL.HOURGLASS.STEM_OUT_CHANNELS = 32
    cfg.MODEL.HOURGLASS.OUT_FEATURES = ["hourglass2"]
    cfg.MODEL.CORNER_NET.IN_FEATURES = ["hourglass2"]
    cfg.MODEL.CORNER_NET.NUM_CLASSES = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return det, variables


def test_cornernet_loss_and_grads(tiny_cornernet):
    det, variables = tiny_cornernet
    batch = make_batch()
    batch["gt_classes"] = jnp.clip(batch["gt_classes"], 0, 7)

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    for k in ("loss_heat", "loss_pull", "loss_push", "loss_offset"):
        assert np.isfinite(float(metrics[k])), k
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(g) and g > 0


def test_cornernet_predict(tiny_cornernet):
    det, variables = tiny_cornernet
    batch = make_batch()
    out = det.predict(variables, batch)
    assert out["boxes"].shape == (1, det.max_dets, 4)
    b = np.asarray(out["boxes"])
    assert np.isfinite(b).all()
    # decoded boxes are geometrically valid (br > tl) wherever valid
    v = np.asarray(out["valid"])
    if v.any():
        assert (b[v][:, 2] >= b[v][:, 0]).all()
        assert (b[v][:, 3] >= b[v][:, 1]).all()


def _train_cornernet(norm, steps, lr=2e-3):
    import optax

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.engine.train_loop import TrainState, make_train_step

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CornerNet"
    cfg.MODEL.HOURGLASS.STACKS = 1
    cfg.MODEL.HOURGLASS.DEPTH_BLOCK = 3
    cfg.MODEL.HOURGLASS.CHANNELS_BLOCK = [64, 64, 96, 96]
    cfg.MODEL.HOURGLASS.NUM_CONV_BLOCK = [1, 1, 1, 2]
    cfg.MODEL.HOURGLASS.STEM_OUT_CHANNELS = 32
    cfg.MODEL.HOURGLASS.OUT_FEATURES = ["hourglass2"]
    cfg.MODEL.HOURGLASS.NORM = norm
    cfg.MODEL.CORNER_NET.IN_FEATURES = ["hourglass2"]
    cfg.MODEL.CORNER_NET.NUM_CLASSES = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    tx = optax.sgd(lr, momentum=0.9)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(det, tx, donate=False)
    batch = make_batch(B=2, G=8)
    batch["gt_classes"] = jnp.clip(batch["gt_classes"], 0, 7)
    losses = []
    for _ in range(steps):
        state, m = step(state, batch)
        losses.append(float(m["total_loss"]))
    return losses


def test_cornernet_bn_converges_where_frozen_affine_diverges():
    """The reference trains its hourglass with real BatchNorm
    (`slender_det/modeling/backbone/hourglass.py:16`, d2 nn.BatchNorm2d via
    norm="BN"). With the norm-free/frozen-affine configuration the
    norm-free tower blows up within a few steps (measured here: loss 3.9e3
    then inf/nan), while trainable BN (running stats in the buffers
    collection) converges on the same batch — the convergence evidence for
    routing get_norm("BN") to real batch statistics."""
    frozen = _train_cornernet("FrozenBN", steps=5)
    bn = _train_cornernet("BN", steps=25)

    assert all(np.isfinite(l) for l in bn), bn
    assert bn[-1] < bn[0] * 0.5, bn
    # frozen-affine: divergence — non-finite within 5 steps, or at best
    # stuck far above where BN lands
    assert (not all(np.isfinite(l) for l in frozen)) or min(frozen) > 10 * bn[-1]
