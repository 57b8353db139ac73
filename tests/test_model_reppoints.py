import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model
from slenderobjdet_tpu.models.meta_arch.reppoints import (
    points2bbox,
    rep_points_assign,
)

from test_model_fcos import make_batch

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


def oracle_rep_assign(centers, lvls, gts, lvl_min, lvl_max, scale=4.0):
    """Loop transcription of rep_points_match (rep_matcher.py:9-101)."""
    L = len(centers)
    assigned = np.zeros(L, np.int64)
    dist = np.full(L, np.inf)
    for g, box in enumerate(gts):
        cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
        w = max(box[2] - box[0], 1e-6)
        h = max(box[3] - box[1], 1e-6)
        glvl = int((np.log2(w / scale) + np.log2(h / scale)) / 2)
        glvl = min(max(glvl, lvl_min), lvl_max)
        idxs = np.where(lvls == glvl)[0]
        d = np.linalg.norm(
            (centers[idxs] - [cx, cy]) / [w, h], axis=1
        )
        best = idxs[np.argmin(d)]
        if d.min() < dist[best]:
            assigned[best] = g + 1
            dist[best] = d.min()
    return assigned


def test_rep_assign_matches_oracle(rng):
    # two levels of points
    centers, lvls = [], []
    for s in (8, 16, 32, 64, 128):
        n = 64 // (s // 8)
        xs = np.arange(0, 16) * s
        xg, yg = np.meshgrid(xs[: max(2, 16 // (s // 8))],
                             xs[: max(2, 16 // (s // 8))])
        c = np.stack([xg.reshape(-1), yg.reshape(-1)], 1).astype(np.float32)
        centers.append(c)
        lvls.append(np.full(len(c), int(np.log2(s)), np.int32))
    centers = np.concatenate(centers)
    lvls = np.concatenate(lvls)

    gts = np.array(
        [[10, 10, 60, 50], [100, 100, 400, 380], [5, 5, 20, 18]], np.float32
    )
    exp = oracle_rep_assign(centers, lvls, gts, 3, 7)

    obj, boxes = rep_points_assign(
        jnp.asarray(centers), jnp.asarray(lvls), jnp.asarray(gts),
        jnp.ones(3, bool), 3, 7,
    )
    obj = np.asarray(obj)
    np.testing.assert_array_equal(obj, exp > 0)
    for i in np.where(exp > 0)[0]:
        np.testing.assert_allclose(np.asarray(boxes)[i], gts[exp[i] - 1])


def test_points2bbox_minmax():
    # one location, 3 points
    deltas = jnp.asarray([[[1.0, 2.0, -1.0, 0.0, 0.5, 3.0]]])  # (1,1,6)
    centers = jnp.asarray([[10.0, 20.0]])
    boxes = np.asarray(points2bbox(deltas, centers, 2.0, "minmax"))
    # points: (12,24), (8,20), (11,26)
    np.testing.assert_allclose(boxes[0, 0], [8, 20, 12, 26])


@pytest.fixture(scope="module")
def tiny_reppoints():
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RepPointsDetector"
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    return det, variables


def test_reppoints_loss_and_grads(tiny_reppoints):
    det, variables = tiny_reppoints
    batch = make_batch()

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    for k in ("loss_cls", "loss_localization_init", "loss_localization_refine"):
        assert np.isfinite(float(metrics[k])), k
    # deformable conv weights receive gradients
    dg = grads["head"]["deform_cls_conv"]["weight"]
    assert float(jnp.abs(dg).sum()) > 0
    # offsets_init receives gradients through BOTH the box loss and the
    # gradient_mul-scaled sampling path
    og = grads["head"]["offsets_init_out"]["kernel"]
    assert float(jnp.abs(og).sum()) > 0


def test_reppoints_predict(tiny_reppoints):
    det, variables = tiny_reppoints
    batch = make_batch()
    out = jax.jit(det.predict)(variables, batch)
    assert out["boxes"].shape == (1, det.max_dets, 4)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_reppoints_converges_on_fixed_batch():
    """Training-convergence evidence for the deform family: a tiny
    RepPointsDetector (GN trunk) overfits one synthetic batch — the
    grad-mul DCN offsets, point matchers, and moment decode train
    end-to-end without NaNs."""
    import optax
    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.engine.train_loop import TrainState, make_train_step

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RepPointsDetector"
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    tx = optax.sgd(8e-3, momentum=0.9)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(det, tx, donate=False)
    batch = make_batch(B=2, G=6)
    losses = []
    for _ in range(100):
        state, m = step(state, batch)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses[-5:]
    # measured: 0.888 -> ~0.32 by step 100 at this lr
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
