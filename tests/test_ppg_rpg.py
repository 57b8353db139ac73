"""Standalone PointsProposalGenerator / RepPointsGenerator
(reference ppg.py:14-255, rpg.py:45-390): exact likelihood loss vs a torch
grid_sample oracle, objectness size-band supervision, OHEM focal negatives,
one train step each."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model

from test_model_fcos import make_batch

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


def test_likelihood_loss_matches_torch_oracle(rng):
    """likelyhood_loss (ppg.py:14-31) transcribed with torch.F.grid_sample
    as the oracle (bilinear, align_corners=False, zero padding)."""
    import torch
    import torch.nn.functional as F

    from slenderobjdet_tpu.models.proposal_generator.ppg import (
        likelihood_loss,
    )

    B, P, Hf, Wf, H, W = 2, 3, 4, 5, 16, 20
    target = rng.rand(B, H, W).astype(np.float32)
    coords = (rng.rand(B, P, Hf, Wf, 2).astype(np.float32) * 2 - 1)
    mask = (rng.rand(B, H, W) > 0.3).astype(np.float32)

    def oracle(with_mask):
        t = torch.from_numpy(target)[:, None]
        g = torch.from_numpy(coords).reshape(B, P * Hf, Wf, 2)
        lk = F.grid_sample(t, g, align_corners=False).reshape(B, P, Hf, Wf)
        if with_mask:
            m = torch.from_numpy(mask)[:, None]
            lk = lk * F.grid_sample(m, g, align_corners=False).reshape(
                B, P, Hf, Wf)
        return -torch.log(lk.mean(2).mean(2) + 1e-8).numpy()

    got = np.asarray(likelihood_loss(jnp.asarray(target), jnp.asarray(coords)))
    np.testing.assert_allclose(got, oracle(False), rtol=1e-4, atol=1e-5)

    got_m = np.asarray(likelihood_loss(
        jnp.asarray(target), jnp.asarray(coords), jnp.asarray(mask)))
    np.testing.assert_allclose(got_m, oracle(True), rtol=1e-4, atol=1e-5)


def _pg_cfg(name):
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "ProposalNetworkWithMasks"
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = name
    cfg.MODEL.RPN.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.PROPOSAL_GENERATOR.IN_FEATURES = ["p3", "p4", "p5", "p6"]
    cfg.freeze()
    return cfg


@pytest.mark.parametrize("name", ["PointsProposalGenerator",
                                  "RepPointsGenerator"])
def test_generator_train_step_and_predict(name):
    import optax

    from slenderobjdet_tpu.engine.train_loop import (
        TrainState,
        make_train_step,
    )

    det = build_model(_pg_cfg(name))
    from slenderobjdet_tpu.models.proposal_generator.ppg import (
        PointsProposalGenerator,
    )
    from slenderobjdet_tpu.models.proposal_generator.rpg import (
        RepPointsGenerator,
    )

    assert isinstance(det, (PointsProposalGenerator, RepPointsGenerator))
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()
    if name == "PointsProposalGenerator":
        sm = np.zeros((1, 64, 64, 2), np.float32)
        sm[:, 10:40, 10:30] = (20.0, 30.0)
        batch["size_map"] = jnp.asarray(sm)

    tx = optax.sgd(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(det, tx)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"])), metrics
    assert int(state.step) == 1

    # the train step donates its input state; predict with the new state
    new_vars = {"params": state.params}
    if state.buffers:
        new_vars["buffers"] = state.buffers
    out = jax.jit(det.predict)(new_vars, batch)
    assert out["boxes"].shape[-1] == 4
    assert np.isfinite(np.asarray(out["boxes"])).all()
    assert "proposals" in out


def test_ppg_size_band_supervision():
    """gt_logit (ppg.py:77-134): in-band object pixels are positive (1),
    background 0, off-band object pixels ignored — so a small object must
    contribute positives only at the fine level."""
    det = build_model(_pg_cfg("PointsProposalGenerator"))
    variables = det.init_variables(jax.random.PRNGKey(0))

    batch = make_batch()
    # one object with size magnitude 20 (band 0: 0 < s <= 32)
    sm = np.zeros((1, 64, 64, 2), np.float32)
    sm[:, 20:36, 20:32] = (12.0, 16.0)  # |.| = 20
    batch["size_map"] = jnp.asarray(sm)
    _, m = jax.jit(det.loss)(variables, batch)
    # all levels emit a loss; the band construction is exercised via finite
    # per-level objectness losses
    for lvl in range(len(det.in_features)):
        assert np.isfinite(float(m[f"objectness_loss_{lvl}"])), lvl
        assert float(m[f"border_likely_loss_{lvl}"]) == 0.0  # zeroed upstream


def test_rpg_ohem_zero_positives_finite():
    det = build_model(_pg_cfg("RepPointsGenerator"))
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, metrics = jax.jit(det.loss)(variables, batch)
    assert np.isfinite(float(total))
    assert float(metrics["num_pos"]) == 0
    # no positives -> no OHEM negatives either (neg_count = min(X, 0))
    assert float(metrics["cls_loss"]) == pytest.approx(0.0, abs=1e-6)
