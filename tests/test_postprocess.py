"""FCOS candidate selection: the two-stage (location-first) top-k must be
selection-identical to the flat (location, class) top-k it replaces
(models/meta_arch/fcos.py:_fcos_level_candidates; reference
slender_det/modeling/meta_arch/fcos/fcos.py:389-470 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slenderobjdet_tpu.models.meta_arch.fcos import _fcos_level_candidates

THRESH = 0.05


def flat_reference(logits, reg, ctr, locations, top_n):
    """Straight numpy transcription of the single-stage selection."""
    B, L, C = logits.shape
    scores = 1.0 / (1.0 + np.exp(-logits))
    ranked = scores * (1.0 / (1.0 + np.exp(-ctr)))[:, :, None] \
        if ctr is not None else scores
    flat = np.where(scores > THRESH, ranked, 0.0).reshape(B, L * C)
    k = min(top_n, L * C)
    out = []
    for b in range(B):
        idx = np.argsort(-flat[b], kind="stable")[:k]
        sel = flat[b][idx] > 0.0
        out.append({(int(i // C), int(i % C)): float(flat[b][i])
                    for i, s in zip(idx, sel) if s})
    return out


def run_candidates(logits, reg, ctr, locations, top_n):
    b, s, c, v, _ = _fcos_level_candidates(
        jnp.asarray(logits), jnp.asarray(reg),
        jnp.asarray(ctr) if ctr is not None else None,
        jnp.asarray(locations), THRESH, top_n, approx=False)
    return np.asarray(b), np.asarray(s), np.asarray(c), np.asarray(v)


@pytest.mark.parametrize("with_ctr", [True, False])
def test_two_stage_matches_flat(with_ctr):
    """L >> top_n engages stage 1; the kept (score, class) multiset and the
    per-slot validity must match the flat selection exactly (no ties,
    exact top-k)."""
    r = np.random.RandomState(0)
    B, L, C, top_n = 3, 400, 7, 50
    logits = r.randn(B, L, C).astype(np.float32) * 3 - 2
    reg = np.abs(r.randn(B, L, 4)).astype(np.float32) * 20 + 1
    ctr = r.randn(B, L).astype(np.float32) if with_ctr else None
    locations = (r.rand(L, 2).astype(np.float32) * 500)

    ref = flat_reference(logits, reg, ctr, locations, top_n)
    _, s, c, v = run_candidates(logits, reg, ctr, locations, top_n)

    for b in range(B):
        ref_ranks = sorted(ref[b].values(), reverse=True)
        got_ranks = sorted((s[b][v[b]] ** 2).tolist(), reverse=True)
        assert len(got_ranks) == len(ref_ranks)
        np.testing.assert_allclose(got_ranks, ref_ranks, rtol=1e-5)
        # class identities of the kept pairs must agree as a multiset
        ref_cls = sorted(cl for (_, cl) in ref[b])
        got_cls = sorted(int(x) for x in c[b][v[b]])
        assert got_cls == ref_cls


def test_subthreshold_locations_cannot_displace():
    """Adversarial case for the stage-1 statistic: locations whose classes
    are all BELOW the score threshold carry high centerness; an unmasked
    stage-1 rank would let them crowd out genuinely valid low-rank pairs."""
    r = np.random.RandomState(1)
    B, L, C, top_n = 1, 300, 4, 20
    # all locations sub-threshold (score ~ sigmoid(-4) = 0.018)...
    logits = np.full((B, L, C), -4.0, np.float32)
    ctr = np.full((B, L), 5.0, np.float32)  # ...with high centerness
    # ...except 25 locations with one just-above-threshold class but very
    # negative centerness -> tiny ranked score, still the only valid pairs
    hot = r.choice(L, 25, replace=False)
    logits[0, hot, 2] = -2.5                # sigmoid = 0.076 > 0.05
    ctr[0, hot] = -6.0
    reg = np.abs(r.randn(B, L, 4)).astype(np.float32) * 10 + 1
    locations = r.rand(L, 2).astype(np.float32) * 100

    ref = flat_reference(logits, reg, ctr, locations, top_n)
    _, s, c, v = run_candidates(logits, reg, ctr, locations, top_n)
    assert len(ref[0]) == top_n  # 25 valid pairs, top_n=20 kept
    assert int(v.sum()) == top_n
    assert set(int(x) for x in c[0][v[0]]) == {2}


def test_small_level_exact_path():
    """L <= top_n keeps the single-stage path (loc_sel is None) and returns
    every above-threshold pair."""
    r = np.random.RandomState(2)
    B, L, C, top_n = 2, 30, 5, 100
    logits = r.randn(B, L, C).astype(np.float32)
    ctr = r.randn(B, L).astype(np.float32)
    reg = np.abs(r.randn(B, L, 4)).astype(np.float32) + 1
    locations = r.rand(L, 2).astype(np.float32) * 50

    ref = flat_reference(logits, reg, ctr, locations, top_n)
    _, s, c, v = run_candidates(logits, reg, ctr, locations, top_n)
    for b in range(B):
        assert int(v[b].sum()) == len(ref[b])


def test_corner_topk_matches_flat():
    """The CornerNet corner selection (pair_top_k over the pool-NMS-masked
    heatmap, models/meta_arch/corner_net.py) is selection-identical to the
    flat (H*W*C) lax.top_k it replaced."""
    from flax import linen as fnn

    from slenderobjdet_tpu.ops.topk import pair_top_k

    r = np.random.RandomState(3)
    B, H, W, C, K = 2, 24, 36, 11, 50
    heat = jnp.asarray(r.randn(B, H, W, C).astype(np.float32) * 2)
    p = jax.nn.sigmoid(heat)
    pooled = fnn.max_pool(p, (3, 3), strides=(1, 1), padding="SAME")
    p = jnp.where(p == pooled, p, 0.0)

    ref_scores, ref_idx = jax.lax.top_k(p.reshape(B, H * W * C), K)
    scores, loc, cls = pair_top_k(p.reshape(B, H * W, C), K, approx=False)
    flat_idx = loc * C + cls

    for b in range(B):
        np.testing.assert_allclose(
            np.sort(np.asarray(scores[b]))[::-1],
            np.sort(np.asarray(ref_scores[b]))[::-1], rtol=1e-6)
        assert set(np.asarray(flat_idx[b]).tolist()) == set(
            np.asarray(ref_idx[b]).tolist())
