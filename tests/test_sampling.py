import numpy as np
import jax
import jax.numpy as jnp

from slenderobjdet_tpu.models.sampling import subsample_labels


def test_subsample_budget_and_fraction():
    rng = jax.random.PRNGKey(0)
    pos = jnp.asarray(np.arange(100) < 40)   # 40 positives
    neg = jnp.asarray(np.arange(100) >= 40)  # 60 negatives
    sp, sn = subsample_labels(rng, pos, neg, 64, 0.5)
    assert int(sp.sum()) == 32               # capped at 64*0.5
    assert int(sn.sum()) == 32
    assert not bool((np.asarray(sp) & np.asarray(sn)).any())
    assert np.asarray(sp)[40:].sum() == 0    # only real positives picked


def test_subsample_few_positives():
    rng = jax.random.PRNGKey(1)
    pos = jnp.asarray(np.arange(100) < 5)
    neg = jnp.asarray(np.arange(100) >= 5)
    sp, sn = subsample_labels(rng, pos, neg, 64, 0.5)
    assert int(sp.sum()) == 5
    assert int(sn.sum()) == 59               # fills the rest


def test_subsample_no_candidates():
    rng = jax.random.PRNGKey(2)
    pos = jnp.zeros(50, bool)
    neg = jnp.zeros(50, bool)
    sp, sn = subsample_labels(rng, pos, neg, 32, 0.25)
    assert int(sp.sum()) == 0 and int(sn.sum()) == 0


def test_subsample_randomness():
    pos = jnp.asarray(np.arange(100) < 50)
    neg = ~pos
    a = subsample_labels(jax.random.PRNGKey(0), pos, neg, 32, 0.5)[0]
    b = subsample_labels(jax.random.PRNGKey(1), pos, neg, 32, 0.5)[0]
    assert not np.array_equal(np.asarray(a), np.asarray(b))
