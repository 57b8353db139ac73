"""Pallas NMS kernel vs the XLA scan implementation (interpret mode: the
kernel runs on CPU through the Pallas interpreter)."""

import numpy as np
import jax.numpy as jnp

from slenderobjdet_tpu.ops.nms import nms_select
from slenderobjdet_tpu.ops.pallas_nms import pallas_batched_nms, pallas_nms


def test_pallas_nms_matches_scan(rng):
    B, N, K = 3, 96, 32
    xy = rng.rand(B, N, 2).astype(np.float32) * 80
    wh = rng.rand(B, N, 2).astype(np.float32) * 40 + 4
    boxes = np.concatenate([xy, xy + wh], axis=2)
    scores = rng.rand(B, N).astype(np.float32)

    ki, kv = pallas_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, K,
                        interpret=True)
    for b in range(B):
        ri, rv = nms_select(jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
                            0.5, K)
        np.testing.assert_array_equal(np.asarray(ki[b]), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(kv[b]), np.asarray(rv))


def test_pallas_nms_valid_mask(rng):
    B, N, K = 2, 64, 16
    xy = rng.rand(B, N, 2).astype(np.float32) * 50
    wh = rng.rand(B, N, 2).astype(np.float32) * 20 + 2
    boxes = np.concatenate([xy, xy + wh], axis=2)
    scores = rng.rand(B, N).astype(np.float32)
    valid = rng.rand(B, N) > 0.5

    ki, kv = pallas_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, K,
                        valid=jnp.asarray(valid), interpret=True)
    for b in range(B):
        ri, rv = nms_select(jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
                            0.5, K, valid=jnp.asarray(valid[b]))
        np.testing.assert_array_equal(np.asarray(ki[b]), np.asarray(ri))


def test_pallas_batched_nms_classes(rng):
    boxes = np.tile(np.array([[10.0, 10.0, 30.0, 30.0]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    classes = np.arange(4, dtype=np.int32)
    ki, kv = pallas_batched_nms(
        jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
        jnp.asarray(classes[None]), 0.5, 8, interpret=True,
    )
    assert int(np.asarray(kv).sum()) == 4
