"""FCOS target assignment: vectorized TPU implementation vs a literal numpy
re-implementation of the reference algorithm (fcos.py:112-163) as oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models.anchors import fcos_locations
from slenderobjdet_tpu.models.meta_arch.fcos import (
    SIZES_OF_INTEREST,
    compute_centerness_targets,
    fcos_assign_single,
)

INF = 1e8
NUM_CLASSES = 80


def oracle_assign(locations, soi, gt_boxes, gt_classes):
    """Loop-based reference semantics (independent numpy oracle)."""
    L = len(locations)
    labels = np.full(L, NUM_CLASSES, np.int64)
    reg = np.zeros((L, 4), np.float32)
    if len(gt_boxes) == 0:
        return labels, reg
    areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    for li in range(L):
        x, y = locations[li]
        best_area, best_g = INF, -1
        for g, box in enumerate(gt_boxes):
            l, t = x - box[0], y - box[1]
            r, b = box[2] - x, box[3] - y
            if min(l, t, r, b) <= 0:
                continue
            m = max(l, t, r, b)
            if not (soi[li][0] <= m <= soi[li][1]):
                continue
            if areas[g] < best_area:
                best_area, best_g = areas[g], g
        if best_g >= 0:
            labels[li] = gt_classes[best_g]
            box = gt_boxes[best_g]
            reg[li] = [x - box[0], y - box[1], box[2] - x, box[3] - y]
    return labels, reg


def test_assignment_matches_oracle(rng):
    image_hw = (64, 96)
    strides = [8, 16, 32, 64, 128]
    locations, counts = fcos_locations(image_hw, strides)
    soi = np.concatenate(
        [np.broadcast_to(np.array(SIZES_OF_INTEREST[i]), (c, 2)) for i, c in enumerate(counts)]
    )

    G = 6
    xy = rng.rand(G, 2).astype(np.float32) * 40
    wh = rng.rand(G, 2).astype(np.float32) * 50 + 4
    gt_boxes = np.concatenate([xy, xy + wh], axis=1)
    gt_classes = rng.randint(0, NUM_CLASSES, size=G)

    exp_labels, exp_reg = oracle_assign(locations, soi, gt_boxes, gt_classes)

    labels, reg, _ = jax.jit(
        lambda *a: fcos_assign_single(*a, num_classes=NUM_CLASSES)
    )(
        jnp.asarray(locations),
        jnp.asarray(soi, jnp.float32),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_classes, jnp.int32),
        jnp.ones(G, bool),
    )
    np.testing.assert_array_equal(np.asarray(labels), exp_labels)
    pos = exp_labels < NUM_CLASSES
    np.testing.assert_allclose(np.asarray(reg)[pos], exp_reg[pos], atol=1e-4)


def test_assignment_no_valid_gt():
    locations, counts = fcos_locations((32, 32), [8, 16, 32, 64, 128])
    soi = np.concatenate(
        [np.broadcast_to(np.array(SIZES_OF_INTEREST[i]), (c, 2)) for i, c in enumerate(counts)]
    )
    G = 3
    labels, reg, _ = fcos_assign_single(
        jnp.asarray(locations),
        jnp.asarray(soi, jnp.float32),
        jnp.zeros((G, 4)),
        jnp.zeros(G, jnp.int32),
        jnp.zeros(G, bool),
        num_classes=NUM_CLASSES,
    )
    assert (np.asarray(labels) == NUM_CLASSES).all()


def test_centerness_targets():
    reg = jnp.array([[1.0, 1.0, 1.0, 1.0], [1.0, 2.0, 4.0, 2.0]])
    got = np.asarray(compute_centerness_targets(reg))
    np.testing.assert_allclose(got, [1.0, np.sqrt((1 / 4) * (2 / 2))], atol=1e-6)


def test_locations_grid():
    locs, counts = fcos_locations((16, 16), [8])
    assert counts == [4]
    np.testing.assert_allclose(
        locs, [[4, 4], [12, 4], [4, 12], [12, 12]]
    )


@pytest.mark.slow  # lowers the full train step at the reference eval shape
def test_assignment_no_lgx4_intermediate_in_train_hlo():
    """Regression guard for the round-5 OOM: the FCOS assignment must not
    materialize a stacked (B, L, G, 4) pair tensor. Under the TPU tiled
    layout the minor dim pads 4 -> 128 lanes (32x memory): at the
    reference B=16 train batch with the mapper's gt pad of 100 the padded
    copy was 19.08 GB on a 16 GB chip — real-COCO training OOMed while
    the gt=24 bench fit. The fix computes four (L, G) planes and
    recomputes the matched pair's lrtb after the argmin; this test pins
    it by asserting the lowered train step contains no
    <B x L x G x 4> tensor type."""
    import re

    import jax
    import optax

    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = make_tiny_cfg()
    cfg.freeze()
    det = build_model(cfg)
    B, H, W, G = 2, 256, 256, 100
    variables = det.init_variables(jax.random.PRNGKey(0), (H, W),
                                   batch_size=B)
    r = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(r.randint(0, 255, (B, H, W, 3)), jnp.uint8),
        "gt_boxes": jnp.asarray(r.rand(B, G, 4).astype(np.float32) * 100),
        "gt_classes": jnp.asarray(r.randint(0, 80, (B, G)), jnp.int32),
        "gt_valid": jnp.ones((B, G), bool),
    }

    def loss_fn(params):
        total, _ = det.loss({**variables, "params": params}, batch)
        return total

    lowered = jax.jit(jax.grad(loss_fn)).lower(variables["params"])
    hlo = lowered.as_text()
    # L = sum of level grid sizes at 256x256 (strides 8..128)
    L = sum((H // s) * (W // s) for s in (8, 16, 32, 64, 128))
    pat = re.compile(rf"{B}x{L}x{G}x4\b")
    bad = sorted(set(pat.findall(hlo)))
    assert not bad, (
        f"lowered train step materializes a (B, L, G, 4) pair tensor "
        f"{bad} — the 4-minor dim pads 32x on TPU (round-5 OOM)")
