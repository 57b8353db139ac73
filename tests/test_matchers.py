import numpy as np
import jax.numpy as jnp

from slenderobjdet_tpu.models.matchers import iou_matcher, topk_matcher
from slenderobjdet_tpu.structures import boxes as B


def oracle_matcher(anchors, gts, thresholds, labels, low_quality):
    iou = np.asarray(B.pairwise_iou(gts, anchors))
    if len(gts) == 0:
        return np.zeros(len(anchors), np.int32), np.full(len(anchors), labels[0])
    vals = iou.max(0)
    idx = iou.argmax(0)
    out = np.full(len(anchors), labels[0])
    for lo, lab in zip(thresholds, labels[1:]):
        out[vals >= lo] = lab
    if low_quality:
        for g in range(len(gts)):
            best = iou[g].max()
            if best > 0:
                out[iou[g] == best] = labels[-1]
    return idx, out


def test_iou_matcher_matches_oracle(rng):
    anchors = np.concatenate(
        [rng.rand(64, 2) * 80, rng.rand(64, 2) * 40 + 10], axis=1
    ).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2]
    gts = np.array(
        [[5, 5, 40, 40], [50, 50, 90, 95], [20, 60, 70, 80]], np.float32
    )
    thresholds, labels = [0.4, 0.5], [0, -1, 1]
    exp_idx, exp_lab = oracle_matcher(anchors, gts, thresholds, labels, True)

    idx, lab = iou_matcher(
        jnp.asarray(anchors), jnp.asarray(gts), jnp.ones(3, bool),
        thresholds, labels,
    )
    np.testing.assert_array_equal(np.asarray(lab), exp_lab)
    # matched idx only meaningful where a match occurred
    matched = exp_lab == 1
    np.testing.assert_array_equal(np.asarray(idx)[matched], exp_idx[matched])


def test_iou_matcher_padded_gt_ignored(rng):
    anchors = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    gts = np.array([[0, 0, 10, 10], [0, 0, 0, 0]], np.float32)  # second = pad
    idx, lab = iou_matcher(
        jnp.asarray(anchors), jnp.asarray(gts),
        jnp.array([True, False]), [0.4, 0.5], [0, -1, 1],
    )
    assert int(lab[0]) == 1
    assert int(lab[1]) == 0


def test_iou_matcher_no_gt():
    anchors = np.array([[0, 0, 10, 10]], np.float32)
    gts = np.zeros((3, 4), np.float32)
    _, lab = iou_matcher(
        jnp.asarray(anchors), jnp.asarray(gts), jnp.zeros(3, bool),
        [0.4, 0.5], [0, -1, 1],
    )
    assert int(lab[0]) == 0


def test_topk_matcher_promotes_topk(rng):
    # anchors with IoU below threshold still become fg if in a gt's top-k
    anchors = np.array(
        [[0, 0, 8, 8], [1, 1, 11, 11], [30, 30, 40, 40]], np.float32
    )
    gts = np.array([[0, 0, 10, 10]], np.float32)
    idx, lab = topk_matcher(
        jnp.asarray(anchors), jnp.asarray(gts), jnp.ones(1, bool),
        [0.4, 0.5], [0, -1, 1], k=2,
    )
    assert int(lab[0]) == 1 and int(lab[1]) == 1  # top-2 for the gt
    assert int(lab[2]) == 0


def test_chunked_matcher_bitwise_equals_oneshot():
    """chunk > 0 must implement the identical algorithm: same matched_idx
    and labels as the one-shot matcher, including cross-chunk low-quality
    ties, invalid gt rows, non-divisible N (padding), and duplicate-IoU
    ties. Boxes use INTEGER pixel coordinates so every intersection/area/
    union is exactly representable in fp32 and the IoU is one correctly
    rounded division -> bitwise identical across differently-compiled
    programs. (With arbitrary float coords two XLA programs may associate
    a1+a2-inter differently and disagree by 1 ulp at exact-tie
    boundaries; the chunked implementation is internally consistent by
    construction - see _matcher_core_chunked.)"""
    for seed in (0, 7, 12, 42):
        rng = np.random.RandomState(seed)
        N, G = 1000, 17
        anchors = np.stack([
            rng.randint(0, 200, N), rng.randint(0, 200, N),
            rng.randint(210, 410, N), rng.randint(210, 410, N)],
            axis=1).astype(np.float32)
        # duplicated anchors guarantee exact-IoU ties that must resolve
        # identically chunked and not
        anchors[500:520] = anchors[0:20]
        gts = np.stack([
            rng.randint(0, 200, G), rng.randint(0, 200, G),
            rng.randint(210, 410, G), rng.randint(210, 410, G)],
            axis=1).astype(np.float32)
        valid = rng.rand(G) > 0.3

        for lq in (True, False):
            ref_idx, ref_lab = iou_matcher(
                jnp.asarray(anchors), jnp.asarray(gts), jnp.asarray(valid),
                [0.3, 0.7], [0, -1, 1], allow_low_quality_matches=lq)
            for chunk in (128, 333, 999, 1000, 4096):
                idx, lab = iou_matcher(
                    jnp.asarray(anchors), jnp.asarray(gts),
                    jnp.asarray(valid), [0.3, 0.7], [0, -1, 1],
                    allow_low_quality_matches=lq, chunk=chunk)
                np.testing.assert_array_equal(
                    np.asarray(idx), np.asarray(ref_idx),
                    err_msg=str((seed, lq, chunk)))
                np.testing.assert_array_equal(
                    np.asarray(lab), np.asarray(ref_lab),
                    err_msg=str((seed, lq, chunk)))

    # all-invalid gt: everything background either way
    _, lab = iou_matcher(jnp.asarray(anchors), jnp.asarray(gts),
                         jnp.zeros(G, bool), [0.3, 0.7], [0, -1, 1],
                         chunk=128)
    assert (np.asarray(lab) == 0).all()
