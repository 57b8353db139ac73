"""Trainable BatchNorm: torch-oracle semantics + train-step write-back.

The reference trains real BN in the hourglass backbone
(`/root/reference/slender_det/modeling/backbone/hourglass.py:16`, norm="BN")
and the VT blocks force SyncBN (`slender_det/layers/visual_transformer.py:
17-23`). layers.BatchNorm must match torch.nn.BatchNorm2d bit-for-bit-ish in
both train (batch stats + running-stat EMA with unbiased var) and eval
(running stats) modes, and the running stats must flow through
apply_train -> metrics["_buffers"] -> TrainState.buffers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from slenderobjdet_tpu.models.layers import (
    BatchNorm, apply_train, get_norm, has_batch_stats)


def _torch_reference(x_np, steps_inputs, scale, bias):
    bn = torch.nn.BatchNorm2d(x_np.shape[-1], momentum=0.1, eps=1e-5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
    bn.train()
    outs = []
    for s in steps_inputs:
        xt = torch.from_numpy(s).permute(0, 3, 1, 2)  # NHWC -> NCHW
        outs.append(bn(xt).permute(0, 2, 3, 1).detach().numpy())
    bn.eval()
    xe = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    eval_out = bn(xe).permute(0, 2, 3, 1).detach().numpy()
    return (outs, eval_out, bn.running_mean.numpy(), bn.running_var.numpy())


def test_batchnorm_matches_torch_train_and_eval():
    r = np.random.RandomState(0)
    C = 6
    steps = [r.randn(4, 5, 7, C).astype(np.float32) * 2.0 + i
             for i in range(3)]
    scale = r.rand(C).astype(np.float32) + 0.5
    bias = r.randn(C).astype(np.float32)

    mod = BatchNorm(features=C)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(steps[0]))
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "buffers": variables["buffers"],
    }
    assert has_batch_stats(variables["buffers"])

    torch_outs, torch_eval, t_mean, t_var = _torch_reference(
        steps[0], steps, scale, bias)

    buffers = variables["buffers"]
    for i, s in enumerate(steps):
        out, buffers = apply_train(
            mod, {"params": variables["params"], "buffers": buffers},
            jnp.asarray(s))
        np.testing.assert_allclose(np.asarray(out), torch_outs[i],
                                   rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(buffers["mean"]), t_mean,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(buffers["var"]), t_var,
                               rtol=1e-5, atol=1e-6)

    # eval: plain apply (no mutation) uses the running statistics
    eval_out = mod.apply(
        {"params": variables["params"], "buffers": buffers},
        jnp.asarray(steps[0]))
    np.testing.assert_allclose(np.asarray(eval_out), torch_eval,
                               rtol=1e-4, atol=1e-4)


def test_get_norm_routes_bn_to_trainable():
    for name in ("BN", "SyncBN"):
        m = get_norm(name, 8)
        assert isinstance(m, BatchNorm)


def test_frozen_bn_has_no_batch_stats():
    m = get_norm("FrozenBN", 8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    assert not has_batch_stats(v["buffers"])
    # and apply_train takes the fast path (no updated buffers)
    out, updated = apply_train(m, v, jnp.zeros((1, 4, 4, 8)))
    assert updated is None


def test_train_step_writes_back_running_stats():
    """End-to-end: a CornerNet (hourglass, norm=BN) train step updates the
    BN running statistics inside TrainState.buffers."""
    import optax

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.engine.train_loop import (
        create_train_state, make_train_step)
    from slenderobjdet_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CornerNet"
    cfg.MODEL.CORNER_NET.NUM_CLASSES = 4
    cfg.MODEL.HOURGLASS.NORM = "BN"
    cfg.MODEL.HOURGLASS.STACKS = 1
    cfg.MODEL.HOURGLASS.OUT_FEATURES = ["hourglass2"]
    cfg.MODEL.CORNER_NET.IN_FEATURES = ["hourglass2"]
    cfg.MODEL.HOURGLASS.STEM_OUT_CHANNELS = 16
    cfg.MODEL.HOURGLASS.DEPTH_BLOCK = 2
    cfg.MODEL.HOURGLASS.CHANNELS_BLOCK = [16, 16, 24]
    cfg.MODEL.HOURGLASS.NUM_CONV_BLOCK = [1, 1, 1]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()

    det = build_model(cfg)
    tx = optax.sgd(1e-4)
    state = create_train_state(det, tx, jax.random.PRNGKey(0), (64, 64), 2)
    assert has_batch_stats(state.buffers), "hourglass must carry BN stats"

    def stats_snapshot(buffers):
        leaves = []

        def walk(tree):
            if isinstance(tree, dict):
                if "mean" in tree and "var" in tree:
                    leaves.append(np.asarray(tree["mean"]))
                    return
                for v in tree.values():
                    walk(v)

        walk(buffers)
        return leaves

    before = stats_snapshot(state.buffers)
    assert before and all(np.allclose(m, 0.0) for m in before)

    r = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(r.randint(0, 255, (2, 64, 64, 3)), jnp.uint8),
        "gt_boxes": jnp.asarray([[[4., 4., 30., 20.]], [[8., 8., 40., 40.]]]),
        "gt_classes": jnp.zeros((2, 1), jnp.int32),
        "gt_valid": jnp.ones((2, 1), bool),
    }
    step = make_train_step(det, tx)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert "_buffers" not in metrics

    after = stats_snapshot(new_state.buffers)
    changed = [not np.allclose(b, a) for b, a in zip(before, after)]
    assert all(changed), "every BN running mean must update after one step"


def test_precise_bn_stats_plain_average():
    """precise_bn_stats must set running stats to the PLAIN average of the
    per-batch statistics (batch-biased-normalization / unbiased-running
    split follows torch), regardless of the buffers' starting values —
    the fvcore update_bn_stats semantics of the reference's PreciseBN hook
    (reference engine/defaults.py:104-112)."""
    from slenderobjdet_tpu.models.layers import precise_bn_stats

    r = np.random.RandomState(1)
    C = 5
    mod = BatchNorm(features=C)
    x0 = r.randn(3, 4, 4, C).astype(np.float32)
    variables = dict(mod.init(jax.random.PRNGKey(0), jnp.asarray(x0)))
    # poison the starting stats: the result must not depend on them
    variables["buffers"] = {"mean": jnp.full((C,), 7.0),
                            "var": jnp.full((C,), 9.0)}

    batches = [r.randn(3, 4, 4, C).astype(np.float32) * (i + 1) + i
               for i in range(4)]
    got = precise_bn_stats(mod, variables, batches)

    means = [b.reshape(-1, C).mean(0) for b in batches]
    uvars = [b.reshape(-1, C).var(0, ddof=1) for b in batches]
    np.testing.assert_allclose(np.asarray(got["mean"]),
                               np.mean(means, axis=0), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["var"]),
                               np.mean(uvars, axis=0), rtol=2e-5, atol=2e-5)


def test_precise_bn_noop_without_batch_stats():
    from slenderobjdet_tpu.models.layers import FrozenBatchNorm, precise_bn_stats

    mod = FrozenBatchNorm(features=3)
    x = np.zeros((2, 4, 4, 3), np.float32)
    variables = dict(mod.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    got = precise_bn_stats(mod, variables, [x])
    assert set(got.keys()) == {"scale", "bias"}


@pytest.mark.slow
def test_trainer_runs_precise_bn_before_eval(tmp_path):
    """TEST.PRECISE_BN.ENABLED recomputes the BN buffers inside
    BaseTrainer.test (and keeps them on the trainer state)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_coco_json

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.engine.trainer import BaseTrainer

    gt_json, image_root = make_coco_json(tmp_path, num_images=4,
                                         img_hw=(64, 64))
    name = "synth_pbn"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, gt_json, image_root)

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CornerNet"
    cfg.MODEL.HOURGLASS.STACKS = 1
    cfg.MODEL.HOURGLASS.DEPTH_BLOCK = 3
    cfg.MODEL.HOURGLASS.CHANNELS_BLOCK = [32, 32, 48, 48]
    cfg.MODEL.HOURGLASS.NUM_CONV_BLOCK = [1, 1, 1, 1]
    cfg.MODEL.HOURGLASS.STEM_OUT_CHANNELS = 16
    cfg.MODEL.HOURGLASS.OUT_FEATURES = ["hourglass2"]
    cfg.MODEL.CORNER_NET.IN_FEATURES = ["hourglass2"]
    cfg.MODEL.CORNER_NET.NUM_CLASSES = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = ()          # eval loop empty; PreciseBN still runs
    cfg.SOLVER.MAX_ITER = 1
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.TEST.PRECISE_BN.ENABLED = True
    cfg.TEST.PRECISE_BN.NUM_ITER = 2
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    trainer = BaseTrainer(cfg)
    before = jax.device_get(trainer.state.buffers)
    trainer.test()
    after = jax.device_get(trainer.state.buffers)

    def bn_leaves(tree, out):
        if isinstance(tree, dict):
            if "mean" in tree and "var" in tree:
                out.append(tree)
            else:
                for v in tree.values():
                    bn_leaves(v, out)
        return out

    b, a = bn_leaves(before, []), bn_leaves(after, [])
    assert b and len(b) == len(a)
    changed = any(not np.allclose(x["mean"], y["mean"]) for x, y in zip(b, a))
    assert changed, "PreciseBN did not update any BN running stats"
    for leaf in a:
        assert np.isfinite(leaf["mean"]).all()
        assert np.isfinite(leaf["var"]).all() and (leaf["var"] >= 0).all()
