import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.checkpoint import DetectionCheckpointer, import_d2_weights
from slenderobjdet_tpu.engine.train_loop import TrainState
from slenderobjdet_tpu.solver import build_optimizer

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow


def test_save_load_roundtrip(tmp_path, tiny_cfg, tiny_fcos):
    det, variables = tiny_fcos
    tx = build_optimizer(tiny_cfg, variables["params"])
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    ckpt = DetectionCheckpointer(str(tmp_path))
    ckpt.save("model_0000007", state)
    assert ckpt.has_checkpoint()

    # perturb then restore
    zeroed = state.replace(
        step=jnp.asarray(0, jnp.int32),
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params),
    )
    restored = ckpt.load(ckpt.get_checkpoint_file(), zeroed)
    assert int(np.asarray(restored.step if hasattr(restored, "step") else restored["step"])) == 7
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(
        restored.params if hasattr(restored, "params") else restored["params"]
    )[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))


def make_fake_d2_resnet18_fpn_statedict(params, buffers):
    """Build a d2-style state dict covering our R18-FPN tree with
    recognizable values."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, flax_kernel_shape, bias=False):
        h, w, i, o = flax_kernel_shape
        sd[name + ".weight"] = rng.randn(o, i, h, w).astype(np.float32)
        if bias:
            sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def norm(name, c):
        sd[name + ".norm.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".norm.bias"] = rng.randn(c).astype(np.float32)
        sd[name + ".norm.running_mean"] = rng.randn(c).astype(np.float32)
        sd[name + ".norm.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    bu = params["backbone"]["bottom_up"]
    conv("backbone.bottom_up.stem.conv1", bu["stem_conv1"]["kernel"].shape)
    norm("backbone.bottom_up.stem.conv1", bu["stem_conv1"]["kernel"].shape[-1])
    for block_name, block in bu.items():
        if not block_name.startswith("res"):
            continue
        stage, idx = block_name.split("_")
        d2block = f"backbone.bottom_up.{stage}.{idx}"
        for conv_name in block:
            shape = block[conv_name]["kernel"].shape
            conv(f"{d2block}.{conv_name}", shape)
            norm(f"{d2block}.{conv_name}", shape[-1])
    # fpn convs: d2 numbers by stage (res3,4,5 -> 3,4,5)
    for i, stage in enumerate([3, 4, 5]):
        conv(f"backbone.fpn_lateral{stage}",
             params["backbone"][f"fpn_lateral{i}"]["kernel"].shape, bias=True)
        conv(f"backbone.fpn_output{stage}",
             params["backbone"][f"fpn_output{i}"]["kernel"].shape, bias=True)
    conv("backbone.top_block.p6", params["backbone"]["top_p6"]["kernel"].shape,
         bias=True)
    conv("backbone.top_block.p7", params["backbone"]["top_p7"]["kernel"].shape,
         bias=True)
    return sd


def test_d2_weight_import(tiny_fcos):
    det, variables = tiny_fcos
    params = jax.device_get(variables["params"])
    buffers = jax.device_get(variables.get("buffers", {}))
    sd = make_fake_d2_resnet18_fpn_statedict(params, buffers)

    new_params, new_buffers = import_d2_weights(sd, params, buffers)

    # conv kernels transposed OIHW -> HWIO
    got = new_params["backbone"]["bottom_up"]["res2_0"]["conv1"]["kernel"]
    want = sd["backbone.bottom_up.res2.0.conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want)

    # fpn lateral with stage->index renumbering
    got = new_params["backbone"]["fpn_lateral0"]["kernel"]
    want = sd["backbone.fpn_lateral3.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want)

    # frozen bn folded: scale = w/sqrt(var+eps), bias = b - mean*scale
    s = sd["backbone.bottom_up.res2.0.conv1.norm.weight"]
    v = sd["backbone.bottom_up.res2.0.conv1.norm.running_var"]
    m = sd["backbone.bottom_up.res2.0.conv1.norm.running_mean"]
    b = sd["backbone.bottom_up.res2.0.conv1.norm.bias"]
    scale = s / np.sqrt(v + 1e-5)
    bias = b - m * scale
    got_s = new_buffers["backbone"]["bottom_up"]["res2_0"]["FrozenBatchNorm_0"]["scale"]
    got_b = new_buffers["backbone"]["bottom_up"]["res2_0"]["FrozenBatchNorm_0"]["bias"]
    np.testing.assert_allclose(np.asarray(got_s), scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_b), bias, rtol=1e-5)

    # shortcut norm (basic block -> highest index 2)
    got_s = new_buffers["backbone"]["bottom_up"]["res3_0"]["FrozenBatchNorm_2"]["scale"]
    s = sd["backbone.bottom_up.res3.0.shortcut.norm.weight"]
    v = sd["backbone.bottom_up.res3.0.shortcut.norm.running_var"]
    np.testing.assert_allclose(np.asarray(got_s), s / np.sqrt(v + 1e-5), rtol=1e-6)

    # head params untouched
    h0 = jax.tree_util.tree_leaves(params["head"])[0]
    h1 = jax.tree_util.tree_leaves(new_params["head"])[0]
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1))


def test_d2_r50_pkl_end_to_end(tmp_path):
    """Full R-50-FPN pkl import: fabricate a complete detectron2-format
    state dict, write it as .pkl, load through MODEL.WEIGHTS machinery, and
    run a forward pass (integration test of the real weight-loading path)."""
    import pickle

    import jax
    import jax.numpy as jnp

    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.checkpoint.checkpointer import load_model_weights
    from slenderobjdet_tpu.models import build_model

    cfg = make_tiny_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    params = jax.device_get(variables["params"])
    buffers = jax.device_get(variables.get("buffers", {}))

    sd = make_fake_d2_resnet18_fpn_statedict(params, buffers)  # generic walker
    # scale weights to a realistic magnitude so the 50-layer forward pass
    # stays finite (std-1 kernels explode activations; that's physics, not
    # an importer property)
    for k in sd:
        if k.endswith(".weight") and sd[k].ndim == 4:
            sd[k] = sd[k] * 0.05
    pkl = tmp_path / "r50.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)

    new_params, new_buffers = load_model_weights(str(pkl), params, buffers)
    # bottleneck conv3 kernels came through (R-50-only layer)
    got = new_params["backbone"]["bottom_up"]["res2_0"]["conv3"]["kernel"]
    want = sd["backbone.bottom_up.res2.0.conv3.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want)
    # shortcut norm in a bottleneck block -> index 3
    assert "FrozenBatchNorm_3" in new_buffers["backbone"]["bottom_up"]["res2_0"]

    # the imported weights run a forward pass
    loaded = {"params": new_params, "buffers": new_buffers}
    out = det.predict(loaded, {
        "image": jnp.zeros((1, 64, 64, 3), jnp.uint8),
        "scale": jnp.ones((1,), jnp.float32),
        "orig_size": jnp.asarray([[64.0, 64.0]]),
    })
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_bias_lr_factor_scales_bias_updates(tiny_cfg, tiny_fcos):
    """SOLVER.BIAS_LR_FACTOR must scale the bias group's update (d2 per-group
    LR parity, reference solver/build.py group construction)."""
    import jax
    import jax.numpy as jnp

    det, variables = tiny_fcos
    params = variables["params"]
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def one_update(factor):
        cfg = tiny_cfg.clone()
        cfg.defrost()
        cfg.SOLVER.BIAS_LR_FACTOR = factor
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.MODEL.BACKBONE.FREEZE_AT = 0
        cfg.freeze()
        tx = build_optimizer(cfg, params)
        updates, _ = tx.update(grads, tx.init(params), params)
        return updates

    u1 = one_update(1.0)
    u2 = one_update(2.0)
    flat1 = jax.tree_util.tree_flatten_with_path(u1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(u2)[0]
    checked_bias = checked_kernel = False
    for (path1, leaf1), (path2, leaf2) in zip(flat1, flat2):
        name = str(path1[-1])
        if "bias" in name:
            assert jnp.allclose(leaf2, leaf1 * 2.0, rtol=1e-6), path1
            checked_bias = True
        elif "kernel" in name:
            assert jnp.allclose(leaf2, leaf1, rtol=1e-6), path1
            checked_kernel = True
    assert checked_bias and checked_kernel


def test_async_save_roundtrip(tmp_path):
    """blocking=False saves in a background thread; has_checkpoint/load
    join the in-flight save and restore the exact state."""
    import jax.numpy as jnp

    from slenderobjdet_tpu.checkpoint.checkpointer import DetectionCheckpointer

    ck = DetectionCheckpointer(str(tmp_path / "ck"))
    state = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
             "step": jnp.asarray(7, jnp.int32)}
    ck.save("model_async", state, blocking=False)
    assert ck.has_checkpoint()          # joins the background save
    got = ck.load(ck.get_checkpoint_file(), state)
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.asarray(state["w"]))
    assert int(np.asarray(got["step"])) == 7


def test_async_periodic_save_survives_donation(tmp_path):
    """Regression: the train step donates its input state, so a background
    save that fetches it lazily can hit deleted buffers once the next step
    runs. The checkpointer snapshots with an on-device copy; the PERIODIC
    (non-blocking) checkpoint must be loadable and carry the right step."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import jax
    from conftest import make_tiny_cfg
    from synthetic import make_coco_json

    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.engine.trainer import BaseTrainer

    gt_json, image_root = make_coco_json(tmp_path, num_images=4,
                                         img_hw=(64, 64))
    name = "synth_async_ck"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, gt_json, image_root)

    cfg = make_tiny_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = ()
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.CHECKPOINT_PERIOD = 2     # periodic save -> async path
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    trainer = BaseTrainer(cfg)
    state = trainer.train()
    trainer.checkpointer.wait()          # re-raises async failures

    mid = trainer.checkpointer.load(
        os.path.join(cfg.OUTPUT_DIR, "model_0000002"), trainer.state)
    assert int(np.asarray(mid.step)) == 2
    final = trainer.checkpointer.load(
        trainer.checkpointer.get_checkpoint_file(), trainer.state)
    assert int(np.asarray(final.step)) == 4
