"""AblationMetaArch: every (head x feature-adaption) combination must train
(finite loss + gradients through the adaption path) and predict fixed-shape
detections — the paper's ablation matrix as a test grid."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slenderobjdet_tpu.models import build_model

from test_model_fcos import make_batch

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow

ADAPTIONS = ["Empty", "Unsupervised Offset", "Supervised Offset",
             "Split Unsup Offset"]
HEADS = ["LRTBHead", "PointSetHead", "AnchorHead"]


def ablation_cfg(head, adaption):
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = "AblationMetaArch"
    cfg.MODEL.META_ARCH.NAME = head
    cfg.MODEL.META_ARCH.FEAT_ADAPTION = adaption
    cfg.MODEL.META_ARCH.STACK_CONVS = 2
    cfg.MODEL.META_ARCH.FEAT_CHANNELS = 64
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.freeze()
    return cfg


@pytest.mark.parametrize("head", HEADS)
@pytest.mark.parametrize("adaption", ADAPTIONS)
def test_ablation_grid(head, adaption):
    cfg = ablation_cfg(head, adaption)
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total)), (head, adaption, metrics)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    out = det.predict(variables, batch)
    assert out["boxes"].shape == (1, det.max_dets, 4)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_adaption_offsets_receive_grads():
    cfg = ablation_cfg("LRTBHead", "Unsupervised Offset")
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()

    def loss_fn(params):
        return det.loss({**variables, "params": params}, batch)

    (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    off_g = grads["head"]["offset_conv"]["kernel"]
    assert float(jnp.abs(off_g).sum()) > 0


def test_lrtb_topk_head():
    cfg = ablation_cfg("LRTBTopkHead", "Empty")
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    batch = make_batch()
    total, metrics = det.loss(variables, batch)
    assert np.isfinite(float(total))
    out = det.predict(variables, batch)
    assert np.isfinite(np.asarray(out["boxes"])).all()
