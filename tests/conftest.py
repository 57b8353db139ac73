"""Test harness config: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPUs (SURVEY.md §4).

Must run before any jax usage. The environment's sitecustomize pre-imports
jax with the axon TPU platform, so setting the env var alone is not enough —
we also flip the config flag."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


def make_tiny_cfg():
    """Small FCOS R-18 config used by model smoke tests."""
    from slenderobjdet_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone_use_p5"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="session")
def tiny_cfg():
    cfg = make_tiny_cfg()
    cfg.freeze()
    return cfg


@pytest.fixture(scope="session")
def tiny_fcos(tiny_cfg):
    """(detector, variables) pair shared across model tests (init is the
    slowest step on the single-core CI CPU)."""
    import jax as _jax

    from slenderobjdet_tpu.models import build_model

    det = build_model(tiny_cfg)
    variables = det.init_variables(_jax.random.PRNGKey(0), (64, 64), batch_size=1)
    return det, variables
