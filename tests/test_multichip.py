"""Multi-device sharding: the full train step on 2-D (data x model) meshes
using the 8 virtual CPU devices from conftest."""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_channel_sharding_rule():
    import jax
    import numpy as np

    from slenderobjdet_tpu.parallel import make_mesh
    from slenderobjdet_tpu.parallel.mesh import channel_sharded_params

    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    params = {
        "wide_conv": np.zeros((3, 3, 256, 256), np.float32),
        "narrow_head": np.zeros((3, 3, 256, 4), np.float32),
        "bias": np.zeros((256,), np.float32),
    }
    placed = channel_sharded_params(params, mesh)
    # wide conv sharded over 'model' on the output-channel dim
    assert "model" in str(placed["wide_conv"].sharding.spec)
    # narrow heads and biases replicated
    assert "model" not in str(placed["narrow_head"].sharding.spec)
    assert "model" not in str(placed["bias"].sharding.spec)
