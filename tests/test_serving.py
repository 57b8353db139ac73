"""Serving artifact (slenderobjdet_tpu/serving.py): export -> reload ->
bit-identical predict, loadable without model code."""

import numpy as np
import jax
import jax.numpy as jnp

from slenderobjdet_tpu.serving import export_detector, load_detector


def _batch(B, H, W, seed=0):
    r = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(r.randint(0, 255, (B, H, W, 3)), jnp.uint8),
        "scale": jnp.full((B,), 1.0, jnp.float32),
        "orig_size": jnp.asarray([[H, W]] * B, jnp.float32),
    }


def test_export_roundtrip(tiny_fcos, tmp_path):
    det, variables = tiny_fcos
    B, H, W = 2, 64, 64
    path = export_detector(det, variables, str(tmp_path / "art"),
                           batch_size=B, image_hw=(H, W),
                           platforms=["cpu"])
    predict_fn = load_detector(path)
    batch = _batch(B, H, W)
    out = predict_fn(batch)
    ref = jax.jit(det.predict)(variables, batch)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]))
    # the loader must not need the model/config stack: it reads only the
    # three artifact files
    import os
    assert sorted(os.listdir(path)) == [
        "meta.json", "model.stablehlo", "params.msgpack"]
