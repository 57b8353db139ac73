"""Serving export: freeze a detector's `predict` into a portable StableHLO
artifact plus a weights blob.

The reference has no deployment story beyond running torch eval scripts on
GPUs — this is a TPU-production addition: `jax.export` serializes the jitted
fixed-shape `predict` program (the same one bench.py times) to StableHLO
with versioned custom-call compatibility guarantees, so a serving binary can
load and run it WITHOUT the model-building Python (no configs, no Flax, no
slenderobjdet_tpu import — only jax + the artifact).

Weights travel next to the program as a msgpack tree (`flax.serialization`)
rather than baked-in constants: a 100 MB weight constant makes XLA
constant-fold at compile time (measured 369 s for a baked 103 MB input in
round 3, VALIDATION.md) and would force re-export to swap checkpoints.

Artifact layout (a directory):
  model.stablehlo   versioned jax.export blob of predict(variables, batch)
  params.msgpack    variables tree (params + buffers)
  meta.json         batch/image shape, platforms, output names
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp


def _batch_spec(batch_size: int, h: int, w: int) -> Dict[str, Any]:
    return {
        "image": jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8),
        "scale": jax.ShapeDtypeStruct((batch_size,), jnp.float32),
        "orig_size": jax.ShapeDtypeStruct((batch_size, 2), jnp.float32),
    }


def export_detector(det, variables, path: str, batch_size: int = 1,
                    image_hw=None,
                    platforms: Sequence[str] = ("tpu", "cpu")) -> str:
    """Serialize `det.predict` (fixed shapes) + `variables` under `path`."""
    from flax import serialization
    from jax import export as jexport

    h, w = image_hw or det.cfg.TPU.TEST_PAD_SHAPE
    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        variables)
    exp = jexport.export(jax.jit(det.predict),
                         platforms=list(platforms))(
        var_spec, _batch_spec(batch_size, h, w))

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(variables))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({
            "batch_size": batch_size,
            "image_hw": [h, w],
            "platforms": list(platforms),
            "inputs": ["image(uint8 BHWC)", "scale(f32 B)",
                       "orig_size(f32 Bx2)"],
            "outputs": ["boxes", "scores", "classes", "valid"],
        }, f, indent=2)
    return path


def load_detector(path: str) -> Callable[[Dict[str, jnp.ndarray]],
                                         Dict[str, jnp.ndarray]]:
    """Load a serving artifact; returns predict_fn(batch) -> detections.

    Needs only jax + flax.serialization — no model code, no config."""
    from flax import serialization
    from jax import export as jexport

    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        variables = serialization.msgpack_restore(f.read())

    def predict_fn(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return exp.call(variables, batch)

    return predict_fn
