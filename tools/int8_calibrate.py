"""Calibrate static int8 activation scales for a config's predict path.

Runs N batches EAGERLY (no jit) through `detector.predict` under
`ops.quant.calibration_scope`, recording each eligible conv's input
max-abs, and writes `{module/path: amax}` JSON for `cfg.TPU.INT8_SCALES`.

With calibrated scales the int8 predict path (cfg.TPU.INT8_PREDICT)
quantizes those convs with a STATIC scalar scale — pure elementwise, no
per-tensor max reduction — which extends the measured int8 win to the 1x1
bottleneck/lateral convs (tools/int8_conv_probe.py `s8+st` column) and
speeds up the 3x3s beyond the dynamic path.

Calibration data: real images via `--dataset <registered name>` (uses the
test loader), or synthetic random-box images (default — fine for timing
probes; use real data before trusting AP).

Usage:
  python tools/int8_calibrate.py configs/fcos/fcos_R_50_FPN_1x.yaml \
      out_scales.json [--batches 8] [--batch 4] [--dataset coco_2017_val] \
      [--weights ckpt_dir_or_pkl] [--opts KEY VALUE ...]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_batches(cfg, n_batches, batch_size, seed=0):
    h, w = cfg.TPU.TEST_PAD_SHAPE
    r = np.random.RandomState(seed)
    for _ in range(n_batches):
        yield {
            "image": jnp.asarray(
                r.randint(0, 255, (batch_size, h, w, 3)), jnp.uint8),
            "scale": jnp.full((batch_size,), 800.0 / 1333.0, jnp.float32),
            "orig_size": jnp.asarray([[1333, 2000]] * batch_size,
                                     jnp.float32),
            "image_size": jnp.asarray([[h, w]] * batch_size, jnp.float32),
        }


def dataset_batches(cfg, name, n_batches, batch_size):
    from slenderobjdet_tpu.data import build_detection_test_loader

    loader = build_detection_test_loader(cfg, name, batch_size=batch_size)
    for i, batch in enumerate(loader):
        if i >= n_batches:
            return
        dev = {
            "image": jnp.asarray(batch["image"]),
            "scale": jnp.asarray(batch["scale"]),
            "orig_size": jnp.asarray(batch["orig_size"]),
        }
        if "image_size" in batch:
            dev["image_size"] = jnp.asarray(batch["image_size"])
        yield dev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("out", help="output scales JSON")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dataset", default="",
                    help="registered dataset for real calibration images")
    ap.add_argument("--weights", default="",
                    help="checkpoint to calibrate (default: random init)")
    ap.add_argument("--margin", type=float, default=1.0,
                    help="multiply recorded amax by this safety factor")
    ap.add_argument("--eager", action="store_true",
                    help="calibrate eagerly (calibration_scope) instead of "
                         "one jitted traced_calibration call per batch")
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.ops.quant import (
        calibration_scope,
        traced_calibration,
    )

    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if args.weights:
        cfg.MODEL.WEIGHTS = args.weights
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    det = build_model(cfg)
    h, w = cfg.TPU.TEST_PAD_SHAPE
    variables = det.init_variables(jax.random.PRNGKey(0), (h, w),
                                   batch_size=args.batch)
    if cfg.MODEL.WEIGHTS:
        from slenderobjdet_tpu.checkpoint.checkpointer import (
            load_model_weights,
        )

        params, buffers = load_model_weights(
            cfg.MODEL.WEIGHTS, variables["params"],
            variables.get("buffers", {}))
        variables = {"params": params}
        if buffers:
            variables["buffers"] = buffers

    batches = (dataset_batches(cfg, args.dataset, args.batches, args.batch)
               if args.dataset else
               synthetic_batches(cfg, args.batches, args.batch))

    sink = {}
    if args.eager:
        with calibration_scope(sink):
            for i, batch in enumerate(batches):
                det.predict(variables, batch)
                print(f"batch {i + 1}: {len(sink)} conv sites recorded",
                      file=sys.stderr)
    else:
        calib = jax.jit(traced_calibration(det.predict))
        for i, batch in enumerate(batches):
            _, amaxes = calib(variables, batch)
            for k, v in amaxes.items():
                sink[k] = max(sink.get(k, 0.0), float(v))
            print(f"batch {i + 1}: {len(sink)} conv sites recorded",
                  file=sys.stderr)

    scales = {k: v * args.margin for k, v in sorted(sink.items())}
    with open(args.out, "w") as f:
        json.dump(scales, f, indent=1)
    print(f"wrote {len(scales)} scales to {args.out}")


if __name__ == "__main__":
    main()
