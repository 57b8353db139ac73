"""Export a trained detector as a portable serving artifact (StableHLO +
weights), loadable without any model-building code — see
slenderobjdet_tpu/serving.py. A TPU-production addition with no reference
counterpart (the reference serves by running torch eval scripts).

Usage:
  python tools/export_serving.py --config configs/fcos/fcos_R_50_FPN_1x.yaml \
      --output /tmp/fcos_serving [--weights ckpt_dir_or_pkl] [--batch 8] \
      [--platforms tpu cpu] [--verify]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--weights", default="",
                    help="orbax checkpoint dir or detectron2 .pkl")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    ap.add_argument("--quantize", action="store_true",
                    help="weight-only per-channel int8 (program dequantizes "
                         "in-graph)")
    ap.add_argument("--int8", action="store_true",
                    help="TPU.INT8_PREDICT: export with the dynamic int8 "
                         "compute path baked into the program (ops/quant.py; "
                         "measured 1.11x FCOS predict on v5e) — distinct "
                         "from --quantize, which only shrinks the weights")
    ap.add_argument("--int8-scales", default="",
                    help="calibrated activation scales JSON "
                         "(tools/int8_calibrate.py); with --int8, bakes the "
                         "STATIC-scale int8 path into the exported program "
                         "(no per-tensor max reductions; measured 1.22x FCOS "
                         "predict on v5e vs 1.11x dynamic)")
    ap.add_argument("--verify", action="store_true",
                    help="reload the artifact and compare one predict")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.serving import export_detector, load_detector

    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if args.int8:
        cfg.TPU.INT8_PREDICT = True
    if args.int8_scales:
        cfg.TPU.INT8_SCALES = args.int8_scales
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    if args.weights:
        from slenderobjdet_tpu.checkpoint import load_model_weights

        params, buffers = load_model_weights(
            args.weights, variables["params"],
            variables.get("buffers", {}))
        variables = dict(variables, params=params, buffers=buffers)

    h, w = cfg.TPU.TEST_PAD_SHAPE
    export_detector(det, variables, args.output, batch_size=args.batch,
                    platforms=args.platforms, quantize=args.quantize)
    print(f"exported {args.config} (batch={args.batch}, {h}x{w}) "
          f"-> {args.output}", flush=True)

    if args.verify:
        predict_fn = load_detector(args.output)
        r = np.random.RandomState(0)
        batch = {
            "image": jnp.asarray(
                r.randint(0, 255, (args.batch, h, w, 3)), jnp.uint8),
            "scale": jnp.full((args.batch,), 1.0, jnp.float32),
            "orig_size": jnp.asarray([[h, w]] * args.batch, jnp.float32),
        }
        out = predict_fn(batch)
        ref = jax.jit(det.predict)(variables, batch)
        atol = 0.05 if args.quantize else 1e-5
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_allclose(
                np.asarray(out[k], np.float32),
                np.asarray(ref[k], np.float32), rtol=1e-5,
                atol=(2.0 if k == "boxes" else atol) if args.quantize
                else 1e-5)
        print("verify: artifact == det.predict OK"
              + (" (int8 tolerance)" if args.quantize else ""), flush=True)


if __name__ == "__main__":
    main()
