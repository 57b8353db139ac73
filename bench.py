"""Headline benchmark: FCOS R-50-FPN inference throughput on one chip at the
reference eval resolution (shortest edge 800, padded to 800x1344 — the
fixed-shape equivalent of the reference's 800x1333 eval,
`slender_det/evaluation/evaluator.py:42-85` protocol: warmup, then
synchronized pure-compute timing).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "train_img_s": N}

vs_baseline is measured against A100_FCOS_R50_IMG_S — detectron2-style FCOS
R-50 inference on A100 (~40 img/s, fp16, batch 1); the BASELINE.md target is
>2x that, i.e. vs_baseline > 2.0. train_img_s is the full FCOS train step
(fwd + bwd + SGD update) throughput at the reference 1x recipe's 16-image
global batch on one chip.
"""

import json
import time

A100_FCOS_R50_IMG_S = 40.0
BATCH = 32
TRAIN_BATCH = 16
ITERS = 10
TRAIN_ITERS = 5


def _bench_train(cfg, det, h, w):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from slenderobjdet_tpu.engine.train_loop import (
        TrainState,
        make_train_step,
    )
    from slenderobjdet_tpu.solver import build_optimizer

    variables = det.init_variables(jax.random.PRNGKey(1), (h, w),
                                   batch_size=TRAIN_BATCH)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    # donate=False: the step runs inside a scan below, where donation of the
    # carried state is neither needed nor allowed
    step = make_train_step(det, tx, donate=False)

    r = np.random.RandomState(1)
    g = 24
    xy = r.rand(TRAIN_BATCH, g, 2).astype(np.float32) * (w / 2)
    wh = r.rand(TRAIN_BATCH, g, 2).astype(np.float32) * 150 + 8
    batch = {
        "image": jnp.asarray(
            r.randint(0, 255, (TRAIN_BATCH, h, w, 3)), jnp.uint8),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], axis=2)),
        "gt_classes": jnp.asarray(r.randint(0, 80, (TRAIN_BATCH, g)), jnp.int32),
        "gt_valid": jnp.ones((TRAIN_BATCH, g), bool),
    }

    # Device throughput: TRAIN_ITERS steps serialized in-graph (scan over
    # the state dependency), one scalar fetch. Separate per-step dispatches
    # pay ~25-28 ms of tunnel enqueue each that does not overlap device
    # compute (same artifact as the inference loop; see note in main()).
    from jax import lax

    def train_program(st, bt):
        def body(s, _):
            s2, m = step(s, bt)
            return s2, m["total_loss"]

        s2, losses = lax.scan(body, st, None, length=TRAIN_ITERS)
        return losses

    import sys
    print(f"[bench] train: compile t={time.perf_counter():.0f}",
          file=sys.stderr)
    timed = jax.jit(train_program)
    losses = np.asarray(timed(state, batch))  # compile + warm
    print(f"[bench] train: timing t={time.perf_counter():.0f}",
          file=sys.stderr)
    assert np.isfinite(losses).all()
    t0 = time.perf_counter()
    reps_outer = 3
    for _ in range(reps_outer):
        losses = np.asarray(timed(state, batch))
    dt = time.perf_counter() - t0
    assert np.isfinite(losses).all()
    return TRAIN_BATCH * TRAIN_ITERS * reps_outer / dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from slenderobjdet_tpu.models import build_model

    cfg = _flagship_cfg()
    h, w = cfg.TPU.TEST_PAD_SHAPE

    r = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(r.randint(0, 255, (BATCH, h, w, 3)), jnp.uint8),
        "scale": jnp.full((BATCH,), 800.0 / 1333.0, jnp.float32),
        "orig_size": jnp.asarray([[1333, 2000]] * BATCH, jnp.float32),
    }

    # NOTE: under the axon TPU tunnel, block_until_ready is a no-op and
    # execution is deferred until a host fetch — a (small) output fetch
    # forces real device work. The timed loop runs ITERS predict calls
    # SERIALIZED IN-GRAPH (lax.scan with a data dependency between
    # iterations) and fetches one scalar: this measures pure device
    # throughput, the number a serving loop on a TPU VM sustains. Measured
    # round 3 (tools/predict_profile.py): each separate dispatch through
    # the tunnel costs ~25-28 ms of host-side enqueue that does NOT overlap
    # device compute — a pure artifact of this environment that per-call
    # protocols (even enqueue-all-then-fetch) cannot hide.
    #
    # The plain XLA backbone is benched; the fused Pallas block path
    # (MODEL.RESNETS.FUSED_BLOCKS) measured ~5% SLOWER end to end (Pallas
    # DMA ceiling, VALIDATION.md round-3 notes) and compiling its whole
    # second program here would double bench wall time — re-race it with
    # `tools/profile_backbone.py --fused` if the toolchain changes.
    from jax import lax

    import sys
    reps_outer = 3
    print(f"[bench] build+init t={time.perf_counter():.0f}", file=sys.stderr)
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0), (h, w),
                                   batch_size=BATCH)

    def timed_program(z, image):
        def body(carry, _):
            b = dict(batch)
            b["image"] = image + carry.astype(image.dtype)
            out = det.predict(variables, b)
            s = jnp.sum(out["scores"][..., :1].astype(jnp.float32))
            return s * 1e-30, ()

        carry, _ = lax.scan(body, z, None, length=ITERS)
        return carry

    timed = jax.jit(timed_program)
    z = jnp.zeros((), jnp.float32)
    img = batch.pop("image")  # passed as an argument, not a baked constant
    print(f"[bench] compile t={time.perf_counter():.0f}", file=sys.stderr)
    float(timed(z, img))  # compile + warm
    print(f"[bench] timing t={time.perf_counter():.0f}", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(reps_outer):
        float(timed(z, img))
    img_s = BATCH * ITERS * reps_outer / (time.perf_counter() - t0)

    # Int8 inference (TPU.INT8_PREDICT, ops/quant.py): same weights, eligible
    # convs on the MXU s8 path. Reported as a secondary number — the headline
    # stays fp until real-data AP parity is shown (the rehearsal A/Bs it;
    # synthetic head-output delta < 0.15 in tests). With STATIC calibrated
    # activation scales (round 5) the quantize pass is pure elementwise and
    # the >=128-ch convs incl. 1x1s join: 312.9 img/s (floor-128) vs 306.5
    # (floor-256) vs 282.0 dynamic vs 255.7 fp on v5e.
    # The committed scales JSON was calibrated by tools/int8_calibrate.py on
    # this bench's deterministic init (PRNGKey(0)) + synthetic batch; scale
    # VALUES only affect clipping, never the timed program structure. If the
    # file is missing, calibrate in-process (one extra jitted compile).
    import os

    from slenderobjdet_tpu.ops import quant

    scales_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "configs", "int8_scales",
                               "fcos_R_50_bench.json")
    if os.path.exists(scales_path):
        scales = quant.load_json_scales(scales_path)
    else:
        print("[bench] int8 scales file missing; calibrating in-process",
              file=sys.stderr)
        calib = jax.jit(quant.traced_calibration(det.predict))
        _, amaxes = calib(variables, dict(batch, image=img))
        scales = {k: float(v) for k, v in amaxes.items()}

    cfg_q = cfg.clone()
    cfg_q.defrost()
    cfg_q.TPU.INT8_PREDICT = True
    cfg_q.freeze()
    det_q = build_model(cfg_q)

    def timed_q(z, image):
        def body(carry, _):
            b = dict(batch)
            b["image"] = image + carry.astype(image.dtype)
            out = det_q.predict(variables, b)
            s = jnp.sum(out["scores"][..., :1].astype(jnp.float32))
            return s * 1e-30, ()

        carry, _ = lax.scan(body, z, None, length=ITERS)
        return carry

    print(f"[bench] int8 compile t={time.perf_counter():.0f}",
          file=sys.stderr)
    timed_q = jax.jit(timed_q)
    with quant.static_scales_scope(scales):
        float(timed_q(z, img))  # traced inside the scope -> static scales baked
    t0 = time.perf_counter()
    for _ in range(reps_outer):
        float(timed_q(z, img))
    int8_img_s = BATCH * ITERS * reps_outer / (time.perf_counter() - t0)

    del batch
    # train measured on the plain backbone (the fused block's custom-VJP
    # backward recomputes via XLA; fused-train is a separate measurement)
    train_img_s = _bench_train(cfg, build_model(cfg), h, w)

    print(json.dumps({
        "metric": "fcos_r50_fpn_inference_800x1344",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_FCOS_R50_IMG_S, 3),
        "train_img_s": round(train_img_s, 2),
        "int8_img_s": round(int8_img_s, 2),
    }))


if __name__ == "__main__":
    main()
