"""Train-step throughput for any config: ONE jitted full training step
(forward + backward + optimizer update), reps serialized in-graph by
threading the TrainState through a lax.scan so the axon tunnel's
per-dispatch overhead amortizes — the same protocol as
tools/family_predict_bench.py, applied to the step the reference times in
its training logs (d2 SimpleTrainer.run_step; reference train_net.py:188-195
trains every family it ships).

Usage:
  python tools/family_train_bench.py configs/fcos/fcos_R_50_FPN_1x.yaml \
      [--batch 8] [--reps 4] [--iters 3] [--size 800 1344] [--gt 100]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--size", type=int, nargs=2, default=(800, 1344))
    ap.add_argument("--gt", type=int, default=100)
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()
    B = args.batch
    H, W = args.size

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.engine.train_loop import TrainState
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    det = build_model(cfg)

    variables = det.init_variables(jax.random.PRNGKey(0), (H, W),
                                   batch_size=B)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )

    r = np.random.RandomState(0)
    g = args.gt
    # realistic gt: ~30 valid boxes/img (COCO mean ~7, padded table of 100)
    xy = (r.rand(B, g, 2) * np.array([H - 64, W - 64])[::-1]).astype(np.float32)
    wh = (r.rand(B, g, 2) * 56 + 8).astype(np.float32)
    valid = np.zeros((B, g), bool)
    valid[:, :30] = True
    img = jnp.asarray(r.randint(0, 255, (B, H, W, 3)), jnp.uint8)
    gt = {
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], axis=2)),
        "gt_classes": jnp.asarray(
            r.randint(0, cfg.MODEL.FCOS.NUM_CLASSES, (B, g)), jnp.int32),
        "gt_valid": jnp.asarray(valid),
    }

    def step(det_state, image, rng):
        import optax

        batch = dict(gt)
        batch["image"] = image
        batch["rng"] = rng

        def loss_fn(params):
            v = {"params": params}
            if det_state.buffers:
                v["buffers"] = det_state.buffers
            return det.loss(v, batch)

        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(det_state.params)
        updates, opt_state = tx.update(grads, det_state.opt_state,
                                       det_state.params)
        params = optax.apply_updates(det_state.params, updates)
        buffers = det_state.buffers
        metrics = dict(metrics)
        updated = metrics.pop("_buffers", None)
        if updated is not None and isinstance(buffers, dict):
            buffers = {**buffers, **updated}
        if (isinstance(buffers, dict) and "loss_normalizer" in buffers
                and "loss_normalizer" in metrics):
            buffers = {**buffers,
                       "loss_normalizer": metrics["loss_normalizer"]}
        return det_state.replace(
            step=det_state.step + 1, params=params, opt_state=opt_state,
            buffers=buffers), total

    def program(det_state, image, rng0):
        def body(carry, i):
            s, _ = step(carry, image, jax.random.fold_in(rng0, i))
            return s, ()

        out, _ = lax.scan(body, det_state, jnp.arange(args.reps))
        return out

    f = jax.jit(program, donate_argnums=(0,))
    rng0 = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state = jax.block_until_ready(f(state, img, rng0))
    print(f"compile+warm {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state = jax.block_until_ready(f(state, img, rng0))
    dt = (time.perf_counter() - t0) / args.iters / args.reps
    assert np.isfinite(float(state.step))
    name = cfg.MODEL.META_ARCHITECTURE
    print(f"TRAIN {name} B={B} {H}x{W}: {dt * 1e3:.1f} ms/step "
          f"({B / dt:.2f} img/s)", flush=True)


if __name__ == "__main__":
    main()
