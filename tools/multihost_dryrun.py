#!/usr/bin/env python
"""Multi-host (multi-process) dryrun: prove the jax.distributed path works
end-to-end on CPU without TPU pods.

Parent mode (default) spawns N worker processes (default 2), each with its
own 4-device virtual CPU backend, joined into ONE 8-device global mesh via
`jax.distributed.initialize` (gloo CPU collectives). Each worker:

  1. builds the tiny flagship FCOS (R-18) and runs ONE full SPMD train step
     on the global (data=8) mesh, with its process-local slice of a shared
     deterministic global batch assembled through
     `jax.make_array_from_process_local_data` (parallel.multihost.put_global);
  2. evaluates a disjoint strided subset of a synthetic COCO dataset and
     calls COCOEvaluator.evaluate(), which gathers predictions across
     processes (parallel.multihost.all_gather_objects — the counterpart of
     the reference's `comm.gather`,
     /root/reference/slender_det/evaluation/coco_evaluation.py:81-87).

The parent then re-runs the identical work in ONE process with 8 virtual
devices and asserts: same loss (same global program, same global batch) and
the same AP (same total prediction set). This is the operational test the
reference only had as `train_multi_nodes.sh`.

Usage:
  python tools/multihost_dryrun.py [--num-processes 2] [--local-devices 4]
  # internal: --worker --process-id P ... (spawned by the parent)
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMG_HW = (64, 64)
NUM_GT = 8


# --------------------------------------------------------------- synthetic
def write_gt_json(path, num_images=8, num_cats=3, seed=0):
    """Minimal COCO instances json (no image files needed: the evaluator
    reads only the json)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    h, w = 120, 160
    images, annotations, categories = [], [], []
    cat_ids = [3 * i + 1 for i in range(num_cats)]
    for i, cid in enumerate(cat_ids):
        categories.append({"id": cid, "name": f"cat{i}"})
    ann_id = 1
    for img_id in range(1, num_images + 1):
        images.append({"id": img_id, "file_name": f"{img_id}.png",
                       "height": h, "width": w})
        for _ in range(rng.randint(1, 4)):
            bw, bh = int(rng.randint(20, 50)), int(rng.randint(10, 50))
            x, y = int(rng.randint(0, w - bw)), int(rng.randint(0, h - bh))
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": int(rng.choice(cat_ids)),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
            })
            ann_id += 1
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)


def make_global_batch(batch_size):
    """Deterministic synthetic train batch — identical in every process."""
    import numpy as np

    h, w = IMG_HW
    r = np.random.RandomState(0)
    xy = r.rand(batch_size, NUM_GT, 2).astype(np.float32) * 30
    wh = r.rand(batch_size, NUM_GT, 2).astype(np.float32) * 20 + 4
    return {
        "image": r.randint(0, 255, (batch_size, h, w, 3)).astype(np.uint8),
        "gt_boxes": np.concatenate([xy, xy + wh], axis=2),
        "gt_classes": r.randint(0, 80, (batch_size, NUM_GT)).astype(np.int32),
        "gt_valid": np.ones((batch_size, NUM_GT), bool),
    }


# ------------------------------------------------------------------ worker
def run_worker(pid, nproc, port, local_devices, workdir):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from slenderobjdet_tpu.engine.train_loop import TrainState, make_train_step
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.parallel import make_mesh, replicate, shard_batch
    from slenderobjdet_tpu.solver import build_optimizer

    assert jax.process_count() == nproc and jax.local_device_count() == local_devices
    ndev = jax.device_count()

    # ---- one SPMD train step over the global mesh
    cfg = _flagship_cfg(tiny=True)
    det = build_model(cfg)
    mesh = make_mesh(data=ndev)
    gbatch = make_global_batch(batch_size=ndev)
    per = ndev // nproc  # this process's contiguous rows of the global batch
    local = {k: v[pid * per:(pid + 1) * per] for k, v in gbatch.items()}

    variables = det.init_variables(jax.random.PRNGKey(0), IMG_HW, batch_size=1)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
    )
    state = replicate(state, mesh)
    step_fn = make_train_step(det, tx, mesh=mesh, donate=False)
    new_state, metrics = step_fn(state, shard_batch(local, mesh))
    loss = float(jax.device_get(metrics["total_loss"]))
    assert int(jax.device_get(new_state.step)) == 1

    # ---- eval: disjoint strided image subsets, gathered at evaluate()
    from slenderobjdet_tpu.data import DatasetCatalog
    from slenderobjdet_tpu.data.datasets import register_coco_instances
    from slenderobjdet_tpu.evaluation import COCOEvaluator

    name = "_mh_dryrun"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, os.path.join(workdir, "gt.json"),
                            image_root="")
    evaluator = COCOEvaluator(name, output_dir=None)
    evaluator.reset()
    id_map = evaluator._dataset_id_to_contiguous
    coco = evaluator._coco_api
    img_ids = sorted(coco.getImgIds())
    for img_id in img_ids[pid::nproc]:
        anns = coco.loadAnns(coco.getAnnIds(imgIds=[img_id]))
        boxes, scores, classes = [], [], []
        for j, a in enumerate(anns):
            x, y, bw, bh = a["bbox"]
            boxes.append([x + 0.5, y + 0.5, x + bw - 0.5, y + bh - 0.5])
            scores.append(0.95 - 0.01 * j)
            classes.append(id_map[a["category_id"]])
        n = len(boxes)
        evaluator.process({"image_id": [img_id]}, {
            "boxes": np.asarray(boxes, np.float32)[None],
            "scores": np.asarray(scores, np.float32)[None],
            "classes": np.asarray(classes, np.int32)[None],
            "valid": np.ones((1, n), bool),
        })
    results = evaluator.evaluate()
    ap = float(results["bbox"]["AP"]) if results else None

    out = {"pid": pid, "nproc": nproc, "ndev": ndev, "loss": loss, "ap": ap}
    with open(os.path.join(workdir, f"out_{nproc}p_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"[worker {pid}/{nproc}] {out}", flush=True)
    sys.stdout.flush()
    os._exit(0)  # skip the distributed-client shutdown hang


# ------------------------------------------------------------------ parent
def spawn(args_list, env):
    return subprocess.Popen([sys.executable, os.path.abspath(__file__)]
                            + args_list, env=env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--port", type=int, default=9911)
    ap.add_argument("--workdir", default="/tmp/mh_dryrun")
    args = ap.parse_args()

    if args.worker:
        run_worker(args.process_id, args.num_processes, args.port,
                   args.local_devices, args.workdir)
        return

    os.makedirs(args.workdir, exist_ok=True)
    write_gt_json(os.path.join(args.workdir, "gt.json"))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    nproc, ldev = args.num_processes, args.local_devices

    # multi-process run: nproc workers x ldev devices
    procs = [
        spawn(["--worker", "--process-id", str(p), "--num-processes",
               str(nproc), "--local-devices", str(ldev), "--port",
               str(args.port), "--workdir", args.workdir], env)
        for p in range(nproc)
    ]
    rcs = [p.wait(timeout=1800) for p in procs]
    assert all(rc == 0 for rc in rcs), f"worker rcs: {rcs}"

    # single-process baseline: same global program, 1 x (nproc*ldev) devices
    base = spawn(["--worker", "--process-id", "0", "--num-processes", "1",
                  "--local-devices", str(nproc * ldev), "--workdir",
                  args.workdir], env)
    assert base.wait(timeout=1800) == 0

    outs = [json.load(open(os.path.join(args.workdir, f"out_{nproc}p_{p}.json")))
            for p in range(nproc)]
    ref = json.load(open(os.path.join(args.workdir, "out_1p_0.json")))

    losses = {o["loss"] for o in outs}
    assert len(losses) == 1, f"loss disagrees across processes: {losses}"
    loss_mp, loss_1p = outs[0]["loss"], ref["loss"]
    assert abs(loss_mp - loss_1p) <= 1e-4 * max(1.0, abs(loss_1p)), \
        f"multi-process loss {loss_mp} != single-process {loss_1p}"
    ap_main = outs[0]["ap"]
    assert outs[0]["pid"] == 0 and ap_main is not None
    assert all(o["ap"] is None for o in outs[1:]), \
        "non-main processes must return empty eval results"
    assert abs(ap_main - ref["ap"]) < 1e-9, \
        f"gathered AP {ap_main} != single-process AP {ref['ap']}"
    print(f"MULTIHOST OK: {nproc} processes x {ldev} devices, "
          f"loss={loss_mp:.6f} (1p {loss_1p:.6f}), AP={ap_main:.3f}")


if __name__ == "__main__":
    main()
