#!/usr/bin/env python
"""Data loader throughput benchmark (counterpart of
/root/reference/tools/data_time.py).

Usage:
  python tools/data_time.py --config-file configs/fcos/fcos_R_50_FPN_1x.yaml \
      [--iters 50] [--workers N] [--batch N]
  # self-contained A/B on generated data (no COCO needed): plain image
  # files vs a RecordPack source (data/recordpack.py)
  python tools/data_time.py --config-file ... --synthetic 64 [--pack] \
      [--image-hw 480 640]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _make_synthetic(root: str, n: int, hw, pack: bool):
    """Random JPEG images + minimal dataset dicts; optionally packed."""
    import numpy as np
    import cv2

    h, w = hw
    rng = np.random.RandomState(0)
    dicts = []
    pack_path = os.path.join(root, "synth_train.pack")
    writer = None
    if pack:
        from slenderobjdet_tpu.data.recordpack import AsyncPackWriter

        writer = AsyncPackWriter(pack_path).start()
    for i in range(n):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        name = f"{i:06d}.jpg"
        path = os.path.join(root, name)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        if pack:
            writer.write(buf.tobytes(), name)
        else:
            with open(path, "wb") as f:
                f.write(buf.tobytes())
        dicts.append({
            "file_name": path, "image_id": i, "height": h, "width": w,
            "annotations": [{
                "bbox": [w * 0.2, h * 0.2, w * 0.4, h * 0.4],
                "bbox_mode": 0, "category_id": 0, "iscrowd": 0,
            }],
        })
    if writer is not None:
        writer.close()
    return dicts


def stage_budget(hw, iters, train_rate=83.0, need_masks=False):
    """Per-image HOST cost of each mapper stage (VERDICT r3 #8): decode,
    resize-shortest-edge(800), flip, pad-to-bucket, gt assembly — measured
    on THIS host's CPU, then converted into the NUM_WORKERS requirement to
    feed `train_rate` img/s (the measured FCOS train step). COCO mean input
    is ~640x480; override with --image-hw."""
    import numpy as np
    import cv2
    import time as _t

    from slenderobjdet_tpu.data import transforms as T

    h, w = hw
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    ok, jpeg = cv2.imencode(".jpg", img)
    assert ok
    jpeg = jpeg.tobytes()
    boxes0 = np.stack([rng.rand(30) * w * 0.5, rng.rand(30) * h * 0.5,
                       rng.rand(30) * w * 0.5 + w * 0.5,
                       rng.rand(30) * h * 0.5 + h * 0.5], 1).astype(np.float32)

    def timeit(fn):
        fn()  # warm
        t0 = _t.perf_counter()
        for _ in range(iters):
            fn()
        return (_t.perf_counter() - t0) / iters * 1e3  # ms

    t_decode = timeit(lambda: cv2.imdecode(
        np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR))
    decoded = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    t_resize = timeit(lambda: T.resize_shortest_edge(
        decoded, boxes0.copy(), 800, 1333))
    resized, boxes1, _ = T.resize_shortest_edge(decoded, boxes0.copy(),
                                                800, 1333)
    t_flip = timeit(lambda: T.horizontal_flip(resized.copy(), boxes1.copy()))
    rh, rw = resized.shape[:2]
    pad_hw = (896, 1333) if rw >= rh else (1333, 896)
    t_pad = timeit(lambda: T.pad_to(resized, pad_hw))

    def gt():
        g = np.zeros((100, 4), np.float32)
        g[:30] = boxes1
        return g

    t_gt = timeit(gt)
    total = t_decode + t_resize + t_flip + t_pad + t_gt
    rows = [("jpeg decode", t_decode), ("resize-shortest-edge", t_resize),
            ("hflip", t_flip), ("pad-to-bucket", t_pad),
            ("gt assembly", t_gt)]
    if need_masks:
        from slenderobjdet_tpu.structures.borders import BorderMasks

        poly = [np.array([60, 60, 300, 60, 300, 260, 60, 260], np.float64)]
        bm = BorderMasks([poly] * 8)
        t_render = timeit(lambda: bm.center_masks((rh, rw)))
        rows.append(("center-mask render (8 inst)", t_render))
        total += t_render
    per_core = 1000.0 / total
    print(f"host mapper budget at {w}x{h} input -> 800-short-side:")
    for name, ms in rows:
        print(f"  {name:26s} {ms:7.2f} ms/img")
    print(f"  {'TOTAL':26s} {total:7.2f} ms/img "
          f"({per_core:.1f} img/s/core)")
    print(f"  -> feeding {train_rate:.0f} img/s needs "
          f"{train_rate / per_core:.1f} mapper cores "
          f"(NUM_WORKERS >= {int(np.ceil(train_rate / per_core))})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--workers", type=int, default=-1)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N images instead of using the dataset")
    ap.add_argument("--pack", action="store_true",
                    help="with --synthetic: read from a RecordPack")
    ap.add_argument("--image-hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--stage-budget", action="store_true",
                    help="per-image host cost of each mapper stage + the "
                         "NUM_WORKERS requirement (no dataset needed)")
    ap.add_argument("--train-rate", type=float, default=83.0,
                    help="device train img/s the host must feed")
    ap.add_argument("--need-masks", action="store_true",
                    help="with --stage-budget: include center-mask render")
    args = ap.parse_args()

    if args.stage_budget:
        stage_budget(tuple(args.image_hw), max(args.iters, 10),
                     args.train_rate, args.need_masks)
        return

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import build_detection_train_loader

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    tmpdir = None
    if args.synthetic:
        from slenderobjdet_tpu.data.catalog import DatasetCatalog

        tmpdir = tempfile.mkdtemp(prefix="data_time_")
        dicts = _make_synthetic(tmpdir, args.synthetic,
                                tuple(args.image_hw), args.pack)
        DatasetCatalog.register("synth_train", lambda: dicts)
        cfg.DATASETS.TRAIN = ("synth_train",)
        if args.pack:
            cfg.USE_NORI = True
            cfg.NORI_PATH = tmpdir
    if args.workers >= 0:
        cfg.DATALOADER.NUM_WORKERS = args.workers
    if args.batch:
        cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.freeze()

    it = iter(build_detection_train_loader(cfg))
    next(it)  # warm the pipeline
    t0 = time.perf_counter()
    n_images = 0
    for _ in range(args.iters):
        b = next(it)
        n_images += b["image"].shape[0]
    dt = time.perf_counter() - t0
    print(f"{args.iters} batches / {n_images} images in {dt:.2f}s "
          f"-> {n_images / dt:.1f} img/s, {dt / args.iters * 1000:.1f} ms/batch")


if __name__ == "__main__":
    main()
