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
    args = ap.parse_args()

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
