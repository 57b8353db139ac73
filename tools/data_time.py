#!/usr/bin/env python
"""Data loader throughput benchmark (counterpart of
/root/reference/tools/data_time.py).

Usage:
  python tools/data_time.py --config-file configs/fcos/fcos_R_50_FPN_1x.yaml \
      [--iters 50]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from slenderobjdet_tpu.config import get_cfg
    from slenderobjdet_tpu.data import build_detection_train_loader

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
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
