#!/usr/bin/env python
"""Watch a directory for new prediction files and evaluate each
(counterpart of /root/reference/tools/watch_evaluate.py:1-31, which polled
an S3 prefix and rlaunch'ed result_statistic per .pth; here: poll a local
directory and run tools/result_statistic.py in-process per new json).

Usage:
  python tools/watch_evaluate.py --watch-dir outputs/ --gt-json inst.json \
      [--interval 30] [--once]
"""

import argparse
import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch-dir", required=True)
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--pattern", default="*coco_instances_results*.json")
    ap.add_argument("--interval", type=float, default=30.0)
    ap.add_argument("--once", action="store_true",
                    help="single scan (no polling loop)")
    args = ap.parse_args()

    seen = set()
    while True:
        for path in sorted(glob.glob(
                os.path.join(args.watch_dir, "**", args.pattern),
                recursive=True)):
            marker = path + ".evaluated"
            if path in seen or os.path.exists(marker):
                continue
            seen.add(path)
            cmd = [sys.executable, os.path.join(
                       os.path.dirname(os.path.abspath(__file__)),
                       "result_statistic.py"),
                   "--prediction", path, "--gt-json", args.gt_json]
            print("evaluating:", " ".join(cmd))
            rc = subprocess.call(cmd)
            if rc == 0:
                with open(marker, "w") as f:
                    f.write("ok\n")
        if args.once:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
