#!/usr/bin/env python
"""Backbone-group experiment runner: queue a family of configs through
train_net.py with dated output dirs, resume, and retry-on-failure.

Counterpart of the reference's `tools/script.py:6-125`, which wrapped each
run in the internal `rlaunch` GPU scheduler. Here each run is a local
subprocess of `train_net.py` (one TPU host runs the whole pjit program, so
there is no per-device scheduler to talk to); the reference's semantics are
kept: output dir `output/<MM-DD>_<model>_<backbone>_<schedule>`, `--resume`
so a retry continues from the last checkpoint, and a bounded retry loop
instead of the reference's infinite one.

Usage:
  python tools/run_experiments.py --model fcos [--depths 18 34 50 101]
      [--schedule 1x] [--retries 3] [--dry-run] [--opts KEY VAL ...]
  python tools/run_experiments.py --configs a.yaml b.yaml --model custom
"""

import argparse
import datetime
import os
import subprocess
import sys
import time

FAMILIES = ("fcos", "retina", "faster", "rep-points")


def output_dir(model_name: str, backbone: str, schedule: str) -> str:
    today = datetime.date.today()
    return "output/{:02d}-{:02d}_{}_{}_{}".format(
        today.month, today.day, model_name, backbone, schedule)


def build_commands(model, configs, backbones, schedule, opts):
    cmds = []
    for backbone, cfg_file in zip(backbones, configs):
        out = output_dir(model, backbone, schedule)
        cmds.append([sys.executable, "train_net.py", "--resume",
                     "--config-file", cfg_file, "OUTPUT_DIR", out] + opts)
    return cmds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help=f"family name ({'/'.join(FAMILIES)}) or a label "
                         "for --configs")
    ap.add_argument("--depths", type=int, nargs="+",
                    default=[50, 101, 152])
    ap.add_argument("--configs", nargs="+", default=None,
                    help="explicit config list (overrides the family sweep)")
    ap.add_argument("--schedule", default="1x")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--retry-wait", type=float, default=10.0)
    ap.add_argument("--dry-run", action="store_true",
                    help="print the commands without running")
    ap.add_argument("--opts", nargs=argparse.REMAINDER, default=[],
                    help="extra config overrides appended to every run")
    args = ap.parse_args()

    if args.configs:
        configs = args.configs
        backbones = [os.path.splitext(os.path.basename(c))[0]
                     for c in configs]
    else:
        if args.model not in FAMILIES:
            ap.error(f"--model must be one of {FAMILIES} unless --configs "
                     "is given")
        configs = [
            f"configs/group_exp_for_backbone/{args.model}/r-{d}.yaml"
            for d in args.depths
        ]
        backbones = [f"R_{d}_FPN" for d in args.depths]

    cmds = build_commands(args.model, configs, backbones, args.schedule,
                          args.opts)
    failed = []
    for cmd in cmds:
        print(" ".join(cmd), flush=True)
        if args.dry_run:
            continue
        for attempt in range(args.retries):
            ret = subprocess.call(cmd)
            if ret == 0:
                break
            print(f"exit {ret} for {' '.join(cmd)}; retry "
                  f"{attempt + 1}/{args.retries} in {args.retry_wait}s "
                  "(resumes from the last checkpoint)", flush=True)
            time.sleep(args.retry_wait)
        else:
            failed.append(" ".join(cmd))
    if failed:
        print("FAILED after retries:\n  " + "\n  ".join(failed),
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
