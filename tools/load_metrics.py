#!/usr/bin/env python
"""Pretty-print training metrics.json / evaluate_metrics.json (counterpart
of /root/reference/tools/load_metrics.py and watch_evaluate.py).

Usage:
  python tools/load_metrics.py output/metrics.json [--tail 5] [--watch]
"""

import argparse
import json
import time


def show(path, tail):
    with open(path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    for rec in lines[-tail:]:
        it = rec.pop("iteration", "?")
        metrics = "  ".join(f"{k}={v:.4g}" for k, v in sorted(rec.items())
                            if isinstance(v, (int, float)))
        print(f"iter {it}: {metrics}")
    return len(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--tail", type=int, default=5)
    ap.add_argument("--watch", action="store_true")
    args = ap.parse_args()
    n = show(args.path, args.tail)
    while args.watch:
        time.sleep(10)
        m = show(args.path, 1)
        if m == n:
            continue
        n = m


if __name__ == "__main__":
    main()
