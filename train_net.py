#!/usr/bin/env python
"""Training / evaluation CLI, mirroring the reference entry point
(`/root/reference/train_net.py`):

    python train_net.py --config-file configs/fcos/fcos_R_50_FPN_1x.yaml \
        [--eval-only] [--resume] [KEY VALUE ...]

TPU note: --num-gpus/--num-machines are accepted for CLI compatibility but
parallelism comes from the jax device mesh (all local devices by default;
multi-host via jax.distributed.initialize when JAX_COORDINATOR is set).
"""

import argparse
import sys


def default_argument_parser():
    parser = argparse.ArgumentParser(description="slenderobjdet_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=0,
                        help="accepted for parity; the jax mesh is used instead")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="dotted config overrides: KEY VALUE ...")
    return parser


def setup(args):
    from slenderobjdet_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def main(args):
    import os

    if os.environ.get("JAX_COORDINATOR"):
        import jax

        addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if addr:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
            )
        else:  # Cloud TPU pod: auto-discovery
            jax.distributed.initialize()

    cfg = setup(args)

    from slenderobjdet_tpu.engine.trainer import BaseTrainer, default_setup

    default_setup(cfg, args)
    trainer = BaseTrainer(cfg)
    trainer.resume_or_load(resume=args.resume)

    if args.eval_only:
        results = trainer.test()
        print(results)
        return results

    trainer.train()
    if cfg.DATASETS.TEST:
        return trainer.test()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)
