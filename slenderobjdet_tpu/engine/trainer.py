"""Config-driven trainer (counterpart of the reference `BaseTrainer`,
`slender_det/engine/defaults.py:74-178` over d2 DefaultTrainer/SimpleTrainer).

One object wires together: model build, optimizer, data loaders, the jitted
data-parallel train step, periodic logging (period 20, like the reference's
PeriodicWriter), periodic checkpointing, and eval. The hot loop keeps device
work async — metrics are fetched only on logging iterations so steps pipeline
behind the host data loader.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.checkpointer import DetectionCheckpointer
from ..data import build_detection_test_loader, build_detection_train_loader
from ..data.catalog import MetadataCatalog
from ..evaluation import COCOEvaluator, inference_on_dataset
from ..models import build_model
from ..parallel import mesh_from_cfg, replicate, shard_batch
from ..solver import build_optimizer
from .events import CommonMetricPrinter, EventStorage, JSONWriter
from .train_loop import TrainState, make_train_step

logger = logging.getLogger(__name__)


def default_setup(cfg, args=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    if jax.process_index() == 0:  # rank-0 config dump (reference defaults.py)
        with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
            f.write(cfg.dump())
    logger.info("process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), len(jax.devices()))
    if cfg.SEED >= 0:
        np.random.seed(cfg.SEED)


class BaseTrainer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.detector = build_model(cfg)
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.start_iter = 0

        seed = cfg.SEED if cfg.SEED >= 0 else 0
        rng = jax.random.PRNGKey(seed)
        variables = self.detector.init_variables(rng)
        self.tx = build_optimizer(cfg, variables["params"])
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            buffers=variables.get("buffers", {}),
            opt_state=self.tx.init(variables["params"]),
        )

        n_dev = len(jax.devices())
        if n_dev > 1:
            import math

            data = cfg.TPU.MESH_DATA
            non_data = cfg.TPU.MESH_MODEL * cfg.TPU.MESH_SPATIAL
            if data == -1:
                # largest device count that divides the global batch
                data = math.gcd(cfg.SOLVER.IMS_PER_BATCH, n_dev // non_data)
            from ..parallel import make_mesh

            self.mesh = make_mesh(
                data=data, model=cfg.TPU.MESH_MODEL,
                spatial=cfg.TPU.MESH_SPATIAL,
                devices=jax.devices()[: data * non_data],
            )
        else:
            self.mesh = None
        if self.mesh is not None:
            if cfg.TPU.MESH_MODEL > 1:
                # tensor parallelism: wide conv/dense output channels shard
                # over 'model' (the dryrun_multichip layout); optimizer
                # moments inherit the param shardings at init below
                from ..parallel.mesh import channel_sharded_params

                params = channel_sharded_params(self.state.params, self.mesh)
                self.state = TrainState(
                    step=replicate(self.state.step, self.mesh),
                    params=params,
                    buffers=replicate(self.state.buffers, self.mesh),
                    opt_state=self.tx.init(params),
                )
            else:
                self.state = replicate(self.state, self.mesh)
        self.train_step = make_train_step(
            self.detector, self.tx, mesh=self.mesh, donate=cfg.TPU.DONATE
        )

        self.checkpointer = DetectionCheckpointer(cfg.OUTPUT_DIR)
        self.storage = EventStorage()
        self.writers = [
            CommonMetricPrinter(self.max_iter),
            JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
        ]

    def resume_or_load(self, resume: bool = False):
        self.state = self.checkpointer.resume_or_load(
            self.cfg.MODEL.WEIGHTS, self.state, resume
        )
        self.start_iter = int(jax.device_get(self.state.step))

    def train(self):
        cfg = self.cfg
        loader = build_detection_train_loader(cfg, seed=max(cfg.SEED, 0))
        it = iter(loader)
        self.storage.iter = self.start_iter
        data_t0 = time.perf_counter()

        rng_base = jax.random.PRNGKey(max(cfg.SEED, 0) + 7919)
        profile_start = cfg.TPU.PROFILE_START_ITER
        profile_stop = profile_start + cfg.TPU.PROFILE_NUM_ITERS
        for i in range(self.start_iter, self.max_iter):
            if i == profile_start:
                jax.profiler.start_trace(
                    os.path.join(cfg.OUTPUT_DIR, "profile"))
                logger.info("jax.profiler trace started (iters %d..%d)",
                            profile_start, profile_stop - 1)
            host_batch = next(it)
            batch = {
                k: v for k, v in host_batch.items()
                if k not in ("image_id", "batch_valid")
            }
            step_rng = jax.random.fold_in(rng_base, i)
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
                step_rng = replicate(step_rng, self.mesh)
            # per-step key for in-graph sampling (RPN/ROI subsampling)
            batch["rng"] = step_rng
            data_time = time.perf_counter() - data_t0

            self.state, metrics = self.train_step(self.state, batch)

            if profile_start >= 0 and i + 1 == profile_stop:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                logger.info("jax.profiler trace written to %s",
                            os.path.join(cfg.OUTPUT_DIR, "profile"))

            if (i + 1) % 20 == 0 or i == self.start_iter:
                fetched = {k: float(v) for k, v in metrics.items()}
                self.storage.put_scalars(data_time=data_time, **fetched)
                for w in self.writers:
                    w.write(self.storage)
            self.storage.step()

            if (i + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or (i + 1) == self.max_iter:
                # non-blocking: the host fetch + write overlap the next
                # device steps; has_checkpoint/load join the in-flight save.
                # Main-process-only, like the reference's rank-0
                # PeriodicCheckpointer (engine/defaults.py:121)
                from ..parallel.multihost import is_main_process

                if is_main_process():
                    self.checkpointer.save(f"model_{i + 1:07d}", self.state,
                                           blocking=(i + 1) == self.max_iter)
            if cfg.TEST.EVAL_PERIOD > 0 and (i + 1) % cfg.TEST.EVAL_PERIOD == 0:
                self.test()
            data_t0 = time.perf_counter()

        return self.state

    # ------------------------------------------------------------------ eval
    def test(self, state: Optional[TrainState] = None) -> Dict:
        cfg = self.cfg
        own_state = state is None
        state = state or self.state
        buffers = state.buffers
        if cfg.TEST.PRECISE_BN.ENABLED:
            from ..models.layers import has_batch_stats, precise_bn_stats

            if has_batch_stats(buffers):
                # reference engine/defaults.py:104-112: recompute BN running
                # stats as the plain average over NUM_ITER fresh train
                # batches right before eval (and keep them, so the next
                # checkpoint carries the precise stats)
                # unsharded (num_shards=1): every process recomputes the
                # SAME stats over the same images, so multi-process eval
                # stays consistent without a buffer broadcast
                loader = iter(build_detection_train_loader(
                    cfg, seed=1, shard_id=0, num_shards=1))
                n = max(1, cfg.TEST.PRECISE_BN.NUM_ITER)
                images = (next(loader)["image"] for _ in range(n))
                buffers = precise_bn_stats(
                    self.detector.module,
                    {"params": state.params, "buffers": buffers}, images)
                state = state.replace(buffers=buffers)
                if own_state:
                    self.state = state
        variables = {"params": state.params}
        if buffers:
            variables["buffers"] = buffers
        predict = jax.jit(self.detector.predict)

        def predict_fn(batch):
            dev = {
                "image": jnp.asarray(batch["image"]),
                "scale": jnp.asarray(batch["scale"]),
                "orig_size": jnp.asarray(batch["orig_size"]),
            }
            if "image_size" in batch:  # RCNN clips proposals to the
                dev["image_size"] = jnp.asarray(batch["image_size"])  # valid region
            return predict(variables, dev)

        all_results = {}
        for dataset_name in cfg.DATASETS.TEST:
            evaluator_type = MetadataCatalog.get(dataset_name).get(
                "evaluator_type", "coco"
            )
            if evaluator_type == "rcoco":
                from ..evaluation.rotated_evaluation import RotatedCOCOEvaluator

                evaluator = RotatedCOCOEvaluator(
                    dataset_name, cfg, output_dir=cfg.OUTPUT_DIR
                )
            else:
                evaluator = COCOEvaluator(
                    dataset_name, cfg, output_dir=cfg.OUTPUT_DIR
                )
            if cfg.TEST.AUG.ENABLED and evaluator_type != "rcoco":
                # multi-scale + flip TTA (reference train_net.py:128-142
                # wraps the model in GeneralizedRCNNWithTTA for --eval-only)
                results = self._test_with_tta(dataset_name, variables,
                                              evaluator)
            else:
                loader = build_detection_test_loader(cfg, dataset_name,
                                                     batch_size=8)
                results = inference_on_dataset(predict_fn, loader, evaluator)
            logger.info("eval %s: %s", dataset_name, results.get("bbox"))
            all_results[dataset_name] = results
        return all_results

    def _test_with_tta(self, dataset_name, variables, evaluator) -> Dict:
        from ..data import get_detection_dataset_dicts
        from .tta import tta_predict

        evaluator.reset()
        predict_fns: Dict = {}
        for d in get_detection_dataset_dicts(dataset_name):
            merged = tta_predict(self.detector, variables, d, self.cfg,
                                 predict_fns=predict_fns)
            n = len(merged["boxes"])
            evaluator.process(
                {"image_id": [d["image_id"]]},
                {
                    "boxes": merged["boxes"][None],
                    "scores": merged["scores"][None],
                    "classes": merged["classes"][None],
                    "valid": np.ones((1, n), bool),
                },
            )
        return evaluator.evaluate()
