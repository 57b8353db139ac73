"""Data-parallel training step (jit + sharding), the TPU-native counterpart of
detectron2 `SimpleTrainer.run_step` + DDP (reference train_net.py:182 →
d2 SimpleTrainer; SURVEY.md §3.1 hot loop).

One jitted function performs forward, backward, optimizer update. The batch is
sharded over the mesh "data" axis; parameters and optimizer state are
replicated. Loss normalizers (num_pos, centerness sums) are global sums inside
the program, so XLA emits the cross-chip psum automatically — the hand-written
`dist.all_reduce` calls of the reference (fcos.py:26-31) have no counterpart
in model code.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import batch_sharding, replicated


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    buffers: Any          # non-trainable collections (FrozenBN affine)
    opt_state: Any


# Re-exported for engine users; lives next to BatchNorm to keep the
# models package free of engine imports.
from ..models.layers import apply_train  # noqa: E402,F401


def create_train_state(detector, tx, rng, image_hw, batch_size: int) -> TrainState:
    variables = detector.init_variables(rng, image_hw, batch_size=batch_size)
    params = variables["params"]
    buffers = variables.get("buffers", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        buffers=buffers,
        opt_state=tx.init(params),
    )


def make_train_step(
    detector, tx, mesh: Optional[Mesh] = None, donate: bool = True
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    def train_step(state: TrainState, batch: Dict):
        def loss_fn(params):
            variables = {"params": params}
            if state.buffers:
                variables["buffers"] = state.buffers
            return detector.loss(variables, batch)

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        buffers = state.buffers
        metrics = dict(metrics)
        # BatchNorm running statistics updated inside the loss apply
        # (layers.BatchNorm via apply_train) replace the flax buffer subtree;
        # detector-level keys (loss_normalizer) live at the top level and
        # survive the merge.
        updated = metrics.pop("_buffers", None)
        if updated is not None and isinstance(buffers, dict):
            buffers = {**buffers, **updated}
        # detector-level running statistics (RepPoints EMA loss normalizer,
        # reference rpd.py:121-122,385-388) write back into the buffers
        if (isinstance(buffers, dict) and "loss_normalizer" in buffers
                and "loss_normalizer" in metrics):
            buffers = {**buffers,
                       "loss_normalizer": metrics["loss_normalizer"]}
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            buffers=buffers,
        )
        metrics = dict(metrics)
        metrics["total_loss"] = total
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    # Shardings are carried by the inputs themselves (state replicated via
    # parallel.replicate, batch leaves via parallel.shard_batch, per-step rng
    # replicated) — jit infers them, which permits mixed-layout batches
    # (sharded tensors + replicated rng key). The output STATE sharding is
    # left to propagation so channel-sharded (tp) params stay sharded across
    # steps (a replicated out_sharding would all-gather them after step 1);
    # metrics are pinned replicated for the host-side fetch.
    repl = replicated(mesh)
    return jax.jit(
        train_step,
        out_shardings=(None, repl),
        donate_argnums=(0,) if donate else (),
    )
