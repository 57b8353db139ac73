"""Optimizer + LR schedule construction (optax).

Parity with the reference solver (`slender_det/solver/build.py:8-104` +
detectron2 WarmupMultiStepLR):
- SOLVER.OPTIM in {SGD, ADAM, ADAMW, ADAGRAD}
- SGD: momentum, optional Nesterov, L2 weight decay folded into the gradient
  (torch SGD semantics: wd applied before the momentum buffer update)
- per-parameter-group overrides: WEIGHT_DECAY_NORM for norm params,
  WEIGHT_DECAY_BIAS + BIAS_LR_FACTOR for biases
- WarmupMultiStepLR: lr * GAMMA^(#STEPS passed) with linear/constant warmup
- optional gradient clipping (value or norm)
- MODEL.BACKBONE.FREEZE_AT implemented as an update mask (JAX-style freezing)
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax


def lr_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    base_lr = cfg.SOLVER.BASE_LR
    steps = tuple(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    method = cfg.SOLVER.WARMUP_METHOD

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if method == "linear":
            alpha = step / max(warmup_iters, 1)
            wf = jnp.where(
                step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
            )
        elif method == "constant":
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        else:
            wf = 1.0
        decay = jnp.asarray(1.0, jnp.float32)
        for s in steps:
            decay = decay * jnp.where(step >= s, gamma, 1.0)
        return base_lr * wf * decay

    return schedule


def _param_labels(params, is_norm_or_bias) -> Any:
    """Label each leaf 'norm', 'bias' or 'regular' by its path."""

    def label(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        name = keys[-1] if keys else ""
        parent = keys[-2] if len(keys) >= 2 else ""
        # d2 order (solver/build.py get_default_optimizer_params): the
        # module_param_name == "bias" check runs AFTER the norm-module check
        # and overrides it, so norm biases land in the bias group.
        if name == "bias":
            return "bias"
        if "gn" in parent.lower() or "groupnorm" in parent.lower() or name == "scale":
            return "norm"
        return "regular"

    return jax.tree_util.tree_map_with_path(label, params)


def _freeze_mask(cfg, params):
    """True = trainable. Freezes backbone stem/stages per FREEZE_AT."""
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT

    def decide(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        joined = "/".join(keys)
        if freeze_at >= 1 and "stem" in joined:
            return False
        for stage in range(2, 6):
            if freeze_at >= stage and f"res{stage}_" in joined:
                return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)
    optim = cfg.SOLVER.OPTIM.upper()

    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS

    labels = _param_labels(params, None)

    def wd_for(group):
        return {"regular": wd, "norm": wd_norm, "bias": wd_bias}[group]

    decay = optax.multi_transform(
        {
            g: optax.add_decayed_weights(wd_for(g)) if wd_for(g) > 0 else optax.identity()
            for g in ("regular", "norm", "bias")
        },
        labels,
    )

    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))

    if optim == "SGD":
        chain.append(decay)  # torch SGD: wd folded into grad before momentum
        chain.append(
            optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV)
        )
        chain.append(optax.scale_by_learning_rate(sched))
    elif optim == "ADAM":
        chain.append(decay)
        chain.append(optax.scale_by_adam())
        chain.append(optax.scale_by_learning_rate(sched))
    elif optim == "ADAMW":
        chain.append(optax.scale_by_adam())
        chain.append(decay)  # AdamW: decoupled decay after the preconditioner
        chain.append(optax.scale_by_learning_rate(sched))
    elif optim == "ADAGRAD":
        chain.append(decay)
        chain.append(optax.scale_by_rss())
        chain.append(optax.scale_by_learning_rate(sched))
    else:
        raise ValueError(f"Unknown SOLVER.OPTIM {cfg.SOLVER.OPTIM!r}")

    # d2 per-group LR: bias params use BASE_LR * BIAS_LR_FACTOR. The LR
    # multiplies the final update in every optimizer above, so scaling the
    # bias group's update is exactly the per-group LR.
    bias_lr_factor = float(getattr(cfg.SOLVER, "BIAS_LR_FACTOR", 1.0))
    if bias_lr_factor != 1.0:
        chain.append(
            optax.multi_transform(
                {
                    "bias": optax.scale(bias_lr_factor),
                    "norm": optax.identity(),
                    "regular": optax.identity(),
                },
                labels,
            )
        )

    tx = optax.chain(*chain)

    # freeze backbone stages per cfg.MODEL.BACKBONE.FREEZE_AT
    mask = _freeze_mask(cfg, params)
    if not all(jax.tree_util.tree_leaves(mask)):
        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()}, mask
        )
    return tx
