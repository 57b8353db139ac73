"""Shared Flax building blocks (NHWC, mixed-precision-ready).

TPU-first counterparts of the reference's layer zoo:
- `Scale` — learnable scalar (reference `slender_det/layers/scale.py:5-11`)
- `FrozenBatchNorm` — fixed affine, matching detectron2 FrozenBN semantics
  (stats folded into scale/bias; never updated). Stored in the `buffers`
  collection so optimizers never touch it.
- `get_norm` — norm factory ("FrozenBN" | "GN" | "BN"→GN fallback | "").

All convs run in `dtype` (bfloat16 by default on TPU) with float32 params.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class Scale(nn.Module):
    """Learnable scalar multiplier (per-FPN-level bbox scaling in FCOS)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", lambda rng: jnp.asarray(self.init_value, jnp.float32)
        )
        return x * scale.astype(x.dtype)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine parameters frozen.

    Equivalent to detectron2's FrozenBatchNorm2d after folding: a fixed
    per-channel affine y = x * scale + bias. Parameters live in the
    `buffers` variable collection (excluded from gradients/optimizer).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.variable(
            "buffers", "scale", lambda: jnp.ones((self.features,), jnp.float32)
        )
        bias = self.variable(
            "buffers", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        return x * scale.value.astype(x.dtype) + bias.value.astype(x.dtype)


class GroupNorm32(nn.Module):
    features: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # GroupNorm reduces in float32 for stability, casts back to input dtype
        return nn.GroupNorm(
            num_groups=self.num_groups, dtype=jnp.float32, param_dtype=jnp.float32
        )(x.astype(jnp.float32)).astype(x.dtype)


class BatchNorm(nn.Module):
    """Trainable batch normalization with running statistics.

    Counterpart of the `nn.BatchNorm2d` the reference trains in the hourglass
    backbone (`slender_det/modeling/backbone/hourglass.py:16`, norm="BN") and
    of the SyncBN the VT blocks force (`slender_det/layers/
    visual_transformer.py:17-23`). Semantics match torch BatchNorm2d:
    - train: normalize by the biased batch mean/var; running stats updated as
      `new = (1 - momentum) * old + momentum * batch_stat`, with the running
      var updated from the UNBIASED batch variance (torch behavior).
    - eval: normalize by the running mean/var.

    TPU-first design points:
    - Running stats live in the `buffers` collection next to FrozenBN's
      affine, so the TrainState/checkpoint plumbing is shared; the train step
      writes them back via `engine.train_loop.apply_train` (mutable apply).
    - Train vs eval is decided by `self.is_mutable_collection("buffers")`:
      only the training apply opens the buffers for mutation, so no `train`
      flag needs to be threaded through backbone call signatures.
    - Under a jitted step with the batch sharded over the mesh "data" axis,
      `jnp.mean` over the batch is a GLOBAL mean (GSPMD inserts the psum), so
      "SyncBN" is the default behavior — no wrapper module needed.
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("buffers", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("buffers", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))

        training = (self.is_mutable_collection("buffers")
                    and not self.is_initializing())
        if training:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            batch_mean = jnp.mean(xf, axis=axes)
            # two-pass variance: the one-pass E[x^2] - E[x]^2 form cancels
            # catastrophically in fp32 for large-mean/small-var activations
            # and can go negative -> rsqrt(var + eps) = NaN
            batch_var = jnp.mean(jnp.square(xf - batch_mean), axis=axes)
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = batch_var * (n / max(n - 1, 1))
            mean.value = (1.0 - self.momentum) * mean.value \
                + self.momentum * batch_mean
            var.value = (1.0 - self.momentum) * var.value \
                + self.momentum * unbiased
            use_mean, use_var = batch_mean, batch_var
        else:
            use_mean, use_var = mean.value, var.value

        inv = scale * jax.lax.rsqrt(use_var + self.epsilon)
        return x * inv.astype(x.dtype) + (
            bias - use_mean * inv).astype(x.dtype)


def has_batch_stats(buffers) -> bool:
    """True iff the buffers pytree contains live BatchNorm running stats
    (a {"mean": ..., "var": ...} pair) — the signal `apply_train` uses to
    decide whether the loss apply must open `buffers` for mutation."""
    found = [False]

    def walk(tree):
        if isinstance(tree, dict):
            if "mean" in tree and "var" in tree:
                found[0] = True
                return
            for v in tree.values():
                walk(v)

    walk(buffers)
    return found[0]


def apply_train(module, variables, *args, **kwargs):
    """Training-mode module apply that lets BatchNorm running statistics
    escape. Returns (outputs, updated_buffers | None).

    When the variables contain live batch stats (models with trainable BN —
    hourglass/CornerNet, VT blocks; see BatchNorm), the apply opens the
    `buffers` collection for mutation and returns the updated tree, which the
    detector's loss stashes in metrics["_buffers"] for the train step to write
    back into TrainState.buffers. FrozenBN-only models take the plain-apply
    path (no extra jit outputs, no aliasing overhead)."""
    if has_batch_stats(variables.get("buffers", {})):
        out, mut = module.apply(variables, *args, mutable=["buffers"],
                                **kwargs)
        return out, mut["buffers"]
    return module.apply(variables, *args, **kwargs), None


def _map_bn_nodes(tree, fn):
    """Return a copy of the buffers pytree with every BatchNorm stats node
    (a dict holding both "mean" and "var") replaced by fn(node)."""
    if isinstance(tree, dict):
        if "mean" in tree and "var" in tree:
            return fn(tree)
        return {k: _map_bn_nodes(v, fn) for k, v in tree.items()}
    return tree


def precise_bn_stats(module, variables, image_batches,
                     momentum: float = 0.1):
    """Recompute BatchNorm running statistics as the PLAIN average of the
    per-batch statistics over `image_batches` — the fvcore
    update_bn_stats / PreciseBN semantics the reference schedules before
    every eval (reference engine/defaults.py:104-112, TEST.PRECISE_BN).
    Returns a new buffers tree; a no-op copy if the model has no live BN.

    Mechanism: every BN {mean, var} leaf is zeroed so ONE train-mode apply
    exposes that batch's statistic exactly (new = (1-m)*0 + m*batch, so
    batch = new/m), then the recovered per-batch statistics are averaged on
    the host. `momentum` must match the BatchNorm modules' momentum (0.1
    everywhere via get_norm)."""
    buffers = variables.get("buffers", {})
    if not has_batch_stats(buffers):
        return buffers

    zeroed = _map_bn_nodes(
        buffers,
        lambda node: {**node,
                      "mean": jnp.zeros_like(node["mean"]),
                      "var": jnp.zeros_like(node["var"])},
    )
    base = {k: v for k, v in variables.items() if k != "buffers"}

    @jax.jit
    def one_batch(images):
        _, mut = module.apply({**base, "buffers": zeroed}, images,
                              mutable=["buffers"])
        return mut["buffers"]

    total, count = None, 0
    for images in image_batches:
        upd = jax.device_get(one_batch(jnp.asarray(images)))
        if total is None:
            total = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64), upd)
        else:
            total = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, np.float64), total, upd)
        count += 1
    assert count > 0, "precise_bn_stats needs at least one batch"

    def finish(node, new_node):
        return {**node,
                "mean": jnp.asarray(new_node["mean"] / (momentum * count),
                                    jnp.float32),
                "var": jnp.asarray(new_node["var"] / (momentum * count),
                                   jnp.float32)}

    def merge(old, summed):
        if isinstance(old, dict):
            if "mean" in old and "var" in old:
                return finish(old, summed)
            return {k: merge(v, summed[k]) for k, v in old.items()}
        return old

    return merge(buffers, total)


def get_norm(norm: str, features: int, dtype: Dtype = jnp.float32,
             name: Optional[str] = None) -> Optional[nn.Module]:
    if norm == "" or norm is None:
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features=features, dtype=dtype, name=name)
    if norm in ("GN",):
        return GroupNorm32(features=features, dtype=dtype, name=name)
    if norm in ("BN", "SyncBN"):
        # Real trainable BN. Under jit-with-sharding the batch statistics are
        # global (see BatchNorm docstring), so "SyncBN" is the same module.
        return BatchNorm(features=features, dtype=dtype, name=name)
    raise ValueError(f"Unknown norm {norm!r}")


class DFConv2d(nn.Module):
    """Offset-predicting deformable conv (reference `slender_det/layers/
    df_conv.py:6-79`): a 3x3 conv predicts 18 offsets (v1) or 27 offsets+mask
    (v2 / modulated), feeding a deformable 3x3 conv. Offsets are produced in
    torch DCN convention ((dy,dx)*9 relative to the kernel grid) and shifted
    to the absolute convention of ops.deform_conv."""

    features: int
    modulated: bool = True       # v2
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.deform_conv import deform_conv2d_batched, kernel_base_offsets

        assert self.stride == 1, "strided DFConv2d not needed by the reference"
        b, h, w, cin = x.shape
        off_ch = 27 if self.modulated else 18
        pred = nn.Conv(off_ch, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros,
                       name="offset_conv")(x).astype(jnp.float32)
        rel = pred[..., :18].reshape(b, h, w, 9, 2)
        mask = jax.nn.sigmoid(pred[..., 18:]) if self.modulated else None

        base = jnp.asarray(kernel_base_offsets(3))
        weight = self.param("weight", nn.initializers.normal(stddev=0.01),
                            (9, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # gather in the compute dtype (bandwidth-bound); fp32 accumulation
        # happens inside the deform-conv matmul
        return deform_conv2d_batched(
            x, rel + base, weight, bias, mask
        ).astype(self.dtype)


def conv3x3(features: int, stride: int = 1, use_bias: bool = True, dtype=jnp.float32,
            name: Optional[str] = None, kernel_init=None) -> nn.Conv:
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=1, use_bias=use_bias,
        dtype=dtype, param_dtype=jnp.float32, name=name, **kwargs,
    )


def conv1x1(features: int, stride: int = 1, use_bias: bool = True, dtype=jnp.float32,
            name: Optional[str] = None, kernel_init=None) -> nn.Conv:
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(
        features, (1, 1), strides=(stride, stride), padding=0, use_bias=use_bias,
        dtype=dtype, param_dtype=jnp.float32, name=name, **kwargs,
    )
