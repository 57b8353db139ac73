"""Checkpointing: Orbax-backed save/resume + detectron2-pkl weight import.

Counterpart of the reference's `DetectionCheckpointer`
(`slender_det/checkpoint/checkpoint.py:11-63` + fvcore Checkpointer):
- periodic save of {params, buffers, opt_state, step} with a
  `last_checkpoint` pointer file and resume_or_load semantics
- MODEL.WEIGHTS loading: .pkl (detectron2 model zoo format) is imported by
  name-mapping into the Flax tree; orbax directories are restored natively
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class DetectionCheckpointer:
    def __init__(self, save_dir: str):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer() if _HAS_ORBAX else None
        self._pending = None

    # ----------------------------------------------------------- save/load
    def save(self, name: str, state: Any, blocking: bool = True):
        """Persist `state` under `name`. With blocking=False the host fetch
        and write run in a background thread so the train loop keeps
        dispatching device steps (periodic-save mode); at most one save is
        in flight — a new one first joins the previous. The
        `last_checkpoint` pointer is written only AFTER the data is on disk,
        so a crash mid-save can never leave a stale pointer."""
        import threading

        self.wait()

        if not blocking:
            # The train step DONATES its input state: by the time a
            # background thread fetches it, the next step may have reused
            # its buffers ("Array has been deleted"). Snapshot with an
            # on-device copy — a cheap async enqueue ordered BEFORE the
            # next step — and fetch the copy from the thread.
            import jax.numpy as jnp

            state = jax.tree_util.tree_map(
                lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                state)

        def do_save():
            path = os.path.join(self.save_dir, name)
            host_state = jax.device_get(state)
            if self._ckpt is not None:
                self._ckpt.save(path, host_state, force=True)
                self._ckpt.wait_until_finished()
            else:
                with open(path + ".pkl", "wb") as f:
                    pickle.dump(host_state, f)
            with open(os.path.join(self.save_dir, "last_checkpoint"),
                      "w") as f:
                f.write(name)

        if blocking:
            do_save()
        else:
            def guarded():
                try:
                    do_save()
                except BaseException as e:  # surfaced by wait()
                    self._error = e

            self._error = None
            self._pending = threading.Thread(target=guarded, daemon=True)
            self._pending.start()

    def wait(self):
        """Join any in-flight non-blocking save; re-raise its failure."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
            err, self._error = getattr(self, "_error", None), None
            if err is not None:
                raise RuntimeError("async checkpoint save failed") from err

    def has_checkpoint(self) -> bool:
        self.wait()
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> Optional[str]:
        self.wait()
        p = os.path.join(self.save_dir, "last_checkpoint")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return os.path.join(self.save_dir, f.read().strip())

    def load(self, path: str, target: Any) -> Any:
        """Restore a state pytree; `target` provides structure/shapes."""
        if self._ckpt is not None and os.path.isdir(path):
            target_struct = jax.tree_util.tree_map(np.asarray, jax.device_get(target))
            return self._ckpt.restore(path, target_struct)
        with open(path if path.endswith(".pkl") else path + ".pkl", "rb") as f:
            return pickle.load(f)

    def resume_or_load(self, weights_path: str, state: Any, resume: bool) -> Any:
        """d2 semantics: if resume and a checkpoint exists, restore it fully;
        otherwise (re)initialize from MODEL.WEIGHTS (params only)."""
        if resume and self.has_checkpoint():
            return self.load(self.get_checkpoint_file(), state)
        if weights_path:
            params, buffers = load_model_weights(weights_path, state.params,
                                                 getattr(state, "buffers", {}))
            state = state.replace(params=params, buffers=buffers)
        return state


# ----------------------------------------------------------- d2 pkl import
def load_model_weights(path: str, params, buffers):
    """Load MODEL.WEIGHTS into (params, buffers). Supports d2 .pkl zoo files
    and orbax/pickle checkpoints produced by this framework."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        state_dict = data.get("model", data)
        return import_d2_weights(state_dict, params, buffers)
    if path.endswith((".pth", ".pt")):
        # torch checkpoint: PVT/PVTv2 classification zoo layout (the
        # reference's load_checkpoint_from_http target)
        import torch

        data = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(data, dict):
            data = data.get("model", data.get("state_dict", data))
        state_dict = {
            k: np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in data.items()
        }
        if any(k.split("module.", 1)[-1].startswith("patch_embed1")
               for k in state_dict):
            return import_pvt_weights(state_dict, params), buffers
        raise ValueError(
            f"{path!r}: torch checkpoint does not look like a PVT zoo file "
            "(no patch_embed1 keys); only PVT .pth import is supported")
    raise ValueError(f"Unsupported weights file {path!r}")


def _d2_resnet_name_map(d2_name: str) -> Optional[tuple]:
    """Map a detectron2 ResNet/FPN parameter name to (our module path, leaf).

    d2 names (backbone.bottom_up prefix optional):
      stem.conv1.{weight,norm.weight,norm.bias,norm.running_mean,...}
      res{S}.{B}.conv{1,2,3}.{weight,norm.*}
      res{S}.{B}.shortcut.{weight,norm.*}
      fpn_lateral{L}.{weight,bias}, fpn_output{L}.{weight,bias}
      top_block.p6.{weight,bias}, top_block.p7.{weight,bias}
    """
    name = d2_name
    for prefix in ("backbone.bottom_up.", "backbone.", "bottom_up."):
        if name.startswith(prefix):
            name = name[len(prefix):]

    m = re.match(r"stem\.conv1\.(.*)", name)
    if m:
        return ("stem_conv1", "stem") , m.group(1)

    m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)\.(.*)", name)
    if m:
        stage, block, conv, rest = m.groups()
        return (f"res{stage}_{block}", conv), rest

    m = re.match(r"fpn_lateral(\d)\.(weight|bias)", name)
    if m:
        # d2 numbers laterals by stage (3,4,5); ours by index (0,1,2)
        return (f"fpn_lateral_stage{m.group(1)}", None), m.group(2)
    m = re.match(r"fpn_output(\d)\.(weight|bias)", name)
    if m:
        return (f"fpn_output_stage{m.group(1)}", None), m.group(2)
    m = re.match(r"top_block\.p(\d)\.(weight|bias)", name)
    if m:
        return (f"top_p{m.group(1)}", None), m.group(2)
    return None


def import_d2_weights(state_dict: Dict[str, np.ndarray], params, buffers):
    """Import detectron2 ResNet-FPN weights (NCHW torch layout) into the Flax
    NHWC trees. Folds BatchNorm running stats into FrozenBN scale/bias.
    Unmatched destination leaves keep their initialized values."""
    params = jax.device_get(params)
    buffers = jax.device_get(buffers)
    flat_params = _flatten(params)
    flat_buffers = _flatten(buffers)

    # group the d2 dict: conv weights and norm stats per conv
    loaded = 0
    norms: Dict[str, Dict[str, np.ndarray]] = {}
    in_features_order = []  # lateral/output stage numbers, sorted
    for k in state_dict:
        m = re.match(r"(?:backbone\.)?(?:bottom_up\.)?fpn_lateral(\d)\.weight", k)
        if m:
            in_features_order.append(int(m.group(1)))
    in_features_order.sort()
    stage_to_idx = {s: i for i, s in enumerate(in_features_order)}

    def put_param(path_tuple, value):
        nonlocal loaded
        key = "/".join(path_tuple)
        if key in flat_params:
            dst = flat_params[key]
            if dst.shape != value.shape:
                raise ValueError(f"shape mismatch {key}: {dst.shape} vs {value.shape}")
            flat_params[key] = value.astype(dst.dtype)
            loaded += 1

    for d2_name, value in state_dict.items():
        value = np.asarray(value)
        mapped = _d2_resnet_name_map(d2_name)
        if mapped is None:
            continue
        (module, sub), rest = mapped

        # translate lateral/output stage numbering to index numbering
        m = re.match(r"fpn_(lateral|output)_stage(\d)", module)
        if m:
            idx = stage_to_idx.get(int(m.group(2)))
            if idx is None:
                continue
            module = f"fpn_{m.group(1)}{idx}"

        if rest == "weight" and value.ndim == 4:
            # torch OIHW -> flax HWIO
            kernel = value.transpose(2, 3, 1, 0)
            if module == "stem_conv1":
                put_param(("backbone", "bottom_up", "stem_conv1", "kernel"), kernel)
            elif sub in ("conv1", "conv2", "conv3", "shortcut"):
                put_param(("backbone", "bottom_up", module, sub, "kernel"), kernel)
            else:  # fpn lateral/output/top convs live directly under backbone
                put_param(("backbone", module, "kernel"), kernel)
        elif rest == "bias" and value.ndim == 1:
            if sub in ("conv1", "conv2", "conv3", "shortcut"):
                put_param(("backbone", "bottom_up", module, sub, "bias"), value)
            else:
                put_param(("backbone", module, "bias"), value)
        elif rest.startswith("norm."):
            stat = rest[len("norm."):]
            key = (module, sub)
            norms.setdefault(f"{module}|{sub}", {})[stat] = value

    # fold norm stats: FrozenBN y = x * s + b with
    # s = weight / sqrt(var + eps), b = bias - mean * s
    eps = 1e-5
    for key, stats in norms.items():
        module, sub = key.split("|")
        need = {"weight", "bias", "running_mean", "running_var"}
        if not need.issubset(stats):
            continue
        s = stats["weight"] / np.sqrt(stats["running_var"] + eps)
        b = stats["bias"] - stats["running_mean"] * s
        # our FrozenBN module sits right after each conv; its buffer path is
        # backbone/<block>/<FrozenBatchNorm_i>/... — match by conv identity
        target_prefixes = _frozen_bn_path(flat_buffers, module, sub)
        for pfx in target_prefixes:
            flat_buffers[pfx + "/scale"] = s.astype(np.float32)
            flat_buffers[pfx + "/bias"] = b.astype(np.float32)
            loaded += 1

    if loaded == 0:
        raise ValueError("no weights matched the d2 name mapping")
    return _unflatten(flat_params, params), _unflatten(flat_buffers, buffers)


def import_pvt_weights(state_dict: Dict[str, np.ndarray], params):
    """Import a PVT / PVTv2 classification checkpoint (torch .pth layout,
    pvt_tiny/small/... zoo files — the reference loads these over HTTP into
    its detection backbone, `slender_det/modeling/backbone/pvt.py:273-275` +
    `checkpoint/checkpoint.py:23-47`) into the Flax PVT parameter tree.

    Classification-only leaves (cls_token, head.*, the v1 final `norm`) are
    skipped, like the reference's strict=False load. Our per-stage output
    LayerNorms (stage_norm{i}) import from the v2 checkpoints' top-level
    `norm{i}`; v1 checkpoints have no per-stage norm, so those keep init.
    pos_embed{i} drops the stage-4 cls token and is bilinearly resampled
    from the checkpoint's 224-based grid to the canonical parameter grid
    (the module resizes to the runtime grid in-graph, pvt.py)."""
    params = jax.device_get(params)
    flat = _flatten(params)

    anchor = [k for k in flat if k.endswith("patch_embed1/kernel")]
    if not anchor:
        raise ValueError("no PVT subtree (patch_embed1) in the param tree")
    prefix = anchor[0][: -len("patch_embed1/kernel")]

    loaded = 0

    def put(rel_path: str, value: np.ndarray):
        nonlocal loaded
        key = prefix + rel_path
        if key not in flat:
            return
        dst = flat[key]
        if dst.shape != value.shape:
            raise ValueError(
                f"shape mismatch {key}: {dst.shape} vs {value.shape}")
        flat[key] = value.astype(dst.dtype)
        loaded += 1

    ln_sub = {"weight": "scale", "bias": "bias"}
    for name, value in state_dict.items():
        value = np.asarray(value)
        name = name.split("module.", 1)[-1]

        m = re.match(r"patch_embed(\d)\.proj\.(weight|bias)$", name)
        if m:
            if m.group(2) == "weight":
                put(f"patch_embed{m.group(1)}/kernel",
                    value.transpose(2, 3, 1, 0))
            else:
                put(f"patch_embed{m.group(1)}/bias", value)
            continue
        m = re.match(r"patch_embed(\d)\.norm\.(weight|bias)$", name)
        if m:
            put(f"embed_norm{m.group(1)}/{ln_sub[m.group(2)]}", value)
            continue
        m = re.match(r"pos_embed(\d)$", name)
        if m:
            dst_key = prefix + f"pos_embed{m.group(1)}"
            if dst_key not in flat:
                continue
            n = value.shape[1]
            side = int(round(n ** 0.5))
            if side * side != n and int(round((n - 1) ** 0.5)) ** 2 == n - 1:
                value = value[:, 1:]  # stage-4 cls token
                side = int(round((n - 1) ** 0.5))
            grid = value.reshape(1, side, side, value.shape[-1])
            dst = flat[dst_key]
            resized = np.asarray(
                jax.image.resize(jnp.asarray(grid), dst.shape, "bilinear"))
            put(f"pos_embed{m.group(1)}", resized)
            continue
        m = re.match(r"norm(\d)\.(weight|bias)$", name)
        if m:  # PVTv2 per-stage output norm
            put(f"stage_norm{m.group(1)}/{ln_sub[m.group(2)]}", value)
            continue
        m = re.match(r"block(\d)\.(\d+)\.(.+)$", name)
        if m:
            blk = f"stage{m.group(1)}_block{m.group(2)}"
            rest = m.group(3)
            mm = re.match(r"(norm1|norm2)\.(weight|bias)$", rest)
            if mm:
                put(f"{blk}/{mm.group(1)}/{ln_sub[mm.group(2)]}", value)
                continue
            mm = re.match(r"attn\.(q|kv|proj)\.(weight|bias)$", rest)
            if mm:
                if mm.group(2) == "weight":
                    put(f"{blk}/attn/{mm.group(1)}/kernel", value.T)
                else:
                    put(f"{blk}/attn/{mm.group(1)}/bias", value)
                continue
            mm = re.match(r"attn\.sr\.(weight|bias)$", rest)
            if mm:
                if mm.group(1) == "weight":
                    put(f"{blk}/attn/sr/kernel", value.transpose(2, 3, 1, 0))
                else:
                    put(f"{blk}/attn/sr/bias", value)
                continue
            mm = re.match(r"attn\.norm\.(weight|bias)$", rest)
            if mm:
                put(f"{blk}/attn/sr_norm/{ln_sub[mm.group(1)]}", value)
                continue
            mm = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", rest)
            if mm:
                if mm.group(2) == "weight":
                    put(f"{blk}/{mm.group(1)}/kernel", value.T)
                else:
                    put(f"{blk}/{mm.group(1)}/bias", value)
                continue
            mm = re.match(r"mlp\.dwconv\.dwconv\.(weight|bias)$", rest)
            if mm:  # torch depthwise (C,1,3,3) -> flax grouped (3,3,1,C)
                if mm.group(1) == "weight":
                    put(f"{blk}/dwconv/kernel", value.transpose(2, 3, 1, 0))
                else:
                    put(f"{blk}/dwconv/bias", value)
                continue
        # cls_token / head.* / v1 final norm.* / pos_drop: classification-only

    if loaded == 0:
        raise ValueError("no weights matched the PVT name mapping")
    return _unflatten(flat, params)


def _frozen_bn_path(flat_buffers, module: str, sub: str):
    """FrozenBN buffers live at backbone/<module>/FrozenBatchNorm_{i} where i
    follows conv order within the block: conv1->0, conv2->1, conv3->2,
    shortcut->3 (declaration order in BottleneckBlock); stem -> 0."""
    if module == "stem_conv1":
        prefix = "backbone/bottom_up/FrozenBatchNorm_0"
        return [prefix] if prefix + "/scale" in flat_buffers else []
    if sub == "shortcut":
        # the shortcut norm is always the highest-indexed one in the block
        # (bottleneck: 3, basic: 2)
        for idx in (3, 2):
            prefix = f"backbone/bottom_up/{module}/FrozenBatchNorm_{idx}"
            if prefix + "/scale" in flat_buffers:
                return [prefix]
        return []
    order = {"conv1": 0, "conv2": 1, "conv3": 2}
    idx = order.get(sub)
    if idx is None:
        return []
    prefix = f"backbone/bottom_up/{module}/FrozenBatchNorm_{idx}"
    return [prefix] if prefix + "/scale" in flat_buffers else []


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray], template):
    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {
                k: walk(v, f"{prefix}/{k}" if prefix else str(k))
                for k, v in node.items()
            }
        return flat[prefix]

    return walk(template)
