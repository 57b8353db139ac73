"""Test-time augmentation (multi-scale + horizontal flip).

Counterpart of detectron2's GeneralizedRCNNWithTTA as wired by the
reference's eval path (`train_net.py:128-142`, cfg.TEST.AUG.*): each image is
run at TEST.AUG.MIN_SIZES (optionally flipped), detections are mapped back to
original coordinates and merged with class-aware NMS.

Each (scale, orientation-bucket) pair is one compiled program; the merge is
host-side numpy (it is pure postprocessing on <=100 boxes per view).
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

from ..data.mapper import DatasetMapper


def _nms_numpy(boxes, scores, classes, thresh, max_out):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    shifted = boxes + classes[:, None].astype(np.float64) * 1e5
    areas = (shifted[:, 2] - shifted[:, 0]).clip(0) * \
        (shifted[:, 3] - shifted[:, 1]).clip(0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_out:
            break
        ix1 = np.maximum(shifted[i, 0], shifted[:, 0])
        iy1 = np.maximum(shifted[i, 1], shifted[:, 1])
        ix2 = np.minimum(shifted[i, 2], shifted[:, 2])
        iy2 = np.minimum(shifted[i, 3], shifted[:, 3])
        inter = (ix2 - ix1).clip(0) * (iy2 - iy1).clip(0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        suppressed |= iou > thresh
    return keep


def tta_predict(
    detector,
    variables,
    dataset_dict: Dict,
    cfg,
    predict_fns: Dict[int, Callable] = None,
) -> Dict[str, np.ndarray]:
    """Run one image through all TTA views; returns merged detections in
    original coordinates. `predict_fns` caches jitted predicts per scale."""
    import jax
    import jax.numpy as jnp

    min_sizes = list(cfg.TEST.AUG.MIN_SIZES)
    do_flip = cfg.TEST.AUG.FLIP
    all_boxes, all_scores, all_classes = [], [], []

    for short in min_sizes:
        view_cfg = cfg.clone()
        view_cfg.defrost()
        view_cfg.INPUT.MIN_SIZE_TEST = short
        view_cfg.INPUT.MAX_SIZE_TEST = cfg.TEST.AUG.MAX_SIZE
        mapper = DatasetMapper(view_cfg, is_train=False)
        for flip in ([False, True] if do_flip else [False]):
            ex = mapper(dict(dataset_dict))
            img = ex["image"]
            if flip:
                # Flip only the VALID resized region, not the padded canvas:
                # content stays at x in [0, rw], so detector.predict's clip to
                # the original extent is correct and un-mirroring is a pure
                # reflection about orig_w (no padding offset involved).
                rw = int(ex["image_size"][1])
                img = img.copy()
                img[:, :rw] = img[:, :rw][:, ::-1]
                img = np.ascontiguousarray(img)
            batch = {
                "image": jnp.asarray(img[None]),
                "scale": jnp.asarray([ex["scale"]], jnp.float32),
                "orig_size": jnp.asarray(ex["orig_size"][None], jnp.float32),
                "image_size": jnp.asarray(ex["image_size"][None], jnp.int32),
            }
            key = (short, img.shape[:2], flip)
            if predict_fns is not None and key in predict_fns:
                pf = predict_fns[key]
            else:
                pf = jax.jit(detector.predict)
                if predict_fns is not None:
                    predict_fns[key] = pf
            out = pf(variables, batch)
            boxes = np.asarray(out["boxes"][0])
            valid = np.asarray(out["valid"][0])
            boxes = boxes[valid]
            scores = np.asarray(out["scores"][0])[valid]
            classes = np.asarray(out["classes"][0])[valid]
            if flip and len(boxes):
                orig_w = float(ex["orig_size"][1])
                # exact reflection axis: the valid resized width mapped back
                # to original coordinates (differs from orig_w by <=1px of
                # resize rounding)
                mirror_w = float(ex["image_size"][1]) / float(ex["scale"])
                x1 = boxes[:, 0].copy()
                boxes[:, 0] = mirror_w - boxes[:, 2]
                boxes[:, 2] = mirror_w - x1
                boxes[:, 0::2] = boxes[:, 0::2].clip(0, orig_w)
            all_boxes.append(boxes)
            all_scores.append(scores)
            all_classes.append(classes)

    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4))
    scores = np.concatenate(all_scores) if all_scores else np.zeros((0,))
    classes = np.concatenate(all_classes) if all_classes else np.zeros((0,),
                                                                       np.int32)
    keep = _nms_numpy(boxes, scores, classes,
                      cfg.MODEL.RETINANET.NMS_THRESH_TEST,
                      cfg.TEST.DETECTIONS_PER_IMAGE)
    return {
        "boxes": boxes[keep], "scores": scores[keep],
        "classes": classes[keep],
    }
