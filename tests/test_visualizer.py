"""Visualizer instance/mask rendering (VERDICT r2 #6): filled polygon masks
with per-ratio colors — the reference paper-figure style
(/root/reference/slender_det/utils/visualizer.py:149-220)."""

import numpy as np
import pytest

from slenderobjdet_tpu.utils.visualizer import (
    RATIO_COLORS, Visualizer, group_by, ratio_group, smart_concatenate)


def test_draw_instances_masks_colored_by_ratio():
    img = np.zeros((100, 160, 3), np.uint8)
    vis = Visualizer(img)
    # one slender (w/h = 60/6 = 10 -> group 4) and one square (group 2) box
    boxes = np.array([[10.0, 10.0, 70.0, 16.0], [30.0, 40.0, 70.0, 80.0]])
    masks = [
        [[10, 10, 70, 10, 70, 16, 10, 16]],          # COCO flat polygon
        [np.array([[30, 40], [70, 40], [70, 80], [30, 80]], np.float32)],
    ]
    out = vis.draw_instances(boxes=boxes, masks=masks, scores=[0.9, 0.8],
                             classes=[0, 1], alpha=1.0)
    slender_color = np.array(RATIO_COLORS[ratio_group(60, 6)])
    square_color = np.array(RATIO_COLORS[ratio_group(40, 40)])
    assert ratio_group(60, 6) == 4 and ratio_group(40, 40) == 2
    # mask interiors carry their group color (alpha=1 -> exact fill)
    assert np.array_equal(out[13, 40], slender_color), out[13, 40]
    assert np.array_equal(out[60, 50], square_color), out[60, 50]
    # background untouched
    assert np.array_equal(out[95, 150], [0, 0, 0])


def test_draw_instances_alpha_blend():
    img = np.full((40, 40, 3), 200, np.uint8)
    vis = Visualizer(img)
    masks = [[np.array([[5, 5], [35, 5], [35, 35], [5, 35]], np.float32)]]
    out = vis.draw_instances(boxes=np.array([[5.0, 5.0, 35.0, 35.0]]),
                             masks=masks, alpha=0.5)
    inside = out[20, 20].astype(int)
    # 0.5 blend of the fill color with the 200-gray background
    color = np.array(RATIO_COLORS[ratio_group(30, 30)])
    expect = (0.5 * color + 0.5 * 200).astype(int)
    assert np.abs(inside - expect).max() <= 2, (inside, expect)


def test_group_by_overlapping_ranges():
    objs = ["a", "b", "c"]
    vals = [0.1, 0.5, 5.0]
    ranges = {
        "slender": [(0.0, 1 / 3), (3.0, 1e5)],   # list of conditions
        "normal": (1 / 3, 3.0),
        "all": (0.0, 1e5),
    }
    g = group_by(objs, vals, ranges)
    assert g["slender"] == ["a", "c"]
    assert g["normal"] == ["b"]
    assert g["all"] == ["a", "b", "c"]


def test_smart_concatenate_grid():
    imgs = [np.full((20, 30, 3), v, np.uint8) for v in (10, 20, 30, 40)]
    canvas = smart_concatenate(imgs)
    assert canvas.shape == (20, 30, 3)
    assert canvas[0, 0, 0] == 10 and canvas[-1, -1, 0] == 40
    wide = smart_concatenate(imgs, num_rows=1)
    # 4 columns of width 30//4 = 7; the last filled pixel column is 27
    assert wide[0, 0, 0] == 10 and wide[0, 27, 0] == 40
