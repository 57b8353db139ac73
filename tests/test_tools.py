"""Smoke tests for the tools layer over real evaluator artifacts."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from synthetic import make_coco_json

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Synthetic gt json + a results json (gt echoed with jitter)."""
    tmpdir = tmp_path_factory.mktemp("tools")
    gt_json, image_root = make_coco_json(tmpdir, num_images=4, slender=True)
    with open(gt_json) as f:
        data = json.load(f)
    results = []
    rng = np.random.RandomState(0)
    for ann in data["annotations"]:
        x, y, w, h = ann["bbox"]
        results.append({
            "image_id": ann["image_id"],
            "category_id": ann["category_id"],
            "bbox": [x + rng.randn(), y + rng.randn(), w, h],
            "score": float(rng.rand() * 0.5 + 0.5),
        })
    res_path = os.path.join(str(tmpdir), "coco_instances_results.json")
    with open(res_path, "w") as f:
        json.dump(results, f)
    metrics_path = os.path.join(str(tmpdir), "evaluate_metrics.json")
    with open(metrics_path, "w") as f:
        json.dump({"bbox": {"AP": 50.0, "AP-0-1/5": 30.0, "AP-1/5-1/3": 40.0,
                            "AP-1/3-3": 60.0, "AP-3-5": -100.0,
                            "AP-5-INF": -100.0, "AR-0-1/5": 35.0,
                            "AR-1/5-1/3": 45.0, "AR-1/3-3": 65.0,
                            "AR-3-5": -100.0, "AR-5-INF": -100.0}}, f)
    return {"gt": gt_json, "root": image_root, "results": res_path,
            "metrics": metrics_path, "dir": str(tmpdir)}


def run_tool(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (args, r.stdout[-2000:], r.stderr[-2000:])
    return r.stdout


def test_ar_result(artifacts):
    out = run_tool(["tools/ar_result.py", "--results", artifacts["results"],
                    "--gt-json", artifacts["gt"]])
    assert "AR@100" in out and "by aspect ratio" in out


def test_regression(artifacts):
    out = run_tool(["tools/regression.py", "--metrics", artifacts["metrics"]])
    assert "slope" in out


def test_plot_evaluation(artifacts):
    out_png = os.path.join(artifacts["dir"], "plot.png")
    run_tool(["tools/plot_evaluation.py", "--metrics", artifacts["metrics"],
              "--out", out_png])
    assert os.path.exists(out_png)


def test_data_statistic(artifacts):
    out = run_tool(["tools/data_statistic.py", "--gt-json", artifacts["gt"]])
    assert "instances" in out and "XS(0-1/5)" in out


def test_coco_class_info(artifacts):
    out = run_tool(["tools/coco_class_info.py", "--gt-json", artifacts["gt"]])
    assert "med-ratio" in out


def test_visualize(artifacts):
    out_dir = os.path.join(artifacts["dir"], "vis")
    run_tool(["tools/visualize_slender_results.py",
              "--results", artifacts["results"],
              "--gt-json", artifacts["gt"],
              "--image-root", artifacts["root"],
              "--out-dir", out_dir, "--score-thresh", "0.0"])
    assert len(os.listdir(out_dir)) > 0


def test_mask_to_rbox(artifacts):
    out_json = os.path.join(artifacts["dir"], "rcoco.json")
    run_tool(["tools/mask_to_rbox.py", "--gt-json", artifacts["gt"],
              "--out", out_json])
    with open(out_json) as f:
        data = json.load(f)
    assert all("rbox" in a for a in data["annotations"])


def test_webcv2_server():
    import urllib.request

    import numpy as np

    from slenderobjdet_tpu.utils import webcv2

    img = np.zeros((32, 32, 3), np.uint8)
    webcv2.imshow("test", img, port=18999)
    html = urllib.request.urlopen("http://127.0.0.1:18999/").read()
    assert b"webcv2" in html and b"/img/test" in html
    jpg = urllib.request.urlopen("http://127.0.0.1:18999/img/test").read()
    assert jpg[:2] == b"\xff\xd8"  # JPEG magic


def test_visualizer_grouping():
    from slenderobjdet_tpu.utils.visualizer import ratio_group

    assert ratio_group(50, 5) == 4   # very wide -> XL bucket
    assert ratio_group(5, 50) == 0   # very tall -> XS
    assert ratio_group(10, 10) == 2  # square -> M


def test_tta_predict():
    import jax

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.models import build_model
    from slenderobjdet_tpu.engine.tta import tta_predict

    cfg = make_tiny_cfg()
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 128
    cfg.TEST.AUG.FLIP = True
    cfg.freeze()
    det = build_model(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    dataset_dict = {
        "image": rng.randint(0, 255, (60, 80, 3)).astype(np.uint8),
        "image_id": 1,
        "annotations": [],
    }
    out = tta_predict(det, variables, dataset_dict, cfg, predict_fns={})
    assert out["boxes"].shape[1] == 4
    assert np.isfinite(out["boxes"]).all()


def test_merge_into_coco(artifacts):
    out_json = os.path.join(artifacts["dir"], "merged.json")
    run_tool(["tools/merge_into_coco.py", "--gt-json", artifacts["gt"],
              "--results", artifacts["results"], "--out", out_json,
              "--score-thresh", "0.0"])
    with open(out_json) as f:
        merged = json.load(f)
    with open(artifacts["gt"]) as f:
        orig = json.load(f)
    assert len(merged["annotations"]) == 2 * len(orig["annotations"])


def test_generate_border_maps(artifacts):
    out_dir = os.path.join(artifacts["dir"], "maps")
    out = run_tool(["tools/generate_border_maps.py",
                    "--gt-json", artifacts["gt"], "--out-dir", out_dir])
    assert "rendered maps" in out
    files = os.listdir(out_dir)
    assert files
    data = np.load(os.path.join(out_dir, files[0]))
    assert {"center", "border", "sizes"} <= set(data.files)


def test_tta_flip_geometry():
    """The flipped TTA view must map detections back to the SAME original
    coordinates as the unflipped view, even when the canvas is padded
    (regression: flipping the padded canvas + predict's orig-extent clip
    truncated left-side objects)."""
    import jax.numpy as jnp

    from conftest import make_tiny_cfg
    from slenderobjdet_tpu.engine.tta import tta_predict

    class SquareFinder:
        """Fake detector: 'detects' the bright square in canvas coords, then
        maps back by /scale and clips to the original extent exactly like the
        real predict does."""

        def predict(self, variables, batch):
            img = batch["image"][0].astype(jnp.float32).mean(-1)
            mask = img > 100
            xs = jnp.arange(img.shape[1], dtype=jnp.float32)
            ys = jnp.arange(img.shape[0], dtype=jnp.float32)
            colhit, rowhit = mask.any(0), mask.any(1)
            x1 = jnp.min(jnp.where(colhit, xs, 1e9))
            x2 = jnp.max(jnp.where(colhit, xs, -1e9)) + 1
            y1 = jnp.min(jnp.where(rowhit, ys, 1e9))
            y2 = jnp.max(jnp.where(rowhit, ys, -1e9)) + 1
            boxes = jnp.stack([x1, y1, x2, y2]) / batch["scale"][0]
            oh, ow = batch["orig_size"][0, 0], batch["orig_size"][0, 1]
            boxes = jnp.stack([
                jnp.clip(boxes[0], 0, ow), jnp.clip(boxes[1], 0, oh),
                jnp.clip(boxes[2], 0, ow), jnp.clip(boxes[3], 0, oh)])
            return {
                "boxes": boxes[None, None],
                "scores": jnp.ones((1, 1), jnp.float32),
                "classes": jnp.zeros((1, 1), jnp.int32),
                "valid": jnp.ones((1, 1), bool),
            }

    cfg = make_tiny_cfg()
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48,)
    cfg.TEST.AUG.MAX_SIZE = 128
    cfg.TEST.AUG.FLIP = True
    cfg.MODEL.RETINANET.NMS_THRESH_TEST = 0.5
    cfg.freeze()

    # white square near the LEFT edge (the case the old code truncated)
    img = np.zeros((60, 80, 3), np.uint8)
    img[20:40, 5:25] = 255
    dataset_dict = {"image": img, "image_id": 1, "annotations": []}
    out = tta_predict(SquareFinder(), None, dataset_dict, cfg, predict_fns={})
    # both views survive NMS into one cluster; every surviving box must sit on
    # the true square within resize-rounding tolerance
    assert len(out["boxes"]) >= 1
    expected = np.array([5, 20, 25, 40], np.float32)
    for b in out["boxes"]:
        assert np.abs(b - expected).max() < 3.0, (b, expected)
