"""Smoke tests for the tools layer over real evaluator artifacts."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from synthetic import make_coco_json

# full-tier: heavy oracle/convergence/subprocess coverage (smoke tier = -m 'not slow')
pytestmark = pytest.mark.slow

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


def run_tool(args, timeout=300):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
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


@pytest.fixture(scope="module")
def proposal_pkl(artifacts):
    """box_proposals.pkl in the reference schema, aligned with artifacts."""
    import pickle

    rng = np.random.RandomState(1)
    ids, boxes, anchors, logits = [], [], [], []
    for img_id in (1, 2, 3, 4):
        n = 6
        b = rng.rand(n, 4).astype(np.float32) * 40
        b[:, 2:] += b[:, :2] + 10
        ids.append(img_id)
        boxes.append(b)
        anchors.append(b + 2.0)
        logits.append(rng.randn(n).astype(np.float32) + 2.0)
    path = os.path.join(artifacts["dir"], "box_proposals.pkl")
    with open(path, "wb") as f:
        pickle.dump({"ids": ids, "boxes": boxes, "anchors": anchors,
                     "objectness_logits": logits,
                     "bbox_mode": "XYXY_ABS"}, f)
    return path


def test_visualize_json_results(artifacts):
    out_dir = os.path.join(artifacts["dir"], "vis_json")
    out = run_tool(["tools/visualize_json_results.py",
                    "--result", artifacts["results"],
                    "--gt-json", artifacts["gt"],
                    "--image-root", artifacts["root"],
                    "--output", out_dir, "--conf-threshold", "0.0"])
    assert "comparisons" in out
    assert len(os.listdir(out_dir)) > 0


def test_visualize_proposals(artifacts, proposal_pkl):
    out_dir = os.path.join(artifacts["dir"], "vis_props")
    run_tool(["tools/visualize_proposals.py",
              "--proposal", proposal_pkl,
              "--result", artifacts["results"],
              "--gt-json", artifacts["gt"],
              "--image-root", artifacts["root"],
              "--output", out_dir, "--conf-threshold", "0.0",
              "--proposal-threshold", "0.1"])
    assert len(os.listdir(out_dir)) > 0


def test_result_statistic(artifacts):
    out_pkl = os.path.join(artifacts["dir"], "restat.pkl")
    out = run_tool(["tools/result_statistic.py",
                    "--prediction", artifacts["results"],
                    "--gt-json", artifacts["gt"], "--out", out_pkl])
    assert "[bbox]" in out and os.path.exists(out_pkl)
    import pickle

    with open(out_pkl, "rb") as f:
        metrics = pickle.load(f)
    assert np.isfinite(metrics["bbox"]["AP"])
    assert metrics["bbox"]["AP"] > 10  # jittered gt should score well


def test_watch_evaluate(artifacts):
    out = run_tool(["tools/watch_evaluate.py",
                    "--watch-dir", artifacts["dir"],
                    "--gt-json", artifacts["gt"], "--once"])
    assert "evaluating" in out
    assert os.path.exists(artifacts["results"] + ".evaluated")


def test_visulize_iou(artifacts):
    out_dir = os.path.join(artifacts["dir"], "vis_iou")
    out = run_tool(["tools/visulize_iou.py", "--out-dir", out_dir])
    assert len([f for f in os.listdir(out_dir) if f.endswith(".png")]) == 2


def test_plot(artifacts):
    out_png = os.path.join(artifacts["dir"], "paper_plot.png")
    # hardcoded reference numbers + one metrics json overlay
    metrics_path = os.path.join(artifacts["dir"], "em.json")
    with open(metrics_path, "w") as f:
        json.dump({"bbox": {"AP": 40.0, "AP-0-1/5": 30.0,
                            "AP-1/5-1/3": 35.0, "AP-1/3-3": 42.0},
                   "ar": {"AR@100": 55.0, "mAR@100": 50.0}}, f)
    run_tool(["tools/plot.py", "--out", out_png,
              "--metrics-json", f"ours-50={metrics_path}"])
    assert os.path.exists(out_png)


def test_visualize_data_annotation(artifacts):
    out_dir = os.path.join(artifacts["dir"], "vis_ann")
    out = run_tool(["tools/visualize_data.py", "--source", "annotation",
                    "--gt-json", artifacts["gt"],
                    "--image-root", artifacts["root"],
                    "--output-dir", out_dir])
    assert "all" in out and "problematic" in out
    assert len(os.listdir(out_dir)) > 0


def test_visualize_data_dataloader(artifacts):
    out_dir = os.path.join(artifacts["dir"], "vis_dl")
    run_tool(["tools/visualize_data.py", "--source", "dataloader",
              "--gt-json", artifacts["gt"],
              "--image-root", artifacts["root"],
              "--output-dir", out_dir, "--max-images", "2"])
    assert len(os.listdir(out_dir)) > 0


def _tiny_yaml(artifacts, meta_arch, extra=""):
    path = os.path.join(artifacts["dir"], f"tiny_{meta_arch}.yaml")
    with open(path, "w") as f:
        f.write(f"""
MODEL:
  META_ARCHITECTURE: "{meta_arch}"
  BACKBONE:
    NAME: "build_retinanet_resnet_fpn_backbone_use_p5"
  RESNETS:
    DEPTH: 18
    OUT_FEATURES: ["res3", "res4", "res5"]
  FPN:
    IN_FEATURES: ["res3", "res4", "res5"]
INPUT:
  MIN_SIZE_TEST: 64
  MAX_SIZE_TEST: 128
TPU:
  COMPUTE_DTYPE: "float32"
{extra}""")
    return path


def test_vis_feat_adaption_end_to_end(artifacts):
    cfg = _tiny_yaml(artifacts, "RepPointsDetector")
    out_dir = os.path.join(artifacts["dir"], "vis_adapt")
    out = run_tool(["tools/vis_feat_adaption.py", "--config-file", cfg,
                    "--gt-json", artifacts["gt"],
                    "--image-root", artifacts["root"],
                    "--out-dir", out_dir, "--num-images", "1",
                    "--top-locations", "5"])
    assert "feature-adaption views" in out
    assert len(os.listdir(out_dir)) == 1


def test_inference_obj365_end_to_end(artifacts):
    cfg = _tiny_yaml(artifacts, "FCOS")
    out_dir = os.path.join(artifacts["dir"], "obj365_out")
    out = run_tool(["tools/inference_obj365.py", "--config-file", cfg,
                    "--gt-json", artifacts["gt"],
                    "--image-root", artifacts["root"],
                    "--out-dir", out_dir, "--max-images", "2",
                    "--batch-size", "2", "--chunk", "2"])
    assert os.path.exists(os.path.join(out_dir, "obj365_metrics.json"))


# every BASELINE.json config family: reference 1x recipe -> short train ->
# slender eval, exercised end-to-end so a data-bearing round produces all
# five mAP numbers with zero new code (VERDICT r2 next-step #2)
BASELINE_REHEARSAL_CONFIGS = [
    ("configs/fcos/fcos_R_50_FPN_1x.yaml", []),
    ("configs/retina/retinanet_R_50_FPN_1x.yaml", []),
    ("configs/faster/faster_rcnn_R_50_FPN_1x.yaml", []),
    ("configs/rep-points/reppointsv2_R_50_FPN_1x.yaml", []),
    ("configs/rotated/rotated_retinanet_R_50_FPN_1x.yaml", []),
    ("configs/corner/corner_net_hourglass.yaml", []),
    # rotated two-stage (round 3): the exact rotated-NMS scan is O(post_k *
    # candidates) polygon clips on this 1-core CPU host, so ONLY the RPN
    # selection sizes are CI-shrunk; the recipe structure is untouched
    ("configs/rotated/faster_rcnn_rotated_R_50_FPN_1x.yaml",
     ["MODEL.RPN.PRE_NMS_TOPK_TRAIN", "200",
      "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
      "MODEL.RPN.POST_NMS_TOPK_TRAIN", "64",
      "MODEL.RPN.POST_NMS_TOPK_TEST", "64",
      "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32"]),
]


@pytest.mark.parametrize("config_file,extra_opts", BASELINE_REHEARSAL_CONFIGS)
def test_coco_rehearsal_dry_run(tmp_path, config_file, extra_opts):
    """The real-COCO rehearsal harness must dry-run the full 1x recipe path
    (register -> train -> checkpoint -> slender eval) on synthetic data for
    every BASELINE config family."""
    out_dir = os.path.join(str(tmp_path), "rehearsal")
    out = run_tool(["tools/coco_rehearsal.py", "--dry-run",
                    "--config-file", config_file,
                    "--output-dir", out_dir,
                    "SOLVER.MAX_ITER", "8", "SOLVER.STEPS", "(5, 7)"]
                   + extra_opts,
                   # the retina dry-run measured 430-560s on the 1-core CI
                   # host depending on load; 560 flaked once under heavy
                   # contention (round 5)
                   timeout=1200)
    assert "dry-run complete" in out
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))


def test_run_experiments_dry_run():
    """tools/run_experiments.py (reference tools/script.py): the family
    sweep derives the reference's dated output dirs and resumable
    train_net.py commands; --dry-run prints without running."""
    out = run_tool(["tools/run_experiments.py", "--model", "fcos",
                    "--dry-run", "--opts", "SOLVER.MAX_ITER", "20"])
    lines = [l for l in out.strip().splitlines() if "train_net.py" in l]
    assert len(lines) == 3  # depths 50/101/152
    for depth, line in zip((50, 101, 152), lines):
        assert f"configs/group_exp_for_backbone/fcos/r-{depth}.yaml" in line
        assert "--resume" in line and "OUTPUT_DIR" in line
        assert f"_fcos_R_{depth}_FPN_1x" in line
        assert line.rstrip().endswith("SOLVER.MAX_ITER 20")
    # explicit config list mode
    out = run_tool(["tools/run_experiments.py", "--model", "custom",
                    "--configs", "configs/fcos/fcos_R_50_FPN_1x.yaml",
                    "--dry-run"])
    assert "fcos_R_50_FPN_1x" in out


def test_coco_to_pack_tool(artifacts, tmp_path):
    """CLI counterpart test (library-level coverage in test_recordpack.py)."""
    out_pack = str(tmp_path / "cli.pack")
    run_tool(["tools/coco_to_pack.py", "--gt-json", artifacts["gt"],
              "--image-root", artifacts["root"], "--out", out_pack,
              "--max-images", "2"])
    from slenderobjdet_tpu.data.recordpack import PackReader
    assert len(PackReader(out_pack)) == 2


def test_data_time_synthetic_pack():
    """tools/data_time.py --synthetic: self-contained loader throughput
    A/B, file-backed and RecordPack-backed."""
    for extra in ([], ["--pack"]):
        out = run_tool(["tools/data_time.py", "--config-file",
                        "configs/fcos/fcos_R_50_FPN_1x.yaml",
                        "--synthetic", "4", "--workers", "2", "--batch", "2",
                        "--iters", "3", "--image-hw", "60", "80"] + extra)
        assert "img/s" in out
