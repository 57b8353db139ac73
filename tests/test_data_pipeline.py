"""Data pipeline + end-to-end evaluator tests on a synthetic COCO dataset."""

import numpy as np
import pytest

from slenderobjdet_tpu.config import get_cfg
from slenderobjdet_tpu.data import (
    DatasetCatalog,
    MetadataCatalog,
    build_detection_test_loader,
    build_detection_train_loader,
)
from slenderobjdet_tpu.data.datasets import register_coco_instances
from slenderobjdet_tpu.evaluation import COCOEvaluator, inference_on_dataset

from synthetic import make_coco_json


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("synthcoco")
    json_path, image_root = make_coco_json(tmpdir, num_images=6, slender=True)
    name = "synth_test"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_instances(name, json_path, image_root)
    return name


def small_cfg():
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.TPU.MAX_GT_PER_IMAGE = 10
    cfg.SOLVER.IMS_PER_BATCH = 2
    return cfg


def test_dataset_loading(synth_dataset):
    dicts = DatasetCatalog.get(synth_dataset)
    assert len(dicts) == 6
    meta = MetadataCatalog.get(synth_dataset)
    assert len(meta.thing_classes) == 3
    d = dicts[0]
    assert d["annotations"][0]["bbox"][2] > d["annotations"][0]["bbox"][0]  # XYXY
    assert 0 <= d["annotations"][0]["category_id"] < 3  # contiguous
    assert "ratio" in d["annotations"][0]


def test_test_loader_fixed_shapes(synth_dataset):
    cfg = small_cfg()
    loader = build_detection_test_loader(cfg, synth_dataset, batch_size=4)
    batches = list(loader)
    total_valid = sum(sum(b["batch_valid"]) for b in batches)
    assert total_valid == 6
    for b in batches:
        assert b["image"].shape[0] == 4
        assert b["image"].shape[1] % 128 == 0 or b["image"].shape[1] in (64, 128)
        assert b["gt_boxes"].shape == (4, 10, 4)


def test_train_loader_batches(synth_dataset):
    cfg = small_cfg()
    cfg.DATASETS.TRAIN = (synth_dataset,)
    loader = build_detection_train_loader(cfg, seed=7)
    it = iter(loader)
    b = next(it)
    assert b["image"].shape[0] == 2
    assert b["gt_valid"].any()
    b2 = next(it)
    assert b2["image"].shape == b["image"].shape  # same bucket -> same shape


def test_ratio_sampler_oversamples_slender(synth_dataset):
    from slenderobjdet_tpu.data.build import repeat_factors_from_ratios

    dicts = DatasetCatalog.get(synth_dataset)
    factors = repeat_factors_from_ratios(dicts)
    assert factors.min() >= 1.0
    has_slender = [
        any(a["ratio"] < 1 / 5 for a in d["annotations"]) for d in dicts
    ]
    for f, s in zip(factors, has_slender):
        assert f == pytest.approx(2.0 if s else 1.1, abs=0.5)


def test_oracle_evaluator_end_to_end(synth_dataset):
    """Feeding ground truth as predictions through the full loader+evaluator
    pipeline must give AP == 100 (validates coordinate round-trips: XYWH json
    -> XYXY mapper -> resize -> model coords -> rescale -> XYWH json)."""
    cfg = small_cfg()
    loader = build_detection_test_loader(cfg, synth_dataset, batch_size=2)
    evaluator = COCOEvaluator(synth_dataset)

    D = 10

    def oracle_predict(batch):
        B = batch["image"].shape[0]
        boxes = np.zeros((B, D, 4), np.float32)
        scores = np.zeros((B, D), np.float32)
        classes = np.zeros((B, D), np.int32)
        valid = np.zeros((B, D), bool)
        for i in range(B):
            scale = batch["scale"][i]
            n = int(batch["gt_valid"][i].sum())
            boxes[i, :n] = batch["gt_boxes"][i, :n] / scale  # back to orig coords
            classes[i, :n] = batch["gt_classes"][i, :n]
            scores[i, :n] = 0.9
            valid[i, :n] = True
        return {"boxes": boxes, "scores": scores, "classes": classes, "valid": valid}

    results = inference_on_dataset(oracle_predict, loader, evaluator, warmup=0)
    assert results["bbox"]["AP"] == pytest.approx(100.0, abs=0.5)
    assert results["bbox"]["AP50"] == pytest.approx(100.0, abs=0.5)
    assert results["ar"]["AR@100"] == pytest.approx(100.0, abs=0.5)
    # slender bucket exists in this dataset and is perfectly recalled
    assert results["bbox"]["AP-0-1/5"] == pytest.approx(100.0, abs=1.0)

    # per-category AP table (reference coco_evaluation.py:204-236): every
    # populated category is perfect under the oracle, and each category has
    # a 6-entry per-ratio AP row (all + 5 buckets)
    per_cat = results["bbox"]["AP-per-category"]
    assert len(per_cat) >= 2
    for name, apv in per_cat.items():
        if np.isfinite(apv):
            assert apv == pytest.approx(100.0, abs=1.0)
    ratios = results["bbox"]["AP-ratios"]
    assert set(ratios) == {"AP-" + n for n in per_cat}
    assert all(len(v) == 6 for v in ratios.values())


def test_multiprocess_loader_matches_single(synth_dataset):
    """NUM_WORKERS>1 fans the mapper over pool workers with
    order-preserving reassembly — test-time output must be bit-identical to
    the single-process path."""
    cfg1 = small_cfg()
    cfg1.DATALOADER.NUM_WORKERS = 0   # in-process reference path
    cfg2 = small_cfg()
    cfg2.DATALOADER.NUM_WORKERS = 2

    batches1 = list(build_detection_test_loader(cfg1, synth_dataset,
                                                batch_size=2))
    batches2 = list(build_detection_test_loader(cfg2, synth_dataset,
                                                batch_size=2))
    assert len(batches1) == len(batches2) > 0
    for b1, b2 in zip(batches1, batches2):
        assert b1["image_id"] == b2["image_id"]
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["gt_boxes"], b2["gt_boxes"])


def test_multiprocess_train_loader(synth_dataset):
    cfg = small_cfg()
    cfg.DATASETS.TRAIN = (synth_dataset,)
    cfg.DATALOADER.NUM_WORKERS = 2
    loader = build_detection_train_loader(cfg)
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        assert batch["image"].shape[0] == cfg.SOLVER.IMS_PER_BATCH
        assert np.isfinite(batch["gt_boxes"]).all()


def test_train_loader_sharded_union_is_global_batch(synth_dataset):
    """Multi-process loader contract: the shard loaders' rows, concatenated
    in shard order, reproduce the single-loader global batch EXACTLY (same
    membership, same padded shape, same mapped pixels/gt) — each process
    maps only its local_bs slice but every process agrees on global batch
    composition (slenderobjdet_tpu/data/build.py sharded_gen)."""
    cfg = small_cfg()
    cfg.DATASETS.TRAIN = (synth_dataset,)
    cfg.SOLVER.IMS_PER_BATCH = 4

    # explicit num_shards=1 through the SAME sharded path is not available
    # (num_shards==1 takes the local path), so the reference point is the
    # 2-shard layout vs the 4-shard layout: both must assemble to the same
    # global batches.
    def rows(num_shards):
        per = 4 // num_shards
        its = [iter(build_detection_train_loader(
            cfg, seed=7, shard_id=s, num_shards=num_shards))
            for s in range(num_shards)]
        out = []
        for _ in range(3):  # 3 global batches
            parts = [next(it) for it in its]
            out.append({
                k: np.concatenate([p[k] for p in parts], axis=0)
                for k in parts[0]
            })
            assert all(p["image"].shape[0] == per for p in parts)
        return out

    g2 = rows(2)
    g4 = rows(4)
    for b2, b4 in zip(g2, g4):
        assert set(b2) == set(b4)
        for k in b2:
            np.testing.assert_array_equal(b2[k], b4[k], err_msg=k)
