"""RecordPack store (data/recordpack.py), smart_path, and the packed-input
mapper paths — the TPU-native equivalent of the reference's nori+redis
fetch (`slender_det/utils/nori_redis.py`), AsyncWriter
(`utils/async_writer.py`), OssMapper (`data/mappers/oss_mapper.py`), and
the coco_to_nori/nori_to_redis packing tools."""

import os
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from synthetic import make_coco_json

from slenderobjdet_tpu.data.recordpack import (
    AsyncPackWriter,
    PackReader,
    PackWriter,
)
from slenderobjdet_tpu.utils.smart_path import smart_path


def test_pack_roundtrip(tmp_path):
    path = str(tmp_path / "a.pack")
    blobs = {f"rec{i}": os.urandom(100 + 37 * i) for i in range(5)}
    with PackWriter(path) as w:
        for name, data in blobs.items():
            w.write(data, name)
        with pytest.raises(KeyError):
            w.write(b"x", "rec0")  # duplicate name
    r = PackReader(path)
    assert len(r) == 5 and set(r.keys()) == set(blobs)
    for name, data in blobs.items():
        assert name in r and r.get(name) == data
    with pytest.raises(KeyError):
        r.get("missing")
    r.close()


def test_pack_bad_magic(tmp_path):
    path = tmp_path / "junk.pack"
    path.write_bytes(b"not a pack at all, nope")
    with pytest.raises(ValueError, match="magic"):
        PackReader(str(path))


def test_async_writer(tmp_path):
    path = str(tmp_path / "async.pack")
    with AsyncPackWriter(path) as w:
        for i in range(20):
            w.write(f"payload-{i}".encode(), f"n{i}")
    r = PackReader(path)
    assert len(r) == 20
    assert r.get("n7") == b"payload-7"


def test_concurrent_reads(tmp_path):
    path = str(tmp_path / "c.pack")
    blobs = {f"k{i}": bytes([i]) * (1 + i) for i in range(64)}
    with PackWriter(path) as w:
        for name, data in blobs.items():
            w.write(data, name)
    r = PackReader(path)

    def read_all(seed):
        rng = np.random.RandomState(seed)
        for _ in range(50):
            k = f"k{rng.randint(64)}"
            assert r.get(k) == blobs[k]
        return True

    with ThreadPoolExecutor(8) as ex:
        assert all(ex.map(read_all, range(8)))


def test_smart_path_local_and_s3_gating(tmp_path):
    p = smart_path(str(tmp_path / "x.txt"))
    p.write_text("hi")
    assert p.read_text() == "hi"
    try:
        import s3path  # noqa: F401
        pytest.skip("s3path installed; gating branch not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="s3path"):
        smart_path("s3://bucket/key")


def _run_coco_to_pack(argv):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "coco_to_pack", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "coco_to_pack.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["coco_to_pack.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def packed_dataset(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("pack")
    gt_json, image_root = make_coco_json(tmpdir, num_images=3, slender=True)
    pack = str(tmpdir / "packtest.pack")
    _run_coco_to_pack(["--gt-json", gt_json, "--image-root", image_root,
                       "--out", pack, "--sizes"])
    return gt_json, image_root, tmpdir


def test_coco_to_pack_contents(packed_dataset):
    import json

    gt_json, image_root, tmpdir = packed_dataset
    r = PackReader(str(tmpdir / "packtest.pack"))
    with open(gt_json) as f:
        names = {os.path.basename(i["file_name"])
                 for i in json.load(f)["images"]}
    assert set(r.keys()) == names
    name = next(iter(names))
    with open(os.path.join(image_root, name), "rb") as f:
        assert r.get(name) == f.read()
    assert os.path.exists(str(tmpdir / "packtest_sizes.pack"))


def _mapper_cfg(meta_arch="FCOS", **overrides):
    from conftest import make_tiny_cfg

    cfg = make_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = meta_arch
    cfg.INPUT.MIN_SIZE_TEST = 120
    cfg.INPUT.MAX_SIZE_TEST = 160
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], v)
    cfg.freeze()
    return cfg


def _dataset_dicts(gt_json, image_root):
    from slenderobjdet_tpu.data.datasets import load_coco_json

    return load_coco_json(gt_json, image_root)


def test_mapper_reads_from_pack(packed_dataset):
    from slenderobjdet_tpu.data.mapper import DatasetMapper

    gt_json, image_root, tmpdir = packed_dataset
    dicts = _dataset_dicts(gt_json, image_root)
    plain = DatasetMapper(_mapper_cfg(), is_train=False)
    packed = DatasetMapper(
        _mapper_cfg(**{"USE_NORI": True, "NORI_PATH": str(tmpdir),
                       "DATASETS.TEST": ("packtest",)}),
        is_train=False)
    assert packed.image_pack is not None
    for d in dicts:
        a = plain(d, rng=np.random.default_rng(0))
        b = packed(d, rng=np.random.default_rng(0))
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
    # and through a renamed root: the pack alone must suffice
    moved = [dict(d, file_name=os.path.join("/nonexistent-root",
                                            os.path.basename(d["file_name"])))
             for d in dicts]
    c = packed(moved[0], rng=np.random.default_rng(0))
    ref = plain(dicts[0], rng=np.random.default_rng(0))
    np.testing.assert_array_equal(c["image"], ref["image"])


def test_mapper_oss_root(packed_dataset):
    from slenderobjdet_tpu.data.mapper import DatasetMapper

    gt_json, image_root, _ = packed_dataset
    dicts = _dataset_dicts(gt_json, image_root)
    plain = DatasetMapper(_mapper_cfg(), is_train=False)
    # OssMapper semantics (oss_mapper.py:47-50): file_name is RELATIVE to
    # the configured root; smart_path resolves local roots directly.
    oss = DatasetMapper(
        _mapper_cfg(**{"DATALOADER.OSS_ROOT": image_root}), is_train=False)
    d_rel = dict(dicts[0], file_name=os.path.basename(dicts[0]["file_name"]))
    a = plain(dicts[0], rng=np.random.default_rng(0))
    b = oss(d_rel, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(a["image"], b["image"])


def test_mapper_precomputed_sizes_pack(packed_dataset):
    """The `<split>_sizes.pack` fetch must reproduce the inline BorderMasks
    rendering when the transform is identity (scale=1, no flip)."""
    from slenderobjdet_tpu.data.mapper import DatasetMapper

    gt_json, image_root, tmpdir = packed_dataset
    dicts = _dataset_dicts(gt_json, image_root)
    kw = {"NEED_MASKS": True,
          "MODEL.META_ARCHITECTURE": "ProposalNetworkWithMasks"}
    inline = DatasetMapper(_mapper_cfg(**kw), is_train=False)
    packed = DatasetMapper(
        _mapper_cfg(**{**kw, "USE_NORI": True, "NORI_PATH": str(tmpdir),
                       "DATASETS.TEST": ("packtest",)}),
        is_train=False)
    assert packed.sizes_pack is not None
    hit = False
    for d in dicts:
        a = inline(d, rng=np.random.default_rng(0))
        b = packed(d, rng=np.random.default_rng(0))
        if "center_mask" not in a:
            continue
        hit = True
        assert float(a["scale"]) == 1.0
        np.testing.assert_allclose(a["center_mask"], b["center_mask"],
                                   atol=1e-5)
        np.testing.assert_allclose(a["border_mask"], b["border_mask"],
                                   atol=1e-5)
        np.testing.assert_allclose(a["size_map"], b["size_map"], atol=1e-3)
    assert hit


def test_async_writer_error_propagates(tmp_path):
    """A failure inside the writer thread (duplicate record name) surfaces
    as RuntimeError on write()/close() instead of deadlocking the producer
    against a full queue."""
    import time

    w = AsyncPackWriter(str(tmp_path / "err.pack"), maxsize=2).start()
    w.write(b"x", "dup")
    with pytest.raises(RuntimeError):
        for _ in range(200):
            w.write(b"y", "dup")
            time.sleep(0.005)
    with pytest.raises(RuntimeError):
        w.close()
