"""Data pipeline: synthetic COCO/VOC/CSV datasets end to end."""

import json
import os

import numpy as np
import pytest

from detr_tensorflow_tpu.data import (
    HostDataset,
    detr_transform,
    load_coco_dataset,
    load_tfcsv_dataset,
    load_voc_dataset,
    pad_image_to_bucket,
)
from detr_tensorflow_tpu.train import DataConfig, TrainingConfig


class _Cfg:
    image_size = (64, 96)
    normalized_method = "torch_resnet"


def _write_png(path, h, w, rng):
    import cv2

    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    cv2.imwrite(path, img)


@pytest.fixture
def coco_root(tmp_path, rng):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 0
    for i in range(6):
        h, w = int(rng.integers(50, 120)), int(rng.integers(50, 120))
        name = f"img{i}.png"
        _write_png(str(img_dir / name), h, w, rng)
        images.append({"id": i, "file_name": name, "height": h, "width": w})
        for _ in range(int(rng.integers(1, 4))):
            bw, bh = float(rng.uniform(5, w / 2)), float(rng.uniform(5, h / 2))
            x, y = float(rng.uniform(0, w - bw)), float(rng.uniform(0, h - bh))
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": int(rng.integers(1, 4)),
                "bbox": [x, y, bw, bh], "iscrowd": 1 if i == 5 else 0,
            })
            ann_id += 1
    categories = [{"id": c, "name": f"cat{c}"} for c in (1, 2, 3)]
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": annotations, "categories": categories,
    }))
    return tmp_path


def test_host_dataset_batching_and_filtering(rng):
    def load(i):
        if i % 3 == 0:
            return None
        return {"x": np.full((2,), i, np.float32)}

    ds = HostDataset(list(range(12)), load, batch_size=2, shuffle=False)
    batches = list(ds)
    # 8 surviving examples -> 4 batches of 2
    assert len(batches) == 4
    assert batches[0]["x"].shape == (2, 2)
    seen = sorted(int(b["x"][j, 0]) for b in batches for j in range(2))
    assert seen == [i for i in range(12) if i % 3 != 0]


def test_detr_transform_resize_only(rng):
    img = rng.integers(0, 255, size=(100, 80, 3)).astype(np.uint8)
    boxes = np.array([[0.5, 0.5, 0.4, 0.6]], np.float32)
    out_img, out_boxes, out_cls = detr_transform(img, boxes, np.array([2]), _Cfg(), False)
    assert out_img.shape == (64, 96, 3)
    np.testing.assert_allclose(out_boxes, boxes, atol=1e-3)  # pure resize keeps rel coords
    assert out_cls.tolist() == [2]


def test_detr_transform_augmented_valid(rng):
    img = rng.integers(0, 255, size=(100, 80, 3)).astype(np.uint8)
    boxes = np.array([[0.5, 0.5, 0.4, 0.6], [0.3, 0.3, 0.2, 0.2]], np.float32)
    nrng = np.random.default_rng(3)
    for _ in range(20):
        out_img, out_boxes, out_cls = detr_transform(
            img, boxes, np.array([1, 2]), _Cfg(), True, rng=nrng
        )
        assert out_img.shape == (64, 96, 3)
        assert len(out_boxes) == len(out_cls) <= 2
        if len(out_boxes):
            assert (out_boxes[:, :2] >= 0).all() and (out_boxes[:, :2] <= 1).all()
            assert (out_boxes[:, 2:] > 0).all() and (out_boxes[:, 2:] <= 1 + 1e-6).all()


def test_coco_loader_end_to_end(coco_root):
    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root), img_dir="images", ann_file="ann.json"),
        image_size=(64, 96),
    )
    ds, class_names = load_coco_dataset(config, batch_size=2, augmentation=False,
                                        num_workers=2)
    assert class_names[-1] == "back"
    assert class_names[1] == "cat1"
    assert ds.background_class == 4
    batches = list(ds)
    assert len(batches) >= 1
    b = batches[0]
    assert b["images"].shape == (2, 64, 96, 3)
    assert b["boxes"].shape == (2, 100, 4)
    assert b["classes"].shape == (2, 100)
    assert b["mask"].shape == (2, 100)
    assert b["mask"].any()
    # crowd image (id 5) filtered: at most 5 usable examples -> 2 batches
    assert len(batches) <= 2


def test_coco_loader_original_size_buckets(coco_root):
    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root), img_dir="images", ann_file="ann.json"),
    )
    ds, _ = load_coco_dataset(
        config, batch_size=1, augmentation=None, bucket_divisor=64,
        shuffle=False, num_workers=1,
    )
    for b in ds:
        h, w = b["images"].shape[1:3]
        assert h % 64 == 0 and w % 64 == 0
        assert b["pixel_mask"].shape == (1, h, w)
        assert b["pixel_mask"].any()
        break


def test_bucket_padding_box_rescale(rng):
    img = rng.normal(size=(100, 150, 3)).astype(np.float32)
    padded, mask, (h, w) = pad_image_to_bucket(img, 64)
    assert padded.shape == (128, 192, 3)
    assert mask[:100, :150].all() and not mask[100:].any()
    np.testing.assert_array_equal(padded[:100, :150], img)


@pytest.fixture
def voc_root(tmp_path, rng):
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    import cv2

    for i in range(4):
        h, w = 80, 100
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "JPEGImages" / f"im{i}.jpg"), img)
        xml = f"""<annotation><size><width>{w}</width><height>{h}</height></size>
        <object><name>dog</name><bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax><ymax>60</ymax></bndbox></object>
        <object><name>cat</name><bndbox><xmin>30</xmin><ymin>20</ymin><xmax>90</xmax><ymax>70</ymax></bndbox></object>
        </annotation>"""
        (tmp_path / "Annotations" / f"im{i}.xml").write_text(xml)
    return tmp_path


def test_voc_loader_end_to_end(voc_root):
    config = TrainingConfig(
        data=DataConfig(data_dir=str(voc_root), img_dir="JPEGImages", ann_dir="Annotations"),
        image_size=(64, 96),
    )
    ds, class_names = load_voc_dataset(config, batch_size=2, augmentation=False,
                                       num_workers=2)
    assert class_names[0] == "back"
    assert set(class_names) == {"back", "dog", "cat"}
    assert ds.background_class == 0
    b = next(iter(ds))
    assert b["images"].shape == (2, 64, 96, 3)
    assert int(b["mask"][0].sum()) == 2


@pytest.fixture
def csv_root(tmp_path, rng):
    import cv2

    (tmp_path / "imgs").mkdir()
    rows = ["filename,width,height,class,xmin,ymin,xmax,ymax"]
    for i in range(4):
        name = f"f{i}.png"
        img = rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "imgs" / name), img)
        rows.append(f"{name},90,60,helmet,10,10,40,40")
        rows.append(f"{name},90,60,person,30,5,80,55")
    (tmp_path / "ann.csv").write_text("\n".join(rows))
    return tmp_path


def test_csv_loader_end_to_end(csv_root):
    config = TrainingConfig(
        data=DataConfig(data_dir=str(csv_root), img_dir="imgs", ann_file="ann.csv"),
        image_size=(64, 96),
    )
    ds, class_names = load_tfcsv_dataset(
        config, batch_size=2, augmentation=False, num_workers=2
    )
    assert class_names == ["background", "helmet", "person"]
    b = next(iter(ds))
    assert b["images"].shape == (2, 64, 96, 3)
    assert int(b["mask"][0].sum()) == 2

    ds2, class_names2 = load_tfcsv_dataset(
        config, batch_size=1, augmentation=False, exclude=["person"], num_workers=1
    )
    assert class_names2 == ["background", "helmet"]
    b2 = next(iter(ds2))
    assert int(b2["mask"][0].sum()) == 1


def test_host_dataset_multi_epoch_reshuffles(rng):
    seen_orders = []

    def load(i):
        return {"x": np.full((1,), i, np.float32)}

    ds = HostDataset(list(range(16)), load, batch_size=4, shuffle=True, seed=3)
    for _ in range(2):
        order = [int(v) for b in ds for v in b["x"][:, 0]]
        seen_orders.append(order)
        assert sorted(order) == list(range(16))
    assert seen_orders[0] != seen_orders[1]  # reshuffled between epochs


def test_host_dataset_early_break_no_deadlock():
    def load(i):
        return {"x": np.zeros((1,), np.float32)}

    ds = HostDataset(list(range(64)), load, batch_size=2, shuffle=False,
                     prefetch=2, num_workers=2)
    for k, _ in enumerate(ds):
        if k == 1:
            break  # abandon mid-epoch; producer must not deadlock
    # iterating again still works
    assert len(list(ds)) == 32


def test_prefetch_to_device(rng):
    from detr_tensorflow_tpu.data import prefetch_to_device

    batches = [{"x": rng.normal(size=(2, 3)).astype(np.float32)} for _ in range(5)]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert len(out) == 5
    for a, b in zip(batches, out):
        np.testing.assert_allclose(a["x"], np.asarray(b["x"]))


def test_coco_loader_with_augmentation(coco_root):
    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root), img_dir="images", ann_file="ann.json"),
        image_size=(64, 96),
    )
    ds, _ = load_coco_dataset(config, batch_size=2, augmentation=True, num_workers=2)
    b = next(iter(ds))
    assert b["images"].shape == (2, 64, 96, 3)
    assert b["mask"].any()


def test_host_dataset_producer_error_propagates():
    def load(i):
        if i == 5:
            raise RuntimeError("decode failed")
        return {"x": np.zeros((1,), np.float32)}

    ds = HostDataset(list(range(16)), load, batch_size=2, shuffle=False,
                     num_workers=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(ds)


def test_worker_rng_independent_streams():
    from concurrent.futures import ThreadPoolExecutor

    from detr_tensorflow_tpu.data.pipeline import WorkerRNG

    wr = WorkerRNG(seed=7)

    def draw(_):
        import time

        time.sleep(0.001)
        return wr.get().integers(0, 2**63 - 1, size=8).tolist()

    with ThreadPoolExecutor(4) as pool:
        draws = list(pool.map(draw, range(32)))
    # No two draw vectors identical (independent spawned streams, no
    # duplicated state), and same-thread reuse advances the stream.
    as_tuples = {tuple(d) for d in draws}
    assert len(as_tuples) == len(draws)


def test_voc_loader_original_size_buckets(voc_root):
    config = TrainingConfig(
        data=DataConfig(data_dir=str(voc_root), img_dir="JPEGImages",
                        ann_dir="Annotations"),
    )
    ds, _ = load_voc_dataset(config, batch_size=2, augmentation=None,
                             bucket_divisor=64, shuffle=False, num_workers=1)
    b = next(iter(ds))  # batch>1 of same-size originals stacks fine now
    h, w = b["images"].shape[1:3]
    assert h % 64 == 0 and w % 64 == 0
    assert b["pixel_mask"].shape == (2, h, w)
    assert b["pixel_mask"][:, :80, :100].all()
    assert not b["pixel_mask"][:, 80:, :].any()
    # boxes stay in original-frame normalized coordinates (the padding-
    # invariant network predicts valid-frame boxes; processing.py)
    assert (b["boxes"][b["mask"]] <= 1.0 + 1e-5).all()


def test_make_eval_example_matches_manual(rng):
    from detr_tensorflow_tpu.data.processing import (
        make_eval_example,
        normalized_images,
    )

    image = rng.integers(0, 255, size=(70, 110, 3)).astype(np.uint8)
    t_bbox = np.array([[0.5, 0.5, 0.4, 0.6]], np.float32)
    t_class = np.array([2], np.int32)
    ex = make_eval_example(image, t_bbox, t_class, _Cfg(), bucket_divisor=64)
    assert ex["images"].shape == (128, 128, 3)
    ref = normalized_images(image, _Cfg())
    np.testing.assert_allclose(ex["images"][:70, :110], ref, atol=1e-5)
    np.testing.assert_allclose(ex["images"][70:], 0.0)
    assert ex["pixel_mask"][:70, :110].all() and not ex["pixel_mask"][70:].any()
    # GT keeps original-frame normalized coordinates — the padding-
    # invariant forward predicts valid-frame boxes (processing.py).
    np.testing.assert_allclose(ex["boxes"][0], t_bbox[0], atol=1e-6)


def test_shortest_side_resize():
    from detr_tensorflow_tpu.data.transforms import shortest_side_resize

    img = np.zeros((100, 150, 3), np.uint8)
    masks = np.ones((2, 100, 150), np.uint8)
    out, m = shortest_side_resize(img, min_side=200, max_side=1000, masks=masks)
    assert out.shape[:2] == (200, 300)
    assert m.shape == (2, 200, 300)
    # max-side cap binds: 100x400 with min 200 would make the long side
    # 800 > 600 -> scale by 600/400 instead
    img2 = np.zeros((100, 400, 3), np.uint8)
    out2, _ = shortest_side_resize(img2, min_side=200, max_side=600)
    assert out2.shape[:2] == (150, 600)


def test_coco_loader_paper_protocol(tmp_path, rng):
    import cv2, json
    from detr_tensorflow_tpu.data import load_coco_dataset
    from detr_tensorflow_tpu.train import DataConfig, TrainingConfig

    img_dir = tmp_path / "images"; img_dir.mkdir()
    img = rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8)
    cv2.imwrite(str(img_dir / "i.png"), img)
    (tmp_path / "ann.json").write_text(json.dumps({
        "images": [{"id": 0, "file_name": "i.png", "height": 60, "width": 90}],
        "annotations": [{"id": 0, "image_id": 0, "category_id": 1,
                         "bbox": [10.0, 10.0, 30.0, 30.0], "iscrowd": 0}],
        "categories": [{"id": 1, "name": "a"}],
    }))
    config = TrainingConfig(
        data=DataConfig(data_dir=str(tmp_path), img_dir="images",
                        ann_file="ann.json"))
    ds, _ = load_coco_dataset(
        config, 1, augmentation=None, bucket_divisor=64, shuffle=False,
        num_workers=1, paper_protocol=(120, 200),
    )
    b = next(iter(ds))
    # 60x90 scaled by 2 (shortest 60->120), bucket 64 -> 128x192
    assert b["images"].shape[1:3] == (128, 192)
    assert b["pixel_mask"][0, :120, :180].all()
    assert not b["pixel_mask"][0, 120:, :].any()
    # normalized boxes unchanged by the protocol resize
    assert np.allclose(b["boxes"][0, 0], [(10 + 15) / 90, (10 + 15) / 60,
                                          30 / 90, 30 / 60], atol=1e-5)


def test_host_dataset_bucket_key():
    """bucket_key groups batches by key: every batch is shape-pure and
    per-bucket remainders are dropped (the multi-scale pipeline rule)."""
    def load(i):
        h = 4 if i % 2 == 0 else 6
        return {"x": np.full((h,), i, np.float32)}

    ds = HostDataset(list(range(10)), load, batch_size=2, shuffle=False,
                     bucket_key=lambda ex: ex["x"].shape)
    batches = list(ds)
    # 5 examples per bucket -> 2 full batches each, 1 remainder dropped.
    assert len(batches) == 4
    shapes = sorted(b["x"].shape for b in batches)
    assert shapes == [(2, 4), (2, 4), (2, 6), (2, 6)]
    # Within a bucket, arrival order is preserved.
    evens = [b for b in batches if b["x"].shape[1] == 4]
    assert [int(v) for b in evens for v in b["x"][:, 0]] == [0, 2, 4, 6]


def test_coco_loader_multi_scale(coco_root):
    """config.multi_scale: every train batch lands on one ladder rung
    (static shape), both rungs appear over epochs, and slotted targets
    (incl. stride-4 masks) follow the rung's shape."""
    rungs = ((32, 64), (64, 96))
    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root), img_dir="images",
                        ann_file="ann.json"),
        image_size=(64, 96), multi_scale=rungs,
    )
    ds, _ = load_coco_dataset(config, 2, augmentation=True, seed=3,
                              num_workers=2, include_masks=True)
    seen = set()
    for _ in range(6):
        for batch in ds:
            b, h, w, _ = batch["images"].shape
            assert b == 2
            assert (h, w) in rungs
            seen.add((h, w))
            assert batch["t_masks"].shape[2:] == (-(-h // 4), -(-w // 4))
            assert batch["boxes"].shape == (2, 100, 4)
    assert seen == set(rungs), seen
    # Validation stays fixed-size even with multi_scale in the config.
    vds, _ = load_coco_dataset(config, 2, augmentation=False, seed=3,
                               num_workers=2)
    for batch in vds:
        assert batch["images"].shape[1:3] == (64, 96)


def test_multi_scale_cli_pairs():
    from detr_tensorflow_tpu.train import training_config_parser

    p = training_config_parser()
    args = p.parse_args(["--multi_scale", "320", "576", "376", "672"])
    cfg = TrainingConfig().update_from_args(args)
    assert cfg.multi_scale == ((320, 576), (376, 672))


def test_multiscale_example_rung_deterministic():
    """Rung assignment is f(seed, example id) — stable across calls,
    processes (crc32, not salted hash), and thread schedules — and all
    rungs are reachable (ADVICE r3: reproducibility was previously
    thread-scheduling-dependent)."""
    from detr_tensorflow_tpu.data import multiscale as ms

    draws_int = [ms.example_rung(7, k, 3) for k in range(200)]
    draws_str = [ms.example_rung(7, f"img_{k}.jpg", 3) for k in range(200)]
    assert draws_int == [ms.example_rung(7, k, 3) for k in range(200)]
    assert draws_str == [ms.example_rung(7, f"img_{k}.jpg", 3) for k in range(200)]
    assert set(draws_int) == {0, 1, 2}
    assert set(draws_str) == {0, 1, 2}
    # Different seeds and different epochs decorrelate (each epoch
    # re-draws, as the paper's per-pass scale sampling does).
    assert draws_int != [ms.example_rung(8, k, 3) for k in range(200)]
    assert draws_int != [ms.example_rung(7, k, 3, epoch=1) for k in range(200)]


def test_multiscale_sync_hosts_emit_identical_shapes():
    """Multi-host mode: two 'hosts' holding DISJOINT data shards emit
    the same batch shape at every step (the shared batch_rung schedule),
    so a jitted SPMD train step never sees diverging shapes
    (ADVICE r3, medium)."""
    from detr_tensorflow_tpu.data import multiscale as ms

    rungs = ((32, 64), (48, 80), (64, 96))
    plan = ms.MultiScalePlan(rungs, seed=5, sync=True)
    assert plan.bucket_key is None  # no bucketing: all outputs top-rung

    def make_host(shard_offset):
        def load(i):
            h, w = plan.size_for(i)  # top rung, whatever the example
            assert (h, w) == plan.top
            return {
                "images": np.full((h, w, 3), shard_offset + i, np.float32),
                "boxes": np.zeros((10, 4), np.float32),
            }

        return HostDataset(
            list(range(shard_offset, shard_offset + 40)), load,
            batch_size=4, shuffle=True, seed=11 + shard_offset,
            num_workers=2, batch_transform=plan.batch_transform,
        )

    shapes_a = [b["images"].shape for b in make_host(0)]
    shapes_b = [b["images"].shape for b in make_host(1000)]
    assert shapes_a == shapes_b
    assert len(shapes_a) == 10
    assert {s[1:3] for s in shapes_a} == set(rungs)  # schedule hits all rungs
    # And the schedule is reproducible: a fresh pair sees the same order.
    assert shapes_a == [b["images"].shape for b in make_host(0)]


def test_multiscale_resize_batch_to_rung():
    """Batch resize: images land on the rung, t_masks land on the rung's
    stride-4 lattice, normalized boxes/classes/mask pass through
    untouched."""
    from detr_tensorflow_tpu.data.multiscale import resize_batch_to_rung

    rng = np.random.default_rng(0)
    batch = {
        "images": rng.normal(size=(2, 64, 96, 3)).astype(np.float32),
        "boxes": rng.uniform(size=(2, 10, 4)).astype(np.float32),
        "classes": rng.integers(0, 5, size=(2, 10, 1)).astype(np.int32),
        "mask": np.ones((2, 10, 1), np.int64),
        "t_masks": rng.integers(0, 2, size=(2, 10, 16, 24)).astype(np.uint8),
    }
    out = resize_batch_to_rung(batch, 34, 50)
    assert out["images"].shape == (2, 34, 50, 3)
    assert out["images"].dtype == np.float32
    assert out["t_masks"].shape == (2, 10, 9, 13)  # ceil(34/4), ceil(50/4)
    np.testing.assert_array_equal(out["boxes"], batch["boxes"])
    np.testing.assert_array_equal(out["classes"], batch["classes"])
    np.testing.assert_array_equal(out["mask"], batch["mask"])
    # No-op when already on the rung (identity, not a copy-resample).
    same = resize_batch_to_rung(batch, 64, 96)
    assert same["images"] is batch["images"]


def test_multiscale_coco_loader_sync_mode(coco_root):
    """End-to-end: the COCO loader in sync mode emits only ladder rungs
    with slotted targets following the rung (the multi-host path of
    test_coco_loader_multi_scale)."""
    from unittest import mock

    rungs = ((32, 64), (64, 96))
    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root), img_dir="images",
                        ann_file="ann.json"),
        image_size=(64, 96), multi_scale=rungs,
    )
    with mock.patch("jax.process_count", return_value=2):
        ds, _ = load_coco_dataset(config, 2, augmentation=True, seed=3,
                                  num_workers=2, include_masks=True)
    seen = set()
    for _ in range(6):
        for batch in ds:
            b, h, w, _ = batch["images"].shape
            assert (h, w) in rungs
            seen.add((h, w))
            assert batch["t_masks"].shape[2:] == (-(-h // 4), -(-w // 4))
    assert seen == set(rungs), seen


def test_bf16_image_ingest(coco_root):
    """compute_dtype="bfloat16" makes the host pipeline emit bf16 images
    — numerically identical to the model's own first cast (both RN),
    half the host->device image bytes, and no in-step f32->bf16 convert
    (docs/performance.md round 4)."""
    import ml_dtypes

    base = dict(
        data=DataConfig(data_dir=str(coco_root), img_dir="images",
                        ann_file="ann.json"),
        image_size=(64, 96),
    )
    cfg32 = TrainingConfig(**base)
    cfg16 = TrainingConfig(**base, compute_dtype="bfloat16")
    ds32, _ = load_coco_dataset(cfg32, batch_size=2, augmentation=False,
                                shuffle=False, num_workers=1)
    ds16, _ = load_coco_dataset(cfg16, batch_size=2, augmentation=False,
                                shuffle=False, num_workers=1)
    b32, b16 = next(iter(ds32)), next(iter(ds16))
    assert b32["images"].dtype == np.float32
    assert b16["images"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        b32["images"].astype(ml_dtypes.bfloat16), b16["images"]
    )
    # non-image arrays keep their dtypes
    assert b16["boxes"].dtype == np.float32
    assert b16["classes"].dtype == np.int32
