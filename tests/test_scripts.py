"""End-to-end workflow smoke tests over the entry-point code paths,
driven with tiny models + synthetic datasets (no network, no weights)."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")  # repo-root scripts

from detr_tensorflow_tpu.data import load_coco_dataset
from detr_tensorflow_tpu.models import DetrModel, DETR, build_detr
from detr_tensorflow_tpu.train import DataConfig, Trainer, TrainingConfig, fit, eval_loop


@pytest.fixture
def coco_root(tmp_path, rng):
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 0
    for i in range(4):
        h, w = 70, 90
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"i{i}.png"), img)
        images.append({"id": i, "file_name": f"i{i}.png", "height": h, "width": w})
        for _ in range(2):
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": int(rng.integers(1, 3)),
                "bbox": [10.0, 10.0, 30.0, 30.0], "iscrowd": 0,
            })
            ann_id += 1
    (tmp_path / "ann.json").write_text(json.dumps({
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }))
    return tmp_path


def _tiny_bundle(num_classes, **kw):
    return build_detr(
        num_classes=num_classes, num_queries=6, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(64, 64),
        **{k: v for k, v in kw.items()},
    )


def test_eval_script_flow(coco_root):
    """eval.py's eval_model over synthetic COCO with a tiny model."""
    import importlib

    eval_mod = importlib.import_module("eval")
    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root), img_dir="images", ann_file="ann.json"),
    )
    valid_dt, class_names = load_coco_dataset(
        config, 1, augmentation=None, bucket_divisor=64, shuffle=False, num_workers=1
    )
    config = config.replace(background_class=valid_dt.background_class)

    # tiny model standing in for the pretrained DETR-R50
    module = DETR(
        num_classes=len(class_names), num_queries=6, model_dim=16, num_heads=2,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
        dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1),
    )
    import jax, jax.numpy as jnp

    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    model = DetrModel(module, variables)

    table = eval_mod.eval_model(model, config, class_names, valid_dt,
                                protocol="cocoeval")
    assert "box" in table and "all" in table["box"]
    assert np.isfinite(table["box"]["all"])
    # --protocol cocoeval rides along: the pycocotools-convention table
    # must be present and finite (metrics/coco_protocol.py).
    assert "box_cocoeval" in table
    assert np.isfinite(table["box_cocoeval"]["all"])


def test_finetune_flow_with_staged_unfreeze(coco_root):
    """The finetune_voc-style loop: heads-only epoch then unfreeze."""
    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root), img_dir="images", ann_file="ann.json"),
        image_size=(64, 64), batch_size=2, target_batch=None,
        train_nlayers=True, nlayers_lr=1e-3, num_queries=6,
    )
    train_dt, class_names = load_coco_dataset(
        config, 2, augmentation=False, num_workers=1
    )
    config = config.replace(background_class=train_dt.background_class)

    model = build_detr(
        num_classes=0, head="finetune", nb_class=len(class_names),
        num_queries=6, backbone_stage_sizes=(1, 1, 1, 1), image_size=(64, 64),
    )
    trainer = Trainer(model.module, model.variables, config)

    for epoch in range(2):
        if epoch == 1:
            trainer.set_trainable(train_transformers=True)
            trainer.set_learning_rates(transformers=1e-4, nlayers=1e-4)
        fit(trainer, train_dt, config, epoch, class_names)
    assert int(trainer.state.step) == 4  # 2 epochs x 2 batches

    logs = eval_loop(trainer, train_dt, config, class_names, evaluation_step=1)
    assert np.isfinite(float(logs[0]["total_loss"]))


def test_webcam_flow_on_video(tmp_path, rng):
    """webcam_inference.py loop against a synthetic video file."""
    import cv2
    import importlib

    video_path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), 5, (96, 64)
    )
    for _ in range(3):
        writer.write(rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8))
    writer.release()

    wc = importlib.import_module("webcam_inference")
    model = build_detr(
        num_classes=92, num_queries=6, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(64, 96),
    )
    frames = []
    n = wc.run_webcam_inference(
        model, video_path, image_size=(64, 96), display=False,
        frame_callback=frames.append, max_frames=2,
    )
    assert n == 2
    assert frames[0].shape == (64, 96, 3)

    # --masks path: segmentation model overlays instance masks per frame
    seg = build_detr(
        num_classes=92, num_queries=6, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(64, 96),
        masks=True, model_dim=16, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, dim_feedforward=32,
    )
    seg_frames = []
    n = wc.run_webcam_inference(
        seg, video_path, image_size=(64, 96), display=False,
        frame_callback=seg_frames.append, max_frames=1,
    )
    assert n == 1 and seg_frames[0].shape == (64, 96, 3)


def test_logger_hooks_run(coco_root):
    from detr_tensorflow_tpu.logger import train_log, valid_log

    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root), img_dir="images", ann_file="ann.json"),
        image_size=(64, 64),
    )
    train_dt, class_names = load_coco_dataset(config, 2, augmentation=False,
                                              num_workers=1)
    config = config.replace(background_class=train_dt.background_class)
    batch = next(iter(train_dt))
    rng = np.random.default_rng(0)
    outputs = {
        "pred_logits": rng.normal(size=(2, 6, len(class_names))).astype(np.float32),
        "pred_boxes": rng.uniform(0.2, 0.8, size=(2, 6, 4)).astype(np.float32),
    }
    train_log(batch, outputs, config, step=0, class_names=class_names)
    valid_log(batch, outputs, config, val_step=0, global_step=0,
              class_names=class_names, evaluation_step=1)


@pytest.fixture
def coco_root_seg(tmp_path, rng):
    """Synthetic COCO with segmentation annotations (polygon + RLE)."""
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 0
    for i in range(3):
        h, w = 70, 90
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"i{i}.png"), img)
        images.append({"id": i, "file_name": f"i{i}.png", "height": h, "width": w})
        # polygon instance: the 30x30 box at (10, 10)
        annotations.append({
            "id": ann_id, "image_id": i, "category_id": 1,
            "bbox": [10.0, 10.0, 30.0, 30.0], "iscrowd": 0,
            "segmentation": [[10, 10, 40, 10, 40, 40, 10, 40]],
        })
        ann_id += 1
        # uncompressed-RLE instance: full first column block (col-major)
        annotations.append({
            "id": ann_id, "image_id": i, "category_id": 2,
            "bbox": [50.0, 20.0, 10.0, 20.0], "iscrowd": 0,
            "segmentation": {
                "size": [h, w],
                "counts": [50 * h + 20, 20, 0],
            },
        })
        annotations[-1]["segmentation"]["counts"][-1] = h * w - (50 * h + 40)
        ann_id += 1
    (tmp_path / "ann.json").write_text(json.dumps({
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }))
    return tmp_path


def test_mask_finetune_and_eval_flow(coco_root_seg):
    """The finetune_coco_masks.py workflow on synthetic data: frozen
    detector, mask-head-only training, then a masked eval producing a
    real (finite) mask AP row — the reference's is a hardwired zero."""
    import importlib

    config = TrainingConfig(
        data=DataConfig(data_dir=str(coco_root_seg), img_dir="images",
                        ann_file="ann.json"),
        image_size=(64, 64), batch_size=1, target_batch=None,
        train_backbone=False, train_transformers=False, train_nlayers=True,
        nlayers_lr=1e-3, num_queries=6,
    )
    train_dt, class_names = load_coco_dataset(
        config, 1, augmentation=True, num_workers=1, include_masks=True
    )
    config = config.replace(background_class=train_dt.background_class)

    model = build_detr(
        num_classes=len(class_names), num_queries=6, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(64, 64),
        masks=True, model_dim=16, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, dim_feedforward=32,
    )
    trainer = Trainer(model.module, model.variables, config)
    batches = list(train_dt)
    assert batches and "t_masks" in batches[0]
    assert batches[0]["t_masks"].shape == (1, 6, 16, 16)
    log0 = trainer.step(batches[0])
    assert np.isfinite(float(log0["mask_loss"]))
    assert np.isfinite(float(log0["dice_loss"]))
    # frozen detector: only nlayers trains -> backbone params unchanged
    before = model.variables["params"]["backbone"]
    import jax

    same = jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        before, trainer.state.params["backbone"],
    )
    assert all(jax.tree_util.tree_leaves(same))

    # masked eval over the bucketed path with a real mask AP row
    eval_mod = importlib.import_module("eval")
    valid_dt, _ = load_coco_dataset(
        config, 1, augmentation=None, bucket_divisor=64, shuffle=False,
        num_workers=1, include_masks=True, full_res_masks=True,
    )
    bundle = DetrModel(model.module, trainer.variables)
    # COCO protocol (default): masks scored at original image resolution.
    table = eval_mod.eval_model(
        bundle, config, class_names, valid_dt, report_pq=True
    )
    assert np.isfinite(table["mask"]["all"])
    assert np.isfinite(table["box"]["all"])
    # --pq path: PQ/SQ/RQ computed over the panoptic merge
    assert "pq" in table and 0.0 <= table["pq"]["pq"] <= 1.0

    # stride-4 fast path still works and box AP is identical
    valid_dt2, _ = load_coco_dataset(
        config, 1, augmentation=None, bucket_divisor=64, shuffle=False,
        num_workers=1, include_masks=True,
    )
    table2 = eval_mod.eval_model(
        bundle, config, class_names, valid_dt2, report_pq=True,
        mask_lattice="stride4",
    )
    assert np.isclose(table2["box"]["all"], table["box"]["all"])
    assert "pq" in table2


def test_eval_batched_equals_batch1(tmp_path, rng):
    """eval.py --batch N (VERDICT r3 item 6): shape-bucketed batched
    eval scores every image exactly once and produces the identical AP
    table to the batch-1 protocol — two padding buckets, one of them
    with a repeat-padded remainder batch (batch_valid masking)."""
    import importlib
    import json as _json

    import cv2
    import jax
    import jax.numpy as jnp

    eval_mod = importlib.import_module("eval")

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 0
    # Two size groups -> two padding buckets at divisor 64; the first
    # group has 3 images so --batch 2 leaves a padded remainder.
    sizes = [(70, 90), (70, 90), (70, 90), (40, 50), (40, 50)]
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"i{i}.png"), img)
        images.append({"id": i, "file_name": f"i{i}.png",
                       "height": h, "width": w})
        for _ in range(2):
            annotations.append({
                "id": ann_id, "image_id": i,
                "category_id": int(rng.integers(1, 3)),
                "bbox": [5.0, 5.0, 20.0, 20.0], "iscrowd": 0,
            })
            ann_id += 1
    (tmp_path / "ann.json").write_text(_json.dumps({
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }))

    config = TrainingConfig(
        data=DataConfig(data_dir=str(tmp_path), img_dir="images",
                        ann_file="ann.json"),
    )
    module = DETR(
        num_classes=4, num_queries=6, model_dim=16, num_heads=2,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
        dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1),
    )
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    model = DetrModel(module, variables)

    tables = {}
    for bs in (1, 2):
        valid_dt, class_names = load_coco_dataset(
            config, bs, augmentation=None, bucket_divisor=64,
            shuffle=False, num_workers=1,
        )
        cfg = config.replace(background_class=valid_dt.background_class)
        # Batched mode groups by bucket and pads the remainder.
        seen = list(valid_dt)
        if bs == 2:
            assert all(b["images"].shape[0] == 2 for b in seen)
            assert sum(b["batch_valid"].sum() for b in seen) == len(sizes)
            assert any(not b["batch_valid"].all() for b in seen)
        tables[bs] = eval_mod.eval_model(
            model, cfg, class_names,
            seen,  # the materialized epoch — same images both modes
        )
    for key in tables[1]["box"]:
        np.testing.assert_allclose(
            tables[2]["box"][key], tables[1]["box"][key], atol=1e-9,
            err_msg=f"AP[{key}] batched != batch-1",
        )
