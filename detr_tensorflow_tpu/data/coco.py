"""COCO dataset loader.

Capability parity with the reference loader (detr_tf/data/coco.py):
class-name table with N/A gaps and a trailing "back" background class at
``max_category_id + 1`` (coco.py:95-103), relative-xcycwh box conversion
(coco.py:44-52), crowd-image and empty-image filtering (coco.py:118),
shuffle + fixed-slot target padding + drop-remainder batching
(coco.py:110-125). Differences: no pycocotools / tf.data / imgaug
dependencies — a JSON index, a thread-pool pipeline, and cv2 transforms;
and instead of mutating the config with the discovered background class
(coco.py:103) the loader *returns* it via ``class_names``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from . import masks as seg_masks
from . import processing, transforms
from .coco_api import CocoIndex
from .multiscale import MultiScalePlan
from .pipeline import HostDataset, WorkerRNG

# Display names for the standard 91-id COCO category space + "back".
COCO_CLASS_NAME = [
    "N/A", "person", "bicycle", "car", "motorcycle", "airplane", "bus",
    "train", "truck", "boat", "traffic light", "fire hydrant", "N/A",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "N/A", "backpack",
    "umbrella", "N/A", "N/A", "handbag", "tie", "suitcase", "frisbee", "skis",
    "snowboard", "sports ball", "kite", "baseball bat", "baseball glove",
    "skateboard", "surfboard", "tennis racket", "bottle", "N/A", "wine glass",
    "cup", "fork", "knife", "spoon", "bowl", "banana", "apple", "sandwich",
    "orange", "broccoli", "carrot", "hot dog", "pizza", "donut", "cake",
    "chair", "couch", "potted plant", "bed", "N/A", "dining table", "N/A",
    "N/A", "toilet", "N/A", "tv", "laptop", "mouse", "remote", "keyboard",
    "cell phone", "microwave", "oven", "toaster", "sink", "refrigerator",
    "N/A", "book", "clock", "vase", "scissors", "teddy bear", "hair drier",
    "toothbrush", "back",
]


def _read_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    image = imageio.imread(path)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    if image.shape[-1] == 4:
        image = image[..., :3]
    return image


def get_coco_labels(
    coco: CocoIndex, img_id: int, image_shape, include_masks: bool = False
):
    """Boxes (n,4) relative xcycwh, classes (n,), is_crowd flag
    (reference coco.py:30-57). With ``include_masks``, also rasterizes
    the segmentation annotations to (n, H, W) uint8 — real mask ground
    truth, which the reference never decodes (its mask AP row is a zero
    placeholder, reference eval.py:54)."""
    anns = coco.loadAnnsForImage(img_id)
    h, w = float(image_shape[0]), float(image_shape[1])
    ih, iw = int(image_shape[0]), int(image_shape[1])
    bbox, cls, mks = [], [], []
    crowd = 0
    for ann in anns:
        x, y, bw, bh = ann["bbox"]
        if ann.get("iscrowd", 0):
            crowd = 1
        bbox.append([(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h])
        cls.append(ann["category_id"])
        if include_masks:
            mks.append(seg_masks.ann_to_mask(ann, ih, iw))
    out = (
        np.asarray(bbox, np.float32).reshape(-1, 4),
        np.asarray(cls, np.int32).reshape(-1),
        crowd,
    )
    if include_masks:
        return out + (
            np.stack(mks) if mks else np.zeros((0, ih, iw), np.uint8),
        )
    return out


def load_coco_dataset(
    config,
    batch_size: int,
    augmentation: Optional[bool] = False,
    ann_dir: Optional[str] = None,
    ann_file: Optional[str] = None,
    img_dir: Optional[str] = None,
    shuffle: bool = True,
    bucket_divisor: int = 128,
    num_workers: int = 8,
    seed: int = 0,
    include_masks: bool = False,
    paper_protocol: Optional[Tuple[int, int]] = None,
    full_res_masks: bool = False,
    multi_scale: Optional[Tuple[Tuple[int, int], ...]] = None,
):
    """Build (dataset, class_names).

    augmentation semantics follow the reference (coco.py:73):
      * True  — train transforms + resize to config.image_size;
      * False — resize only;
      * None  — original size (evaluation), bucket-padded with a pixel
        mask so XLA compiles a bounded set of shapes.

    include_masks adds rasterized instance masks to each example as
    ``t_masks`` (T, H/4, W/4) uint8 — slotted like boxes, at the mask
    head's stride-4 output resolution (models/segmentation.py).

    paper_protocol=(min_side, max_side) applies the DETR-paper eval
    resize (shortest side to min_side, longest capped at max_side) on
    the ``augmentation=None`` path before bucket padding — the protocol
    behind the paper's AP 42.0, which the reference only carries as
    disabled code (transformation.py:96-112).

    multi_scale (or ``config.multi_scale``) is a ladder of (H, W) train
    sizes: each example is transformed to one uniformly-drawn rung and
    the pipeline buckets batches by shape, so every batch is one static
    shape — the TPU-native adaptation of the DETR paper's multi-scale
    training (the paper's ragged shortest-side-{480..800} resize becomes
    a discrete ladder; the reference trains fixed-size only,
    README.md:19). One XLA train program is compiled per rung. Only
    meaningful with ``augmentation=True``.
    """
    del ann_dir
    ann_file = ann_file or config.data.full_ann_file
    img_dir = img_dir or config.data.full_img_dir
    coco = CocoIndex(ann_file)

    cats = coco.loadCats(coco.getCatIds())
    max_id = max(c["id"] for c in cats)
    class_names = ["N/A"] * (max_id + 2)
    class_names[-1] = "back"
    for c in cats:
        class_names[c["id"]] = c["name"]
    background_class = max_id + 1

    worker_rng = WorkerRNG(seed)
    if multi_scale is None:
        multi_scale = getattr(config, "multi_scale", None)
    # Training only: validation/eval stay fixed-size (one program).
    # The rung an example trains at is f(seed, image id) — reproducible
    # across runs and thread schedules; under multi-host the plan
    # switches to a batch-indexed schedule shared by all hosts so every
    # process emits the same shape at the same step (data/multiscale.py).
    plan = (
        MultiScalePlan(multi_scale, seed)
        if (multi_scale and augmentation is True)
        else None
    )

    def load_example(img_id):
        img = coco.loadImgs([img_id])[0]
        image = _read_image(os.path.join(img_dir, img["file_name"]))
        labels = get_coco_labels(
            coco, img["id"], image.shape, include_masks=include_masks
        )
        t_bbox, t_class, is_crowd = labels[:3]
        inst_masks = labels[3] if include_masks else None
        if is_crowd or len(t_bbox) == 0:
            return None  # reference filter, coco.py:118
        max_t = getattr(config, "num_queries", processing.MAX_TARGETS)
        if augmentation is not None:
            rng = worker_rng.get()
            size = plan.size_for(img_id) if plan else None
            transformed = transforms.detr_transform(
                image, t_bbox, t_class, config, augmentation,
                rng=rng, masks=inst_masks, image_size=size,
            )
            image, t_bbox, t_class = transformed[:3]
            if len(t_bbox) == 0:
                return None
            image = processing.normalized_images(image, config)
            boxes, classes, mask = processing.pad_targets(
                t_bbox, t_class, max_targets=max_t
            )
            example = {
                "images": image.astype(np.float32),
                "boxes": boxes, "classes": classes, "mask": mask,
            }
            if include_masks:
                example["t_masks"] = seg_masks.pad_instance_masks(
                    transformed[3], max_t
                )
            return example
        # Original-size eval: bucket-pad + pixel mask (shared helper).
        if paper_protocol is not None:
            image, inst_masks = transforms.shortest_side_resize(
                image, paper_protocol[0], paper_protocol[1], masks=inst_masks
            )
        return processing.make_eval_example(
            image, t_bbox, t_class, config, bucket_divisor,
            inst_masks=inst_masks, full_res_masks=full_res_masks,
        )

    ids = coco.getImgIds()
    # Batched eval (augmentation=None, batch_size > 1): bucket batches
    # by the padded image shape so every batch is one static shape, and
    # pad the final partial batch of each bucket instead of dropping it
    # — every val image is scored exactly once (batch_valid masks the
    # padding). The AP math is per-image, so batched == batch-1
    # (tests/test_end_to_end.py); padding invariance of the masked
    # forward makes the bucketing itself exact.
    eval_batched = augmentation is None and batch_size > 1
    dataset = HostDataset(
        ids, load_example, batch_size, shuffle=shuffle, seed=seed,
        num_workers=num_workers,
        bucket_key=(
            plan.bucket_key if plan
            else (lambda ex: ex["images"].shape) if eval_batched
            else None
        ),
        batch_transform=plan.batch_transform if plan else None,
        on_epoch_start=plan.set_epoch if plan else None,
        pad_remainder=eval_batched,
        image_dtype=getattr(config, "compute_dtype", None),
    )
    dataset.background_class = background_class
    return dataset, class_names
