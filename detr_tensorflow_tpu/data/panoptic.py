"""COCO panoptic annotation loader (things + stuff + void).

The reference repo has no panoptic support at all (its mask evaluator
row is a zero placeholder, reference eval.py:54); this loader enables
the published panoptic-PQ protocol (Kirillov et al.; DETR paper PQ
43.4) end to end: it parses ``panoptic_{split}.json`` and the paired
segment-id PNGs, and yields bucket-padded eval examples carrying
full-resolution segment masks, classes, iscrowd flags and the VOID
(unlabeled) region for `metrics.panoptic_quality`.

COCO panoptic PNG encoding: each pixel's segment id is
``R + 256*G + 256**2*B``; id 0 marks unlabeled (VOID) pixels.
Dependency-free like data/coco_api.py (json + cv2 PNG decode).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from . import processing
from .pipeline import HostDataset


class PanopticIndex:
    """Minimal index over a COCO ``panoptic_*.json`` file."""

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.images = {img["id"]: img for img in data.get("images", [])}
        self.anns = {a["image_id"]: a for a in data.get("annotations", [])}
        self.categories = {c["id"]: c for c in data.get("categories", [])}

    @property
    def stuff_classes(self):
        return sorted(
            cid for cid, c in self.categories.items()
            if not c.get("isthing", 1)
        )

    @property
    def thing_classes(self):
        return sorted(
            cid for cid, c in self.categories.items()
            if c.get("isthing", 1)
        )

    def image_ids(self):
        return sorted(self.anns.keys())


def decode_segment_png(png: np.ndarray) -> np.ndarray:
    """(H, W, 3) RGB panoptic PNG -> (H, W) int32 segment-id map."""
    png = png.astype(np.int32)
    return png[..., 0] + 256 * png[..., 1] + (256 * 256) * png[..., 2]


def segments_to_masks(
    id_map: np.ndarray, segments_info
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Segment-id map + segments_info -> per-segment data.

    Returns (masks (N, H, W) uint8, classes (N,) int32,
    iscrowd (N,) bool, void (H, W) bool). ``void`` covers id-0 pixels
    plus any pixel whose id has no segments_info entry.
    """
    known = np.zeros(id_map.shape, bool)
    masks, classes, iscrowd = [], [], []
    for seg in segments_info:
        m = id_map == int(seg["id"])
        known |= m
        masks.append(m.astype(np.uint8))
        classes.append(int(seg["category_id"]))
        iscrowd.append(bool(seg.get("iscrowd", 0)))
    n = len(masks)
    h, w = id_map.shape
    return (
        np.stack(masks) if n else np.zeros((0, h, w), np.uint8),
        np.asarray(classes, np.int32),
        np.asarray(iscrowd, bool),
        ~known,
    )


def _read_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def load_coco_panoptic_train(
    config,
    batch_size: int,
    ann_file: Optional[str] = None,
    png_dir: Optional[str] = None,
    img_dir: Optional[str] = None,
    num_workers: int = 4,
    shuffle: bool = True,
    seed: int = 0,
):
    """Panoptic TRAINING dataset: things+stuff segments as set-prediction
    targets (the DETR-panoptic recipe — every segment, stuff included,
    becomes one (box, class, mask) target; crowd segments are dropped).

    Yields standard train batches (images/boxes/classes/mask/t_masks at
    stride 4), so the ordinary `Trainer` + focal/dice mask losses train
    a panoptic model unchanged — pair with a head sized past the stuff
    ids (e.g. num_classes=max_stuff_id+2). Augmentation follows the
    detection train path (masks ride through flips/crops/resize).

    Returns (dataset, class_names) with ``background_class`` /
    ``stuff_classes`` attributes.
    """
    from . import transforms
    from .masks import pad_instance_masks
    from .pipeline import WorkerRNG

    ann_file = ann_file or config.data.full_ann_file
    img_dir = img_dir or config.data.full_img_dir
    if png_dir is None:
        png_dir = os.path.splitext(ann_file)[0]
    index = PanopticIndex(ann_file)

    max_id = max(index.categories) if index.categories else 0
    class_names = ["N/A"] * (max_id + 2)
    class_names[-1] = "back"
    for cid, c in index.categories.items():
        class_names[cid] = c["name"]
    background_class = max_id + 1
    worker_rng = WorkerRNG(seed)
    max_t = getattr(config, "num_queries", 100)

    def load_example(img_id):
        ann = index.anns[img_id]
        img_info = index.images[img_id]
        image = _read_rgb(os.path.join(img_dir, img_info["file_name"]))
        id_map = decode_segment_png(
            _read_rgb(os.path.join(png_dir, ann["file_name"]))
        )
        masks, classes, iscrowd, _ = segments_to_masks(
            id_map, ann["segments_info"]
        )
        keep = ~iscrowd
        masks, classes = masks[keep], classes[keep]
        if len(masks) == 0:
            return None
        h, w = image.shape[:2]
        boxes = []
        for m in masks:
            ys, xs = np.nonzero(m)
            x0, x1 = xs.min(), xs.max() + 1
            y0, y1 = ys.min(), ys.max() + 1
            boxes.append([(x0 + x1) / 2 / w, (y0 + y1) / 2 / h,
                          (x1 - x0) / w, (y1 - y0) / h])
        t_bbox = np.asarray(boxes, np.float32)
        out = transforms.detr_transform(
            image, t_bbox, classes, config, augmentation=True,
            rng=worker_rng.get(), masks=masks,
        )
        image, t_bbox, t_class, masks = out
        if len(t_bbox) == 0:
            return None
        image = processing.normalized_images(image, config)
        b, c, mask = processing.pad_targets(t_bbox, t_class, max_targets=max_t)
        return {
            "images": image.astype(np.float32),
            "boxes": b, "classes": c, "mask": mask,
            "t_masks": pad_instance_masks(masks, max_t),
        }

    dataset = HostDataset(
        index.image_ids(), load_example, batch_size, shuffle=shuffle,
        seed=seed, num_workers=num_workers,
        image_dtype=getattr(config, "compute_dtype", None),
    )
    dataset.background_class = background_class
    dataset.stuff_classes = index.stuff_classes
    dataset.thing_classes = index.thing_classes
    return dataset, class_names


def load_coco_panoptic(
    config,
    batch_size: int = 1,
    ann_file: Optional[str] = None,
    png_dir: Optional[str] = None,
    img_dir: Optional[str] = None,
    bucket_divisor: int = 128,
    num_workers: int = 4,
    shuffle: bool = False,
):
    """Panoptic evaluation dataset.

    Yields eval batches (``make_eval_example`` keys: images/pixel_mask/
    boxes/classes/mask) extended with full-resolution panoptic ground
    truth, all in the bucket frame:

      * ``t_masks_full`` (n, PH, PW) uint8 — every segment (things AND
        stuff, crowd included);
      * ``gt_is_crowd``  (n,) bool;
      * ``void_mask``    (PH, PW) bool — unlabeled pixels (the padded
        region is NOT void: predictions there are already masked out).

    Ragged in n, so batch_size must be 1 (the eval protocol's batch).
    Returns (dataset, class_names); the dataset carries
    ``background_class`` and ``stuff_classes`` attributes.
    """
    if batch_size != 1:
        raise ValueError("panoptic eval is batch-1 (ragged ground truth)")
    ann_file = ann_file or config.data.full_ann_file
    img_dir = img_dir or config.data.full_img_dir
    if png_dir is None:
        png_dir = os.path.splitext(ann_file)[0]  # COCO convention
    index = PanopticIndex(ann_file)

    max_id = max(index.categories) if index.categories else 0
    class_names = ["N/A"] * (max_id + 2)
    class_names[-1] = "back"
    for cid, c in index.categories.items():
        class_names[cid] = c["name"]
    background_class = max_id + 1

    def load_example(img_id):
        ann = index.anns[img_id]
        img_info = index.images[img_id]
        image = _read_rgb(os.path.join(img_dir, img_info["file_name"]))
        id_map = decode_segment_png(
            _read_rgb(os.path.join(png_dir, ann["file_name"]))
        )
        masks, classes, iscrowd, void = segments_to_masks(
            id_map, ann["segments_info"]
        )
        if len(masks) == 0:
            return None
        h, w = image.shape[:2]
        # Boxes from segments_info when present, else from masks.
        boxes = []
        for seg, m in zip(ann["segments_info"], masks):
            if "bbox" in seg:
                x, y, bw, bh = seg["bbox"]
            else:
                ys, xs = np.nonzero(m)
                x, y = xs.min(), ys.min()
                bw, bh = xs.max() - x + 1, ys.max() - y + 1
            boxes.append(
                [(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h]
            )
        example = processing.make_eval_example(
            image, np.asarray(boxes, np.float32), classes, config,
            bucket_divisor, inst_masks=masks, full_res_masks=True,
        )
        ph, pw = example["pixel_mask"].shape
        void_padded = np.zeros((ph, pw), bool)
        void_padded[:h, :w] = void
        example["gt_is_crowd"] = iscrowd
        example["void_mask"] = void_padded
        return example

    dataset = HostDataset(
        index.image_ids(), load_example, batch_size, shuffle=shuffle,
        num_workers=num_workers,
        image_dtype=getattr(config, "compute_dtype", None),
    )
    dataset.background_class = background_class
    dataset.stuff_classes = index.stuff_classes
    dataset.thing_classes = index.thing_classes
    return dataset, class_names
