"""CSV-annotation dataset loader ("TensorFlow object detection CSV"
format: filename,width,height,class,xmin,ymin,xmax,ymax).

Capability parity with the reference (detr_tf/data/tfcsv.py): class
exclusion list (tfcsv.py:46-47), sorted unique class names with
"background" at index 0 (tfcsv.py:49-55), xyxy->xcycwh conversion
(tfcsv.py:27), per-file grouping of annotations.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from . import processing, transforms
from ..ops import boxes as bbox_ops
from .multiscale import MultiScalePlan
from .pipeline import HostDataset, WorkerRNG


def load_tfcsv_dataset(
    config,
    batch_size: int,
    augmentation: Optional[bool] = False,
    exclude: Optional[List[str]] = None,
    ann_dir: Optional[str] = None,
    ann_file: Optional[str] = None,
    img_dir: Optional[str] = None,
    shuffle: bool = True,
    num_workers: int = 8,
    seed: int = 0,
):
    """Build (dataset, class_names) from a CSV annotation file."""
    import pandas as pd

    del ann_dir
    ann_file = ann_file or config.data.ann_file
    img_dir = img_dir or config.data.img_dir
    anns = pd.read_csv(os.path.join(config.data.data_dir, ann_file))
    for name in exclude or []:
        anns = anns[anns["class"] != name]

    unique_class = sorted(anns["class"].unique().tolist())
    class_names = ["background"] + unique_class

    filenames = anns["filename"].unique().tolist()
    # Per-thread RNG streams: numpy Generators are not thread-safe and
    # load_example runs on the HostDataset worker pool (see WorkerRNG).
    worker_rng = WorkerRNG(seed)
    ladder = (
        getattr(config, "multi_scale", None) if augmentation is True else None
    )
    # Rung = f(seed, filename); host-synchronized under multi-host
    # (data/multiscale.py).
    plan = MultiScalePlan(ladder, seed) if ladder else None

    def load_example(filename):
        from .coco import _read_image

        image = _read_image(os.path.join(config.data.data_dir, img_dir, filename))
        rows = anns[anns["filename"] == filename]
        if not len(rows):
            return None
        t_class = rows["class"].map(class_names.index).to_numpy(np.int32)
        w = rows["width"].to_numpy()[0]
        h = rows["height"].to_numpy()[0]
        xyxy = rows[["xmin", "ymin", "xmax", "ymax"]].to_numpy(np.float64)
        xyxy = xyxy / np.array([w, h, w, h])
        t_bbox = bbox_ops.np_xyxy_to_xcycwh(xyxy).astype(np.float32)
        if augmentation is not None:
            rng = worker_rng.get()
            image, t_bbox, t_class = transforms.detr_transform(
                image, t_bbox, t_class, config, augmentation, rng=rng,
                image_size=plan.size_for(filename) if plan else None,
            )
            if len(t_bbox) == 0:
                return None
        image = processing.normalized_images(image, config)
        boxes, classes, mask = processing.pad_targets(t_bbox, t_class, max_targets=getattr(config, 'num_queries', processing.MAX_TARGETS))
        return {
            "images": image.astype(np.float32),
            "boxes": boxes, "classes": classes, "mask": mask,
        }

    dataset = HostDataset(
        filenames, load_example, batch_size, shuffle=shuffle, seed=seed,
        num_workers=num_workers,
        bucket_key=plan.bucket_key if plan else None,
        batch_transform=plan.batch_transform if plan else None,
        on_epoch_start=plan.set_epoch if plan else None,
        image_dtype=getattr(config, "compute_dtype", None),
    )
    dataset.background_class = 0
    return dataset, class_names
