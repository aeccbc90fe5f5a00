"""Synthetic COCO-format dataset generator — fully offline demos/tests.

Writes a tiny COCO-style dataset (images + ``ann.json``) of bright
rectangles on dark noise: the rectangle's box is the detection target
and (optionally) its filled polygon is the instance segmentation. Every
tutorial notebook and ``examples/quickstart_synthetic.py`` trains
against this so the whole framework can be demonstrated with no
network, weights, or real data (this environment has no egress; the
reference's tutorials all require downloads).
"""

from __future__ import annotations

import json
import os

import numpy as np


def make_synthetic_coco(
    root: str,
    n_images: int = 8,
    seed: int = 0,
    image_size: int = 128,
    masks: bool = False,
):
    """Generate images with one bright rectangle each.

    Args:
      root: output directory (``images/`` + ``ann.json`` created).
      masks: also write polygon segmentations (rectangle outlines), so
        ``load_coco_dataset(include_masks=True)`` yields instance masks.

    Returns (img_dir, ann_file) paths.
    """
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    h = w = image_size
    for i in range(n_images):
        img = rng.integers(0, 60, size=(h, w, 3)).astype(np.uint8)
        bw = int(rng.integers(image_size // 4, image_size // 2))
        bh = int(rng.integers(image_size // 4, image_size // 2))
        x, y = int(rng.integers(0, w - bw)), int(rng.integers(0, h - bh))
        color = (255, 255, 255) if i % 2 == 0 else (255, 0, 0)
        cat = 1 if i % 2 == 0 else 2
        cv2.rectangle(img, (x, y), (x + bw, y + bh), color, -1)
        cv2.imwrite(os.path.join(img_dir, f"img{i}.png"), img)
        images.append({
            "id": i, "file_name": f"img{i}.png", "height": h, "width": w,
        })
        ann = {
            "id": i, "image_id": i, "category_id": cat,
            "bbox": [float(x), float(y), float(bw), float(bh)],
            "iscrowd": 0, "area": float(bw * bh),
        }
        if masks:
            ann["segmentation"] = [[
                float(x), float(y), float(x + bw), float(y),
                float(x + bw), float(y + bh), float(x), float(y + bh),
            ]]
        annotations.append(ann)
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "white-box"},
                           {"id": 2, "name": "red-box"}],
        }, f)
    return img_dir, ann_file
