"""Host-side image/box/mask augmentation (imgaug-free).

Reproduces the reference's training pipeline semantics
(detr_tf/data/transformation.py:54-114):
  * horizontal flip p=0.5;
  * with p=0.5, one of {resize straight to the target size, random crop
    to the target size, affine scale x/y ~ U(0.5, 1.5) about the center};
  * a mandatory final resize to ``config.image_size``;
  * boxes transformed alongside, dropped when more than 70% of their
    area falls outside the image, clipped otherwise
    (transformation.py:187-189).

Validation mode resizes only (transformation.py:89-92); ``augmentation
is None`` means no geometry at all — the reference's original-size eval
convention (data/coco.py:73, SURVEY.md §3.2).

Instance masks (n, H, W) ride along through every op with
nearest-neighbor resampling — a capability the reference lacks (it never
decodes segmentations). Everything runs in numpy/cv2 on absolute-pixel
xyxy boxes and converts back to normalized xcycwh at the end.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..ops import boxes as bbox_ops

_INTERPOLATIONS = None


def _cv2():
    import cv2

    global _INTERPOLATIONS
    if _INTERPOLATIONS is None:
        _INTERPOLATIONS = [
            cv2.INTER_NEAREST, cv2.INTER_LINEAR, cv2.INTER_CUBIC, cv2.INTER_AREA,
        ]
    return cv2


def _resize_masks(masks, out_h, out_w):
    cv2 = _cv2()
    if masks is None or len(masks) == 0:
        return masks
    out = np.empty((len(masks), out_h, out_w), np.uint8)
    for i, m in enumerate(masks):
        out[i] = cv2.resize(m, (out_w, out_h), interpolation=cv2.INTER_NEAREST)
    return out


def _resize(image, boxes_xyxy, out_h, out_w,
            rng: Optional[np.random.Generator] = None, masks=None):
    cv2 = _cv2()
    h, w = image.shape[:2]
    interp = (
        _INTERPOLATIONS[rng.integers(0, len(_INTERPOLATIONS))]
        if rng is not None
        else cv2.INTER_LINEAR
    )
    image = cv2.resize(image, (out_w, out_h), interpolation=interp)
    scale = np.array([out_w / w, out_h / h, out_w / w, out_h / h])
    return image, boxes_xyxy * scale, _resize_masks(masks, out_h, out_w)


def _hflip(image, boxes_xyxy, masks=None):
    w = image.shape[1]
    image = image[:, ::-1]
    flipped = boxes_xyxy.copy()
    flipped[:, 0] = w - boxes_xyxy[:, 2]
    flipped[:, 2] = w - boxes_xyxy[:, 0]
    if masks is not None:
        masks = np.ascontiguousarray(masks[:, :, ::-1])
    return np.ascontiguousarray(image), flipped, masks


def _crop_to_fixed_size(image, boxes_xyxy, out_h, out_w, rng, masks=None):
    h, w = image.shape[:2]
    ch, cw = min(out_h, h), min(out_w, w)
    top = int(rng.integers(0, h - ch + 1))
    left = int(rng.integers(0, w - cw + 1))
    image = image[top : top + ch, left : left + cw]
    boxes_xyxy = boxes_xyxy - np.array([left, top, left, top])
    if masks is not None:
        masks = np.ascontiguousarray(masks[:, top : top + ch, left : left + cw])
    return np.ascontiguousarray(image), boxes_xyxy, masks


def _affine_scale(image, boxes_xyxy, rng, masks=None):
    cv2 = _cv2()
    h, w = image.shape[:2]
    sx = float(rng.uniform(0.5, 1.5))
    sy = float(rng.uniform(0.5, 1.5))
    cx, cy = w / 2.0, h / 2.0
    m = np.array([[sx, 0.0, cx * (1 - sx)], [0.0, sy, cy * (1 - sy)]])
    image = cv2.warpAffine(image, m, (w, h), flags=cv2.INTER_LINEAR)
    scaled = boxes_xyxy.copy().astype(np.float64)
    scaled[:, [0, 2]] = cx + sx * (scaled[:, [0, 2]] - cx)
    scaled[:, [1, 3]] = cy + sy * (scaled[:, [1, 3]] - cy)
    if masks is not None and len(masks):
        # warpAffine is limited to <=4 channels — per-instance loop.
        masks = np.stack([
            cv2.warpAffine(mk, m, (w, h), flags=cv2.INTER_NEAREST)
            for mk in masks
        ])
    return image, scaled, masks


def _filter_and_clip(boxes_xyxy, classes, h, w, max_outside_fraction=0.7):
    """Drop boxes mostly outside the image; clip the rest
    (transformation.py:187-189 semantics). Returns the keep mask too so
    aligned per-instance data (masks) can be filtered identically."""
    if len(boxes_xyxy) == 0:
        return boxes_xyxy, classes, np.zeros((0,), bool)
    area = np.maximum(boxes_xyxy[:, 2] - boxes_xyxy[:, 0], 0) * np.maximum(
        boxes_xyxy[:, 3] - boxes_xyxy[:, 1], 0
    )
    clipped = boxes_xyxy.copy()
    clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
    clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
    inside = np.maximum(clipped[:, 2] - clipped[:, 0], 0) * np.maximum(
        clipped[:, 3] - clipped[:, 1], 0
    )
    visible_fraction = np.where(area > 0, inside / np.maximum(area, 1e-9), 0.0)
    keep = visible_fraction > (1.0 - max_outside_fraction)
    keep &= inside > 0
    return clipped[keep], np.asarray(classes)[keep], keep


def shortest_side_resize(
    image: np.ndarray,
    min_side: int = 800,
    max_side: int = 1333,
    masks: Optional[np.ndarray] = None,
):
    """DETR-paper evaluation resize: scale so the shortest side reaches
    ``min_side``, capped so the longest side stays within ``max_side``.

    The reference carries this protocol only as disabled code
    (transformation.py:96-112, "Mode paper evaluation"); its published
    AP 36.53 skips it (README.md:93) while the paper's 42.0 uses it.
    Normalized box coordinates are scale-invariant, so only the image
    (and optional instance masks) are resampled.

    Returns (image, masks).
    """
    cv2 = _cv2()
    h, w = image.shape[:2]
    scale = min(min_side / min(h, w), max_side / max(h, w))
    nh, nw = int(round(h * scale)), int(round(w * scale))
    image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    return image, _resize_masks(masks, nh, nw)


def detr_transform(
    image: np.ndarray,
    bbox: np.ndarray,
    t_class: np.ndarray,
    config,
    augmentation: bool,
    rng: Optional[np.random.Generator] = None,
    masks: Optional[np.ndarray] = None,
    image_size: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, ...]:
    """Augment one image + normalized-xcycwh boxes (+ optional masks).

    Returns (image, boxes normalized xcycwh, classes) at
    ``config.image_size`` — signature parity with the reference
    ``detr_transform`` (transformation.py:163-195). When ``masks`` is
    given ((n, H, W) uint8), a fourth element with the transformed masks
    is appended. ``image_size`` overrides ``config.image_size`` for this
    one example (the multi-scale training path draws a per-example rung
    from the config's size ladder, data/coco.py).
    """
    if rng is None:
        rng = np.random.default_rng()
    out_h, out_w = image_size if image_size is not None else config.image_size
    h, w = image.shape[:2]
    t_class = np.asarray(t_class).reshape(-1)
    with_masks = masks is not None

    boxes_xyxy = bbox_ops.np_xcycwh_to_xyxy(np.asarray(bbox, np.float64)) * np.array(
        [w, h, w, h]
    )

    if augmentation:
        if rng.random() < 0.5:
            image, boxes_xyxy, masks = _hflip(image, boxes_xyxy, masks)
        if rng.random() < 0.5:
            op = rng.integers(0, 3)
            if op == 0:
                image, boxes_xyxy, masks = _resize(
                    image, boxes_xyxy, out_h, out_w, rng, masks
                )
            elif op == 1:
                image, boxes_xyxy, masks = _crop_to_fixed_size(
                    image, boxes_xyxy, out_h, out_w, rng, masks
                )
            else:
                image, boxes_xyxy, masks = _affine_scale(
                    image, boxes_xyxy, rng, masks
                )
        image, boxes_xyxy, masks = _resize(
            image, boxes_xyxy, out_h, out_w, rng, masks
        )
    else:
        image, boxes_xyxy, masks = _resize(image, boxes_xyxy, out_h, out_w,
                                           masks=masks)

    boxes_xyxy, t_class, keep = _filter_and_clip(
        boxes_xyxy, t_class, image.shape[0], image.shape[1]
    )
    if with_masks:
        masks = masks[keep] if len(keep) else masks[:0]

    hh, ww = image.shape[:2]
    norm = boxes_xyxy / np.array([ww, hh, ww, hh])
    out_boxes = (
        bbox_ops.np_xyxy_to_xcycwh(norm).astype(np.float32)
        if len(norm)
        else np.zeros((0, 4), np.float32)
    )
    if with_masks:
        return image, out_boxes, t_class, masks
    return image, out_boxes, t_class
