"""Box geometry in pure jax.numpy.

Functional parity with the reference's ``detr_tf/bbox.py`` (format
converters at bbox.py:126-209, ``intersect``/``jaccard``/``merge`` at
bbox.py:29-124, numpy rescalers at bbox.py:213-295) but written as
shape-polymorphic ``(..., 4)`` jnp ops so the same code paths serve
per-image, batched, and vmapped callers on TPU.

Formats:
  * ``xcycwh`` — (x_center, y_center, width, height), normalized [0, 1]
  * ``xyxy``   — (xmin, ymin, xmax, ymax)
  * ``yxyx``   — (ymin, xmin, ymax, xmax)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# ---------------------------------------------------------------------------
# Format conversions (jnp, shape (..., 4))
# ---------------------------------------------------------------------------


def xcycwh_to_xyxy(b: Array, clip: bool = True) -> Array:
    """[xc, yc, w, h] -> [xmin, ymin, xmax, ymax].

    ``clip=True`` mirrors the reference's clip-to-[0,1]
    (bbox.py:180 ``xcycwh_to_xy_min_xy_max``), which both the matcher and
    the GIoU loss rely on.
    """
    xy = b[..., :2]
    wh = b[..., 2:]
    out = jnp.concatenate([xy - wh / 2.0, xy + wh / 2.0], axis=-1)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def xyxy_to_xcycwh(b: Array) -> Array:
    """[xmin, ymin, xmax, ymax] -> [xc, yc, w, h] (bbox.py:160)."""
    mins = b[..., :2]
    maxs = b[..., 2:]
    return jnp.concatenate([mins + (maxs - mins) / 2.0, maxs - mins], axis=-1)


def xyxy_to_yxyx(b: Array) -> Array:
    """Swap x/y pairs (bbox.py:128). Involutive: also yxyx -> xyxy."""
    return jnp.stack([b[..., 1], b[..., 0], b[..., 3], b[..., 2]], axis=-1)


yxyx_to_xyxy = xyxy_to_yxyx


def xcycwh_to_yxyx(b: Array, clip: bool = True) -> Array:
    return xyxy_to_yxyx(xcycwh_to_xyxy(b, clip=clip))


def yxyx_to_xcycwh(b: Array) -> Array:
    return xyxy_to_xcycwh(yxyx_to_xyxy(b))


# Reference-named aliases (detr_tf/bbox.py API parity).
xcycwh_to_xy_min_xy_max = xcycwh_to_xyxy
xy_min_xy_max_to_xcycwh = xyxy_to_xcycwh
xy_min_xy_max_to_yx_min_yx_max = xyxy_to_yxyx
yx_min_yx_max_to_xy_min_xy_max = yxyx_to_xyxy
xcycwh_to_yx_min_yx_max = xcycwh_to_yxyx
yx_min_yx_max_to_xcycwh = yxyx_to_xcycwh


# ---------------------------------------------------------------------------
# Areas / pairwise overlap (xyxy inputs)
# ---------------------------------------------------------------------------


def area(b: Array) -> Array:
    """Box area for xyxy boxes, shape (...,)."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def intersect(box_a: Array, box_b: Array) -> Array:
    """Pairwise intersection area between two xyxy sets.

    box_a: (..., A, 4), box_b: (..., B, 4) -> (..., A, B).
    Matches reference ``intersect`` (bbox.py:29-72) via broadcasting
    instead of tf.tile.
    """
    max_xy = jnp.minimum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    min_xy = jnp.maximum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    wh = jnp.maximum(max_xy - min_xy, 0.0)
    return wh[..., 0] * wh[..., 1]


def jaccard(box_a: Array, box_b: Array, return_union: bool = False):
    """Pairwise IoU between two xyxy sets (reference bbox.py:75-105).

    (..., A, 4) x (..., B, 4) -> (..., A, B).
    """
    inter = intersect(box_a, box_b)
    area_a = area(box_a)[..., :, None]
    area_b = area(box_b)[..., None, :]
    union = area_a + area_b - inter
    iou = inter / union
    if return_union:
        return iou, union
    return iou


def merge(box_a: Array, box_b: Array):
    """Tile two sets to (..., A, B, 4) each (reference bbox.py:107-124)."""
    a = jnp.broadcast_to(
        box_a[..., :, None, :],
        box_a.shape[:-2] + (box_a.shape[-2], box_b.shape[-2], 4),
    )
    b = jnp.broadcast_to(
        box_b[..., None, :, :],
        box_b.shape[:-2] + (box_a.shape[-2], box_b.shape[-2], 4),
    )
    return a, b


def giou(box_a: Array, box_b: Array, return_iou: bool = False):
    """Pairwise generalized IoU between two xyxy sets -> (..., A, B).

    giou = iou - (enclosing_area - union) / enclosing_area, identical to
    the inline computation in the reference matcher
    (hungarian_matching.py:184-190) and loss (loss.py:86-93).
    """
    iou, union = jaccard(box_a, box_b, return_union=True)
    top_left = jnp.minimum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    bottom_right = jnp.maximum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    wh = jnp.maximum(bottom_right - top_left, 0.0)
    enclose = wh[..., 0] * wh[..., 1]
    g = iou - (enclose - union) / enclose
    if return_iou:
        return g, iou
    return g


def elementwise_giou(box_a: Array, box_b: Array) -> Array:
    """GIoU between aligned pairs of xyxy boxes: (..., 4) x (..., 4) -> (...).

    Equivalent to ``diag(giou(a, b))`` (loss.py:94) without materializing
    the pairwise matrix — O(N) instead of O(N^2) on device.
    """
    inter_min = jnp.maximum(box_a[..., :2], box_b[..., :2])
    inter_max = jnp.minimum(box_a[..., 2:], box_b[..., 2:])
    inter_wh = jnp.maximum(inter_max - inter_min, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = area(box_a) + area(box_b) - inter
    iou = inter / union
    enc_min = jnp.minimum(box_a[..., :2], box_b[..., :2])
    enc_max = jnp.maximum(box_a[..., 2:], box_b[..., 2:])
    enc_wh = jnp.maximum(enc_max - enc_min, 0.0)
    enclose = enc_wh[..., 0] * enc_wh[..., 1]
    return iou - (enclose - union) / enclose


# ---------------------------------------------------------------------------
# Host-side numpy helpers (drawing / data pipeline; reference bbox.py:213-295)
# ---------------------------------------------------------------------------


def np_xcycwh_to_xyxy(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b)
    return np.concatenate([b[..., :2] - b[..., 2:] / 2.0, b[..., :2] + b[..., 2:] / 2.0], axis=-1)


def np_xyxy_to_xcycwh(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b)
    return np.concatenate(
        [b[..., :2] + (b[..., 2:] - b[..., :2]) / 2.0, b[..., 2:] - b[..., :2]], axis=-1
    )


def np_yxyx_to_xyxy(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b)
    return np.stack([b[..., 1], b[..., 0], b[..., 3], b[..., 2]], axis=-1)


def np_rescale_bbox_xcycwh(b: np.ndarray, img_size) -> np.ndarray:
    """Scale normalized xcycwh boxes to pixels; img_size is (height, width)."""
    b = np.asarray(b)
    h, w = img_size[0], img_size[1]
    return b * np.array([w, h, w, h])


def np_rescale_bbox_xy_min_xy_max(b: np.ndarray, img_size) -> np.ndarray:
    b = np.asarray(b)
    h, w = img_size[0], img_size[1]
    return b * np.array([w, h, w, h])


def np_rescale_bbox_yx_min_yx_max(b: np.ndarray, img_size) -> np.ndarray:
    b = np.asarray(b)
    h, w = img_size[0], img_size[1]
    return b * np.array([h, w, h, w])


# Reference-named numpy aliases.
np_xcycwh_to_xy_min_xy_max = np_xcycwh_to_xyxy
np_yx_min_yx_max_to_xy_min_xy_max = np_yxyx_to_xyxy


def bbox_xcycwh_to_x1y1x2y2(bbox_xcycwh: np.ndarray) -> np.ndarray:
    """Pixel-space xcycwh -> integer xyxy corners (reference bbox.py:14-26,
    used for drawing)."""
    b = np.asarray(bbox_xcycwh, np.float64)
    out = np.concatenate([b[..., :2] - b[..., 2:] / 2.0, b[..., :2] + b[..., 2:] / 2.0], axis=-1)
    return out.astype(np.int32)
