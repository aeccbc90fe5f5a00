"""Inference postprocessing and visualization.

The TPU-native postprocess is **batched and static-shape**: for every
query it returns (box, label, score, keep) where ``keep`` marks
non-background detections — the jit-friendly equivalent of the
reference's dynamic ``tf.where`` filter over batch element 0
(detr_tf/inference.py:68-95). ``get_model_inference`` keeps the
reference's exact call signature and single-image ragged outputs for
API parity.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import boxes as bbox_ops

Array = jnp.ndarray


def postprocess(
    m_outputs: Dict[str, Array], background_class: int, bbox_format: str = "xy_center"
) -> Tuple[Array, Array, Array, Array]:
    """Batched, jittable postprocess.

    Args:
      m_outputs: {'pred_logits': (B, Q, C), 'pred_boxes': (B, Q, 4)}.
      background_class: class id to drop.
      bbox_format: 'xy_center' | 'xyxy' | 'yxyx' (reference naming).

    Returns (boxes (B, Q, 4), labels (B, Q), scores (B, Q), keep (B, Q)).
    """
    logits = m_outputs["pred_logits"]
    pred_boxes = m_outputs["pred_boxes"]
    probs = jax.nn.softmax(logits, axis=-1)
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1)
    keep = labels != background_class

    if bbox_format == "xy_center":
        out_boxes = pred_boxes
    elif bbox_format == "xyxy":
        out_boxes = bbox_ops.xcycwh_to_xyxy(pred_boxes, clip=True)
    elif bbox_format == "yxyx":
        out_boxes = bbox_ops.xcycwh_to_yxyx(pred_boxes, clip=True)
    else:
        raise NotImplementedError(bbox_format)
    return out_boxes, labels, scores, keep


def postprocess_masks(
    m_outputs: Dict[str, Array],
    out_size: Tuple[int, int] = None,
    threshold: float = 0.5,
) -> Array:
    """Binary instance masks from the segmentation head's logits.

    Args:
      m_outputs: model outputs containing 'pred_masks' (B, Q, Hm, Wm)
        logits at stride 4 (models/segmentation.py).
      out_size: optional (H, W) to bilinearly upsample the probabilities
        to (e.g. the padded input resolution) before thresholding.
      threshold: probability cutoff.

    Returns (B, Q, H, W) bool. Jittable for fixed out_size. The
    reference has no equivalent — its mask outputs are zero placeholders
    (reference eval.py:54).
    """
    logits = m_outputs["pred_masks"].astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    if out_size is not None and tuple(out_size) != logits.shape[2:]:
        b, q = probs.shape[:2]
        probs = jax.image.resize(
            probs, (b, q) + tuple(out_size), method="bilinear"
        )
    return probs > threshold


def merge_instance_masks(
    m_outputs: Dict[str, Array],
    background_class: int,
    mask_threshold: float = 0.5,
) -> Tuple[Array, Array]:
    """Panoptic-style non-overlapping merge of the per-query masks.

    Every pixel is assigned to the query maximizing
    ``class_score * mask_probability`` (the DETR panoptic pixel-argmax
    rule), restricted to non-background queries; pixels whose winning
    query's mask probability is below ``mask_threshold`` stay
    unassigned.

    Returns:
      seg_map: (B, Hm, Wm) int32 — winning query index per pixel, or -1.
      keep:    (B, Q) bool — non-background queries (index validity).

    Jittable; the reference has no segmentation at all (eval.py:54).
    """
    logits = m_outputs["pred_logits"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    scores = jnp.max(probs, axis=-1)  # (B, Q)
    labels = jnp.argmax(probs, axis=-1)
    keep = labels != background_class

    mprob = jax.nn.sigmoid(m_outputs["pred_masks"].astype(jnp.float32))
    weighted = mprob * jnp.where(keep, scores, 0.0)[:, :, None, None]
    best_q = jnp.argmax(weighted, axis=1).astype(jnp.int32)  # (B, Hm, Wm)
    best_prob = jnp.take_along_axis(
        mprob, best_q[:, None], axis=1
    )[:, 0]  # winning query's raw mask probability
    best_kept = jnp.take_along_axis(
        keep.astype(jnp.int32), best_q.reshape(best_q.shape[0], -1), axis=1
    ).reshape(best_q.shape).astype(bool)
    seg_map = jnp.where(
        (best_prob > mask_threshold) & best_kept, best_q, -1
    )
    return seg_map, keep


# ---------------------------------------------------------------------------
# Full-resolution (COCO-protocol) mask scoring helpers — host-side.
#
# COCO mask AP and panoptic PQ are defined at ORIGINAL image resolution
# (cf. reference compute_map.py:85-105 operating on full-size masks);
# the mask head emits stride-4 logits, so eval upsamples the cropped
# valid region bilinearly to the image frame before thresholding —
# exactly torch's F.interpolate(mode="bilinear", align_corners=False)
# semantics (facebook PostProcessSegm), equivalence-tested in
# tests/test_segmentation.py.
# ---------------------------------------------------------------------------


def np_bilinear_resize(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel bilinear resize of (H, W, C) float arrays.

    Matches torch ``F.interpolate(align_corners=False)`` / cv2
    INTER_LINEAR. Uses cv2 when available (fast path); the numpy
    fallback is the definition.
    """
    squeeze = x.ndim == 2
    x = np.ascontiguousarray(x, np.float32)
    if squeeze:
        x = x[..., None]
    h, w = x.shape[:2]
    if (h, w) == (out_h, out_w):
        return x[..., 0] if squeeze else x
    try:
        import cv2

        if x.shape[-1] <= 512:  # cv2 channel limit
            out = cv2.resize(x, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
            if out.ndim == 2:
                out = out[..., None]
            return out[..., 0] if squeeze else out
    except ImportError:
        pass
    # Pure-numpy half-pixel bilinear (the reference semantics).
    def axis_coords(n_out, n_in):
        c = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        c = np.clip(c, 0, n_in - 1)
        lo = np.floor(c).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        return lo, hi, (c - lo).astype(np.float32)

    ylo, yhi, wy = axis_coords(out_h, h)
    xlo, xhi, wx = axis_coords(out_w, w)
    top = x[ylo][:, xlo] * (1 - wx)[None, :, None] + x[ylo][:, xhi] * wx[None, :, None]
    bot = x[yhi][:, xlo] * (1 - wx)[None, :, None] + x[yhi][:, xhi] * wx[None, :, None]
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    return out[..., 0] if squeeze else out


def upsample_mask_probs(
    probs: np.ndarray, orig_hw: Tuple[int, int], stride: int = 4
) -> np.ndarray:
    """Upsample stride-``stride`` mask probabilities to the image frame.

    Args:
      probs: (Q, Hs, Ws) float probabilities on the (possibly padded)
        stride-s lattice.
      orig_hw: original (unpadded) image (H, W).

    Returns (H, W, Q) float32: the valid ``ceil(H/s) x ceil(W/s)`` cells
    cropped and bilinearly upsampled — the COCO-protocol frame for mask
    IoU.
    """
    h, w = int(orig_hw[0]), int(orig_hw[1])
    probs = np.asarray(probs, np.float32)
    if probs.shape[0] == 0:
        return np.zeros((h, w, 0), np.float32)
    vh = -(-h // stride)
    vw = -(-w // stride)
    crop = probs[:, :vh, :vw].transpose(1, 2, 0)
    return np_bilinear_resize(crop, h, w)


def np_merge_full_res(
    up_probs: np.ndarray,  # (H, W, Q) upsampled mask probabilities
    scores: np.ndarray,  # (Q,)
    keep: np.ndarray,  # (Q,) bool non-background
    mask_threshold: float = 0.5,
) -> np.ndarray:
    """Panoptic pixel-argmax merge at full image resolution.

    The host-side twin of ``merge_instance_masks`` operating on the
    COCO-protocol (full-resolution) lattice: each pixel goes to the
    non-background query maximizing ``score * mask_prob``; pixels whose
    winning mask probability is below the threshold stay -1.
    """
    weighted = up_probs * np.where(keep, scores, 0.0)[None, None, :]
    best_q = weighted.argmax(-1).astype(np.int32)  # (H, W)
    best_prob = np.take_along_axis(up_probs, best_q[..., None], axis=-1)[..., 0]
    best_kept = keep[best_q]
    return np.where((best_prob > mask_threshold) & best_kept, best_q, -1)


def get_model_inference(
    m_outputs: Dict[str, Array], background_class: int, bbox_format: str = "xy_center"
):
    """Reference-signature single-image inference (inference.py:68-95):
    operates on batch element 0 and returns ragged numpy arrays of the
    non-background detections."""
    boxes_, labels, scores, keep = postprocess(
        m_outputs, background_class, bbox_format
    )
    keep0 = np.asarray(keep[0])
    return (
        np.asarray(boxes_[0])[keep0],
        np.asarray(labels[0])[keep0],
        np.asarray(scores[0])[keep0],
    )


# ---------------------------------------------------------------------------
# Visualization (host-side, cv2) — reference inference.py:10-65
# ---------------------------------------------------------------------------

_CLASS_COLORS = np.random.RandomState(0).randint(0, 255, (200, 3))


def numpy_masks_to_image(
    image: np.ndarray,
    masks: np.ndarray,
    labels=None,
    alpha: float = 0.45,
    config=None,
    unnormalize: bool = True,
):
    """Alpha-blend per-instance masks onto an image (uint8 RGB returned).

    Args:
      image: (H, W, 3) image (normalized float or uint8).
      masks: (N, h, w) bool/float instance masks at any resolution —
        nearest-resized to the image size.
      labels: optional (N,) class ids for stable per-class colors.

    The reference has no mask visualization (masks are zero placeholders
    there); this is the segmentation twin of ``numpy_bbox_to_image``.
    """
    import cv2

    from .data.processing import denormalize_image

    image = np.asarray(image)
    if unnormalize and config is not None and image.dtype != np.uint8:
        image = denormalize_image(image, config)
    elif image.dtype != np.uint8:
        image = np.clip(image * 255.0, 0, 255).astype(np.uint8)
    image = np.ascontiguousarray(image).astype(np.float32)

    h, w = image.shape[:2]
    masks = np.asarray(masks)
    if labels is None:
        labels = np.arange(len(masks))
    for i, m in enumerate(masks):
        if m.shape != (h, w):
            m = cv2.resize(
                m.astype(np.uint8), (w, h), interpolation=cv2.INTER_NEAREST
            )
        sel = m > 0.5
        if not sel.any():
            continue
        color = _CLASS_COLORS[int(labels[i]) % 200].astype(np.float32)
        image[sel] = (1.0 - alpha) * image[sel] + alpha * color
    return np.clip(image, 0, 255).astype(np.uint8)


def numpy_bbox_to_image(
    image: np.ndarray,
    bbox_list: np.ndarray,
    labels=None,
    scores=None,
    class_name=(),
    config=None,
    unnormalize: bool = True,
):
    """Draw xcycwh-normalized boxes onto an image (uint8 RGB returned)."""
    import cv2

    from .data.processing import denormalize_image

    image = np.asarray(image)
    if unnormalize and config is not None and image.dtype != np.uint8:
        image = denormalize_image(image, config)
    elif image.dtype != np.uint8:
        image = np.clip(image * 255.0, 0, 255).astype(np.uint8)
    image = np.ascontiguousarray(image)

    h, w = image.shape[:2]
    bbox_list = np.asarray(bbox_list).reshape(-1, 4)
    if labels is None:
        labels = np.zeros((len(bbox_list),), int)
    xyxy = bbox_ops.np_xcycwh_to_xyxy(
        bbox_ops.np_rescale_bbox_xcycwh(bbox_list, (h, w))
    )
    areas = (xyxy[:, 2] - xyxy[:, 0]) * (xyxy[:, 3] - xyxy[:, 1])
    for b in np.argsort(areas)[::-1]:
        x1, y1, x2, y2 = (int(v) for v in xyxy[b])
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(w, x2), min(h, y2)
        class_id = int(labels[int(b)])
        name = (
            class_name[class_id]
            if class_id < len(class_name)
            else str(class_id)
        )
        if scores is not None and len(scores) > 0:
            name = f"{name}:{float(scores[b]):.2f}"
        color = tuple(int(c) for c in _CLASS_COLORS[class_id % 200])
        cv2.rectangle(image, (x1, y1), (x2, y2), color, 2)
        cv2.rectangle(image, (x1, y1 - 14), (x1 + 8 * len(name), y1), color, -1)
        cv2.putText(
            image, name, (x1 + 1, y1 - 3), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
            (0, 0, 0), 1,
        )
    return image
