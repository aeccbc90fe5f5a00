"""Image normalization and fixed-size target packing.

TPU-native target layout: every image carries exactly ``MAX_TARGETS``
slots — ``boxes (T, 4)``, ``classes (T,)`` and a boolean ``mask (T,)``.
Static shapes end to end; no header-row trick.

The reference instead packs a count header as row 0 of the box tensor
(``[n, 0, 0, 0]``, detr_tf/data/processing.py:35-55) which every
consumer must strip (hungarian_matching.py:166-169, eval.py:48-52).
``pack_labels`` / ``unpack_labels`` convert between the two layouts for
API parity.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

MAX_TARGETS = 100

# ImageNet statistics used by the original PyTorch-trained DETR weights
# (reference processing.py:12-16).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# Caffe-style means for TF-pretrained ResNet backbones (processing.py:17-21).
CAFFE_MEAN = np.array([103.939, 116.779, 123.68], np.float32)


def normalized_images(image: np.ndarray, config) -> np.ndarray:
    """Normalize a uint8/float HWC image per the configured method.

    ``torch_resnet``: x/255 then ImageNet mean/std (for converted PyTorch
    weights). ``tf_resnet``: RGB->BGR then caffe mean subtraction (for
    tf-style pretrained backbones). Mirrors processing.py:6-23.
    """
    method = getattr(config, "normalized_method", "torch_resnet")
    if image.dtype == np.uint8 and image.ndim == 3 and image.shape[-1] == 3:
        # Fused single-pass C++ kernel (native/image_ops.cpp) — numpy
        # chains three whole-array temporaries for the same math.
        from . import native

        fast = (
            native.normalize_torch(image)
            if method == "torch_resnet"
            else native.normalize_caffe(image)
            if method == "tf_resnet"
            else None
        )
        if fast is not None:
            return fast
    if method == "torch_resnet":
        out = (image.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    elif method == "tf_resnet":
        out = image.astype(np.float32)[..., ::-1] - CAFFE_MEAN
    else:
        raise ValueError(f"unknown normalization method: {method}")
    return out.astype(np.float32)


def denormalize_image(image: np.ndarray, config) -> np.ndarray:
    """Invert ``normalized_images`` back to uint8 RGB for visualization."""
    method = getattr(config, "normalized_method", "torch_resnet")
    if method == "torch_resnet":
        out = (image * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    elif method == "tf_resnet":
        out = (image + CAFFE_MEAN)[..., ::-1]
    else:
        raise ValueError(f"unknown normalization method: {method}")
    return np.clip(out, 0, 255).astype(np.uint8)


def pad_targets(
    t_bbox: np.ndarray, t_class: np.ndarray, max_targets: int = MAX_TARGETS
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad per-image targets to the fixed slot count (native layout).

    Args:
      t_bbox: (n, 4) float boxes, xcycwh normalized.
      t_class: (n,) or (n, 1) int class ids.

    Returns (boxes (T, 4) f32, classes (T,) i32, mask (T,) bool).
    """
    t_class = np.asarray(t_class).reshape(-1)
    n = min(len(t_class), max_targets)
    boxes = np.zeros((max_targets, 4), np.float32)
    classes = np.zeros((max_targets,), np.int32)
    mask = np.zeros((max_targets,), bool)
    if n:
        boxes[:n] = np.asarray(t_bbox, np.float32)[:n]
        classes[:n] = t_class[:n]
        mask[:n] = True
    return boxes, classes, mask


def pad_labels(images, t_bbox, t_class, max_targets: int = MAX_TARGETS):
    """Reference-layout padding (processing.py:35-55): header row
    ``[n, 0, 0, 0]`` followed by up to ``max_targets - 1`` real boxes."""
    t_class = np.asarray(t_class).reshape(-1, 1)
    n = min(len(t_class), max_targets - 1)
    bbox_out = np.zeros((max_targets, 4), np.float32)
    cls_out = np.zeros((max_targets, 1), np.int64)
    bbox_out[0, 0] = n
    if n:
        bbox_out[1 : n + 1] = np.asarray(t_bbox, np.float32)[:n]
        cls_out[1 : n + 1] = t_class[:n]
    return images, bbox_out, cls_out


def pad_image_to_bucket(image: np.ndarray, divisor: int = 128):
    """Zero-pad an image so H and W are multiples of ``divisor``.

    Static-shape discipline for variable-size (original-size) evaluation:
    the reference re-traces eagerly per unique image shape
    (SURVEY.md §3.2); bucketing bounds the number of compiled programs
    while the validity mask keeps attention/positional encodings exact.

    Returns (padded_image, pixel_mask (H', W') bool, (orig_h, orig_w)).
    Normalized box coordinates must be rescaled by
    ``(orig / padded)`` per axis — IoU is invariant since both
    predictions and ground truth scale identically.
    """
    h, w = image.shape[:2]
    ph = ((h + divisor - 1) // divisor) * divisor
    pw = ((w + divisor - 1) // divisor) * divisor
    out = np.zeros((ph, pw) + image.shape[2:], image.dtype)
    out[:h, :w] = image
    mask = np.zeros((ph, pw), bool)
    mask[:h, :w] = True
    return out, mask, (h, w)


def make_eval_example(
    image: np.ndarray,
    t_bbox: np.ndarray,
    t_class: np.ndarray,
    config,
    bucket_divisor: int = 128,
    inst_masks: np.ndarray = None,
    full_res_masks: bool = False,
):
    """Original-size evaluation example: bucket-pad + pixel mask + box
    rescale, in one dict ready for ``stack_batch``.

    full_res_masks additionally stores the instance masks at full
    (bucket-frame) resolution as ``t_masks_full`` (n, PH, PW) uint8 —
    ragged in n, so only valid with batch_size 1 — for COCO-protocol
    mask scoring (mask IoU at original image resolution).

    Shared by the COCO and VOC loaders' ``augmentation=None`` path —
    the TPU-native replacement for the reference's eager per-shape
    retrace (reference eval.py:41-58). Uses the fused C++
    normalize-into-bucket kernel when applicable (one pass, no
    temporaries).
    """
    h, w = image.shape[:2]
    ph = ((h + bucket_divisor - 1) // bucket_divisor) * bucket_divisor
    pw = ((w + bucket_divisor - 1) // bucket_divisor) * bucket_divisor
    padded = None
    if (
        getattr(config, "normalized_method", "torch_resnet") == "torch_resnet"
        and image.dtype == np.uint8
        and image.ndim == 3
        and image.shape[-1] == 3
    ):
        from . import native

        padded = native.normalize_torch_into_bucket(image, ph, pw)
    if padded is None:
        normalized = normalized_images(image, config)
        padded, _, _ = pad_image_to_bucket(normalized, bucket_divisor)
    pixel_mask = np.zeros((ph, pw), bool)
    pixel_mask[:h, :w] = True
    # Ground truth stays in ORIGINAL-frame normalized coordinates. The
    # network is exactly padding-invariant under a pixel mask (masked
    # attention, mask-aware sine positions, per-conv validity masking —
    # tests/test_segmentation.py::test_bucket_padding_exactness_boxes),
    # so its padded+mask forward equals the unpadded forward and its
    # predicted boxes are normalized to the valid (original) frame —
    # exactly like DETR weights trained with NestedTensor masks.
    # Rescaling GT to the padded frame would shift every IoU.
    boxes, classes, mask = pad_targets(
        t_bbox,
        t_class,
        max_targets=getattr(config, "num_queries", MAX_TARGETS),
    )
    example = {
        "images": padded.astype(np.float32),
        "pixel_mask": pixel_mask,
        "boxes": boxes,
        "classes": classes,
        "mask": mask,
    }
    if inst_masks is not None:
        # Instance masks padded into the same bucket frame, stored at
        # the mask head's stride-4 output resolution so prediction and
        # target live on the identical lattice (no resampling at eval).
        from .masks import pad_instance_masks

        n = len(inst_masks)
        bucketed = np.zeros((n, ph, pw), np.uint8)
        bucketed[:, :h, :w] = inst_masks
        example["t_masks"] = pad_instance_masks(
            bucketed,
            getattr(config, "num_queries", MAX_TARGETS),
        )
        if full_res_masks:
            example["t_masks_full"] = bucketed
    return example


def unpack_labels(t_bbox, t_class):
    """Convert the reference's header layout (batched) to the native
    (boxes, classes, mask) layout — device-side, static shapes.

    Args:
      t_bbox: (B, T, 4) with header row 0.
      t_class: (B, T, 1) or (B, T).

    Returns (boxes (B, T-1, 4), classes (B, T-1), mask (B, T-1)).
    """
    t_bbox = jnp.asarray(t_bbox)
    t_class = jnp.asarray(t_class)
    if t_class.ndim == 3:
        t_class = t_class[..., 0]
    counts = t_bbox[:, 0, 0].astype(jnp.int32)  # (B,)
    boxes = t_bbox[:, 1:, :]
    classes = t_class[:, 1:].astype(jnp.int32)
    slot = jnp.arange(boxes.shape[1], dtype=jnp.int32)[None, :]
    mask = slot < counts[:, None]
    return boxes, classes, mask
