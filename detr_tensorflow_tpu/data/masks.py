"""COCO segmentation rasterization — dependency-free (no pycocotools).

The reference never decodes segmentation annotations (its mask AP row is
a zero placeholder, reference eval.py:54); this module adds real mask
support. COCO stores instance segmentations in three forms:

  * polygons: list of flat [x0, y0, x1, y1, ...] rings;
  * uncompressed RLE: {"counts": [int, ...], "size": [h, w]} —
    column-major run lengths starting with a background run;
  * compressed RLE: {"counts": str|bytes, "size": [h, w]} — the same
    runs in pycocotools' LEB128-style base-48 varint encoding (5 data
    bits per char, bit 0x20 continues, delta-coded from the
    second-previous run).

Rasterization uses cv2.fillPoly for polygons and a pure-numpy RLE
expansion; both produce (H, W) uint8 {0,1} masks.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def decode_rle_counts(counts) -> np.ndarray:
    """Decode a compressed-RLE counts string to run lengths (int64)."""
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    out: List[int] = []
    p = 0
    n = len(counts)
    while p < n:
        x = 0
        k = 0
        while True:
            c = counts[p] - 48
            x |= (c & 0x1F) << (5 * k)
            p += 1
            k += 1
            if not (c & 0x20):
                if c & 0x10:  # sign-extend the final chunk
                    x |= -1 << (5 * k)
                break
        if len(out) > 2:
            x += out[-2]  # delta from the second-previous run
        out.append(x)
    return np.asarray(out, np.int64)


def rle_to_mask(rle: dict) -> np.ndarray:
    """Expand an RLE dict (compressed or uncompressed) to (H, W) uint8."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        runs = decode_rle_counts(counts)
    else:
        runs = np.asarray(counts, np.int64)
    values = np.zeros(len(runs), np.uint8)
    values[1::2] = 1  # runs alternate background/foreground
    flat = np.repeat(values, runs)
    if flat.size < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, np.uint8)])
    # COCO RLE is column-major.
    return flat[: h * w].reshape(w, h).T


def polygons_to_mask(polygons: Sequence, h: int, w: int) -> np.ndarray:
    """Rasterize a list of polygon rings to one (H, W) uint8 mask."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [
        np.round(np.asarray(p, np.float64)).astype(np.int32).reshape(-1, 2)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def ann_to_mask(ann: dict, h: int, w: int) -> np.ndarray:
    """Rasterize one COCO annotation's segmentation to (H, W) uint8."""
    seg = ann.get("segmentation")
    if seg is None:
        return np.zeros((h, w), np.uint8)
    if isinstance(seg, dict):
        return rle_to_mask(seg)
    return polygons_to_mask(seg, h, w)


def pad_instance_masks(
    masks: np.ndarray, max_targets: int, stride: int = 4
) -> np.ndarray:
    """Pad per-instance masks to the fixed slot count, downsampled.

    Args:
      masks: (n, H, W) uint8 instance masks.
      max_targets: slot count T (same budget as ``pad_targets``).
      stride: integer downsample factor — targets are stored at the mask
        head's output resolution (stride 4 by default,
        models/segmentation.py) so no resize happens in the loss and the
        host batch stays small (uint8, 1/16 the pixels).

    Returns (T, ceil(H/stride), ceil(W/stride)) uint8.
    """
    masks = np.asarray(masks)
    if masks.ndim != 3:
        raise ValueError(
            f"pad_instance_masks needs (n, H, W) masks, got {masks.shape}"
        )
    n, h, w = masks.shape  # n == 0 is fine: shape still carries H, W
    hs = -(-h // stride)
    ws = -(-w // stride)
    out = np.zeros((max_targets, hs, ws), np.uint8)
    k = min(n, max_targets)
    if k:
        # Nearest-neighbor downsample via strided slicing (exact for
        # integer strides; matches jax.image.resize 'nearest' up to the
        # half-pixel sampling offset, which is immaterial for targets).
        ds = masks[:k, ::stride, ::stride]
        out[:k, : ds.shape[1], : ds.shape[2]] = ds
    return out
