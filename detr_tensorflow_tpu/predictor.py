"""Production serving path: raw images in, detections out.

Wraps the whole pipeline in per-bucket jitted XLA programs:
device-side normalization -> backbone -> transformer -> heads ->
postprocess. Arbitrary image sizes are zero-padded up to shape buckets
with a pixel mask, so the number of compiled programs stays bounded
while results are mathematically exact for the valid region (validated
against torch in tests/test_golden_torch.py::test_forward_parity_with_pixel_mask).

This is the TPU-native generalization of the reference's webcam loop
(webcam_inference.py:11-42) and eager eval loop (eval.py:41-58), which
re-trace per image shape and postprocess on the host.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import inference
from .data.processing import IMAGENET_MEAN, IMAGENET_STD, CAFFE_MEAN


class Detection:
    """One image's detections (ragged, host-side)."""

    __slots__ = ("boxes", "labels", "scores", "masks")

    def __init__(self, boxes, labels, scores, masks=None):
        self.boxes = boxes  # (n, 4) xcycwh normalized to the valid region
        self.labels = labels  # (n,)
        self.scores = scores  # (n,)
        # (n, H, W) bool instance masks at the image's own resolution
        # (COCO-protocol bilinear upsample from the stride-4 head), or
        # None when the predictor serves boxes only.
        self.masks = masks


class Predictor:
    """Batched, bucketed DETR inference.

    Args:
      model: a DetrModel bundle (models/api.py).
      background_class: class id to suppress.
      bucket_divisor: pad H/W up to multiples of this (compile-count vs
        padding-waste tradeoff).
      score_threshold: optional confidence filter.
      masks: serve per-detection instance masks (requires a model built
        with the segmentation head, ``masks=True``). Masks come back at
        each image's own resolution — valid stride-4 cells bilinearly
        upsampled (torch F.interpolate semantics), thresholded at
        ``mask_threshold`` — the same COCO-protocol frame eval.py
        scores.
    """

    def __init__(
        self,
        model,
        background_class: int,
        bucket_divisor: int = 128,
        score_threshold: float = 0.0,
        bbox_format: str = "xy_center",
        masks: bool = False,
        mask_threshold: float = 0.5,
    ):
        self.model = model
        self.background_class = int(background_class)
        self.bucket_divisor = int(bucket_divisor)
        self.score_threshold = float(score_threshold)
        self.bbox_format = bbox_format
        self.masks = bool(masks)
        self.mask_threshold = float(mask_threshold)
        self._compiled = {}
        self._aot = {}  # (shape, batch) -> (compiled, put) | None

    def _get_program(self, shape: Tuple[int, int], masked: bool):
        key = (shape, masked)
        if key in self._compiled:
            return self._compiled[key]
        module = self.model.module
        background = self.background_class
        fmt = self.bbox_format
        method = getattr(self.model, "normalized_method", "torch_resnet")

        def normalize(frames):
            x = frames.astype(jnp.float32)
            if method == "torch_resnet":
                return (x / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
                    IMAGENET_STD
                )
            return x[..., ::-1] - jnp.asarray(CAFFE_MEAN)

        want_masks = self.masks

        def mask_probs(outputs, pixel_mask):
            if not want_masks:
                return None
            probs = jax.nn.sigmoid(outputs["pred_masks"].astype(jnp.float32))
            if pixel_mask is not None:
                from .models.layers import feature_valid_mask

                _, _, h4, w4 = probs.shape
                probs = probs * feature_valid_mask(pixel_mask, h4, w4)[:, None]
            return probs

        if masked:
            @jax.jit
            def program(variables, frames, pixel_mask):
                # Zero padded pixels AFTER normalization: normalize(0) is
                # nonzero (mean subtraction), and the model's exact
                # padding-invariance assumes the padded image region is
                # zeros, like an unpadded SAME conv's implicit padding.
                x = normalize(frames) * pixel_mask[..., None].astype(jnp.float32)
                outputs = module.apply(variables, x, pixel_mask=pixel_mask)
                return (inference.postprocess(outputs, background, fmt),
                        mask_probs(outputs, pixel_mask))
        else:
            @jax.jit
            def program(variables, frames):
                outputs = module.apply(variables, normalize(frames))
                return (inference.postprocess(outputs, background, fmt),
                        mask_probs(outputs, None))
        self._compiled[key] = program
        return program

    def warmup(self, shapes: List[Tuple[int, int]], batch: int = 1) -> None:
        """Precompile the programs for a set of (height, width) buckets so
        first-request latency is flat in serving (compiles the masked
        variant: it covers both exact and padded inputs at the cost of a
        negligible all-valid mask).

        Warmed buckets are additionally AOT-compiled with AUTO
        (compiler-chosen) INPUT LAYOUTS for the frame/mask feed —
        deleting the in-step input relayout copy (measured 2.3 ms at
        b32 800x1344, docs/performance.md r5). Placement is verified on
        example inputs (some stacks silently ignore layouts in
        device_put — the Trainer has the same guard); on any mismatch
        or backend without layout support the bucket serves through the
        plain jitted program.
        """
        d = self.bucket_divisor
        for h, w in shapes:
            ph = ((h + d - 1) // d) * d
            pw = ((w + d - 1) // d) * d
            program = self._get_program((ph, pw), masked=True)
            frames = jnp.zeros((batch, ph, pw, 3), jnp.uint8)
            mask = jnp.ones((batch, ph, pw), bool)
            jax.block_until_ready(program(self.model.variables, frames, mask))
            self._aot_layout_entry((ph, pw), batch, frames, mask)

    def _aot_layout_entry(self, shape, batch, frames, mask):
        """AOT executable with AUTO input layouts for one warmed
        (bucket, batch): stored as (compiled, put_inputs) or None."""
        key = (shape, batch)
        if key in self._aot:
            return self._aot[key]
        try:
            from jax.experimental.layout import Format, Layout

            from .utils.layouts import verified_put

            raw = self._get_program(shape, masked=True)
            jfn = jax.jit(
                raw.__wrapped__,
                in_shardings=(None, Format(Layout.AUTO),
                              Format(Layout.AUTO)),
            )
            compiled = jfn.lower(
                self.model.variables, frames, mask
            ).compile()
            fmts = compiled.input_formats[0]
            put_pair = verified_put(
                {"f": fmts[1], "m": fmts[2]}, {"f": frames, "m": mask}
            )
            if put_pair is None:
                raise RuntimeError("backend ignored input layouts")

            def put(fr, mk):
                placed = put_pair({"f": fr, "m": mk})
                return placed["f"], placed["m"]

            entry = (compiled, put)
        except Exception:  # pragma: no cover - backend-specific
            entry = None
        self._aot[key] = entry
        return entry

    def __call__(self, images: List[np.ndarray]) -> List[Detection]:
        """Run detection on a list of uint8 RGB images (any sizes).

        Images of the same bucket shape are batched into one device call.
        Returned boxes are normalized to each image's own frame.
        """
        d = self.bucket_divisor
        buckets = {}
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            ph = ((h + d - 1) // d) * d
            pw = ((w + d - 1) // d) * d
            buckets.setdefault((ph, pw), []).append(i)

        results: List[Optional[Detection]] = [None] * len(images)
        for (ph, pw), idxs in buckets.items():
            frames = np.zeros((len(idxs), ph, pw, 3), np.uint8)
            masks = np.zeros((len(idxs), ph, pw), bool)
            exact = True
            for row, i in enumerate(idxs):
                h, w = images[i].shape[:2]
                frames[row, :h, :w] = images[i]
                masks[row, :h, :w] = True
                exact = exact and (h == ph and w == pw)
            # Reuse a warmed masked program for exact-size batches rather
            # than compiling a second (unmasked) variant.
            if exact and ((ph, pw), True) in self._compiled and (
                ((ph, pw), False) not in self._compiled
            ):
                exact = False
            program = self._get_program((ph, pw), masked=not exact)
            aot = (
                self._aot.get(((ph, pw), len(idxs))) if not exact else None
            )
            if aot is not None:
                # Warmed AUTO-layout executable: the host feed transfers
                # straight into the executable's preferred layouts (no
                # in-step relayout copy).
                compiled, put = aot
                fr, mk = put(jnp.asarray(frames), jnp.asarray(masks))
                (boxes, labels, scores, keep), mprobs = compiled(
                    self.model.variables, fr, mk
                )
            elif exact:
                (boxes, labels, scores, keep), mprobs = program(
                    self.model.variables, jnp.asarray(frames)
                )
            else:
                (boxes, labels, scores, keep), mprobs = program(
                    self.model.variables, jnp.asarray(frames), jnp.asarray(masks)
                )
            boxes = np.asarray(boxes)
            labels = np.asarray(labels)
            scores = np.asarray(scores)
            keep = np.asarray(keep) & (np.asarray(scores) >= self.score_threshold)
            if mprobs is not None:
                mprobs = np.asarray(mprobs)
            for row, i in enumerate(idxs):
                k = keep[row]
                # No padded->valid rescale: the network is exactly
                # padding-invariant under a pixel mask (mask-aware
                # positions + masked attention + per-conv validity
                # masking, models/resnet.py), so predicted boxes are
                # already normalized to the image's own valid frame —
                # the convention the weights are trained with. Verified
                # by tests/test_predictor.py::test_padded_equals_exact.
                det_masks = None
                if mprobs is not None:
                    h, w = images[i].shape[:2]
                    up = inference.upsample_mask_probs(
                        mprobs[row][k], (h, w)
                    )  # (H, W, n)
                    det_masks = (
                        up.transpose(2, 0, 1) > self.mask_threshold
                    )
                results[i] = Detection(
                    boxes[row][k], labels[row][k], scores[row][k],
                    masks=det_masks,
                )
        return results  # type: ignore[return-value]
