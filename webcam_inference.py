"""Webcam (or video-file) DETR inference.

Workflow parity with the reference ``webcam_inference.py``: capture ->
normalize -> one fused jitted forward (backbone + transformer + heads +
postprocess in a single XLA program, vs. the reference's separate
``run_inference`` graph + host postprocess) -> draw -> display.
COCO pretrained classes, background class 91 (reference :56).

Usage:
  python webcam_inference.py [--source 0|path.mp4] [--image_size 480 720]
"""

import argparse

import numpy as np
import jax

from detr_tensorflow_tpu import inference
from detr_tensorflow_tpu.data import COCO_CLASS_NAME
from detr_tensorflow_tpu.models import get_detr_model
from detr_tensorflow_tpu.train import TrainingConfig


def make_run_inference(model, background_class: int):
    """Single fused jitted program: normalization + forward + postprocess.

    Takes raw uint8 RGB frames — the normalization (selected by the
    model's ``normalized_method``: ImageNet for converted torch weights,
    caffe/BGR for tf-style backbones) runs on the device inside the same
    XLA program as the model (the reference normalizes on the host, with
    the torch scheme hardcoded, and runs a separate postprocess,
    webcam_inference.py:11-15 / inference.py:68)."""
    import jax.numpy as jnp

    from detr_tensorflow_tpu.data.processing import (
        CAFFE_MEAN,
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    method = getattr(model, "normalized_method", "torch_resnet")

    @jax.jit
    def run(variables, frames_u8):
        x = frames_u8.astype(jnp.float32)
        if method == "torch_resnet":  # static: resolved at trace time
            images = (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        elif method == "tf_resnet":
            images = x[..., ::-1] - CAFFE_MEAN
        else:
            raise ValueError(f"unknown normalization method: {method}")
        outputs = model.module.apply(variables, images)
        post = inference.postprocess(outputs, background_class, "xy_center")
        if "pred_masks" in outputs:  # segmentation model: threshold masks
            return post, inference.postprocess_masks(outputs)
        return post, None

    return lambda frames_u8: run(model.variables, frames_u8)


def run_webcam_inference(model, source=0, image_size=(376, 672), display=True,
                         frame_callback=None, max_frames=None):
    import cv2

    config = TrainingConfig(background_class=91)
    run = make_run_inference(model, config.background_class)

    cap = cv2.VideoCapture(source)
    n_frames = 0
    try:
        while max_frames is None or n_frames < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frame = cv2.resize(frame, (image_size[1], image_size[0]))
            (boxes, labels, scores, keep), masks = run(frame[None])
            keep0 = np.asarray(keep[0])
            out = frame
            if masks is not None:  # instance-mask overlay
                out = inference.numpy_masks_to_image(
                    out, np.asarray(masks[0])[keep0],
                    labels=np.asarray(labels[0])[keep0],
                )
            out = inference.numpy_bbox_to_image(
                out,
                np.asarray(boxes[0])[keep0],
                np.asarray(labels[0])[keep0],
                np.asarray(scores[0])[keep0],
                COCO_CLASS_NAME,
            )
            n_frames += 1
            if frame_callback is not None:
                frame_callback(out)
            if display:
                cv2.imshow("detr-tpu", cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
    finally:
        cap.release()
    return n_frames


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", default="0")
    parser.add_argument("--image_size", type=int, nargs=2, default=(376, 672))
    parser.add_argument("--masks", action="store_true",
                        help="run the segmentation head and overlay masks")
    args = parser.parse_args()
    source = int(args.source) if args.source.isdigit() else args.source

    detr = get_detr_model(None, include_top=True, weights="detr",
                          masks=args.masks)
    run_webcam_inference(detr, source, tuple(args.image_size))
