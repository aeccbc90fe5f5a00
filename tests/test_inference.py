"""Postprocess: batched static-shape outputs + reference-parity wrapper."""

import numpy as np
import jax
import jax.numpy as jnp

from detr_tensorflow_tpu import inference
from detr_tensorflow_tpu.ops import boxes as bbox_ops


def _outputs(rng, b=2, q=8, c=5):
    logits = rng.normal(size=(b, q, c)).astype(np.float32) * 3
    boxes = rng.uniform(0.2, 0.8, size=(b, q, 4)).astype(np.float32)
    return {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}


def test_postprocess_static_shapes(rng):
    out = _outputs(rng)
    boxes, labels, scores, keep = jax.jit(
        inference.postprocess, static_argnums=(1, 2)
    )(out, 0, "xy_center")
    assert boxes.shape == (2, 8, 4)
    assert labels.shape == scores.shape == keep.shape == (2, 8)
    probs = jax.nn.softmax(out["pred_logits"], -1)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(probs.max(-1)), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(labels) != 0)


def test_postprocess_formats(rng):
    out = _outputs(rng)
    xyxy, _, _, _ = inference.postprocess(out, 0, "xyxy")
    ref = bbox_ops.xcycwh_to_xyxy(out["pred_boxes"], clip=True)
    np.testing.assert_allclose(np.asarray(xyxy), np.asarray(ref), atol=1e-6)
    yxyx, _, _, _ = inference.postprocess(out, 0, "yxyx")
    np.testing.assert_allclose(
        np.asarray(yxyx), np.asarray(bbox_ops.xyxy_to_yxyx(ref)), atol=1e-6
    )


def test_get_model_inference_filters_background(rng):
    out = _outputs(rng, b=1)
    boxes, labels, scores, keep = inference.postprocess(out, 0)
    p_bbox, p_labels, p_scores = inference.get_model_inference(out, 0)
    n = int(np.asarray(keep[0]).sum())
    assert p_bbox.shape == (n, 4)
    assert (p_labels != 0).all()
    assert len(p_scores) == n


def test_numpy_bbox_to_image_draws(rng):
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[0.5, 0.5, 0.4, 0.4]])
    out = inference.numpy_bbox_to_image(
        img.copy(), boxes, labels=[1], scores=[0.9], class_name=["bg", "cat"]
    )
    assert out.shape == (64, 64, 3)
    assert out.sum() > 0  # something was drawn
