"""Box geometry vs hand-computed values and numpy twins."""

import numpy as np
import jax.numpy as jnp

from detr_tensorflow_tpu.ops import boxes


def test_xcycwh_xyxy_roundtrip(rng):
    b = rng.uniform(0.3, 0.6, size=(17, 4)).astype(np.float32)
    xyxy = boxes.xcycwh_to_xyxy(jnp.asarray(b), clip=False)
    back = boxes.xyxy_to_xcycwh(xyxy)
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-6)


def test_xcycwh_to_xyxy_clips():
    b = jnp.array([[0.1, 0.1, 0.5, 0.5]])  # xmin would be -0.15
    out = np.asarray(boxes.xcycwh_to_xyxy(b, clip=True))
    assert out[0, 0] == 0.0 and out[0, 1] == 0.0
    np.testing.assert_allclose(out[0, 2:], [0.35, 0.35], atol=1e-6)


def test_yxyx_involution(rng):
    b = rng.uniform(size=(5, 4)).astype(np.float32)
    out = boxes.xyxy_to_yxyx(boxes.xyxy_to_yxyx(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-6)


def test_iou_hand_computed():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.5, 0.5, 1.5, 1.5], [2.0, 2.0, 3.0, 3.0], [0.0, 0.0, 1.0, 1.0]])
    iou = np.asarray(boxes.jaccard(a, b))
    np.testing.assert_allclose(iou[0], [0.25 / 1.75, 0.0, 1.0], atol=1e-6)


def test_intersect_matches_manual(rng):
    a = np.sort(rng.uniform(size=(6, 2, 2)), axis=1).reshape(6, 4).astype(np.float32)
    b = np.sort(rng.uniform(size=(9, 2, 2)), axis=1).reshape(9, 4).astype(np.float32)
    a = a[:, [0, 2, 1, 3]]  # interleave to xyxy with xmin<xmax, ymin<ymax
    b = b[:, [0, 2, 1, 3]]
    inter = np.asarray(boxes.intersect(jnp.asarray(a), jnp.asarray(b)))
    for i in range(6):
        for j in range(9):
            w = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0])
            h = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1])
            expected = max(w, 0) * max(h, 0)
            np.testing.assert_allclose(inter[i, j], expected, atol=1e-6)


def test_giou_identical_boxes_is_one():
    a = jnp.array([[0.2, 0.2, 0.8, 0.8]])
    g = np.asarray(boxes.giou(a, a))
    np.testing.assert_allclose(g, [[1.0]], atol=1e-6)


def test_giou_disjoint_is_negative():
    a = jnp.array([[0.0, 0.0, 0.1, 0.1]])
    b = jnp.array([[0.9, 0.9, 1.0, 1.0]])
    g = float(np.asarray(boxes.giou(a, b))[0, 0])
    assert g < 0.0
    # enclosing box is the unit square; giou = 0 - (1 - 0.02)/1
    np.testing.assert_allclose(g, -(1.0 - 0.02) / 1.0, atol=1e-6)


def test_elementwise_giou_matches_pairwise_diag(rng):
    a = np.sort(rng.uniform(size=(12, 2, 2)), axis=1).reshape(12, 4)
    b = np.sort(rng.uniform(size=(12, 2, 2)), axis=1).reshape(12, 4)
    a = a[:, [0, 2, 1, 3]].astype(np.float32)
    b = b[:, [0, 2, 1, 3]].astype(np.float32)
    pairwise = np.asarray(boxes.giou(jnp.asarray(a), jnp.asarray(b)))
    elem = np.asarray(boxes.elementwise_giou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(np.diag(pairwise), elem, atol=1e-5)


def test_np_helpers_match_jnp(rng):
    b = rng.uniform(0.3, 0.6, size=(7, 4)).astype(np.float32)
    np.testing.assert_allclose(
        boxes.np_xcycwh_to_xyxy(b),
        np.asarray(boxes.xcycwh_to_xyxy(jnp.asarray(b), clip=False)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        boxes.np_xyxy_to_xcycwh(b), np.asarray(boxes.xyxy_to_xcycwh(jnp.asarray(b))), atol=1e-6
    )


def test_rescale(rng):
    b = rng.uniform(size=(3, 4))
    out = boxes.np_rescale_bbox_xcycwh(b, (480, 640))
    np.testing.assert_allclose(out, b * np.array([640, 480, 640, 480]))
    out = boxes.np_rescale_bbox_yx_min_yx_max(b, (480, 640))
    np.testing.assert_allclose(out, b * np.array([480, 640, 480, 640]))


def test_bbox_xcycwh_to_x1y1x2y2_int_corners():
    out = boxes.bbox_xcycwh_to_x1y1x2y2(np.array([[50.0, 40.0, 20.0, 10.0]]))
    np.testing.assert_array_equal(out, [[40, 35, 60, 45]])
    assert out.dtype == np.int32
