"""Serving artifacts (export.py): the Predictor's bucket programs +
weights serialized via jax.export and reloaded with no model rebuild —
detections from the loaded artifact must be identical to the live
Predictor's, across mixed sizes, symbolic batch, and masks.
"""

import numpy as np
import pytest

from detr_tensorflow_tpu.export import export_predictor, load_predictor
from detr_tensorflow_tpu.models import build_detr
from detr_tensorflow_tpu.predictor import Predictor


def _model(masks=False):
    return build_detr(
        num_classes=5, num_queries=6, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(64, 64),
        masks=masks,
    )


def _assert_same_detections(a, b, masks=False):
    assert len(a) == len(b)
    for da, db in zip(a, b):
        np.testing.assert_allclose(da.boxes, db.boxes, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_array_equal(da.labels, db.labels)
        np.testing.assert_allclose(da.scores, db.scores, rtol=1e-5,
                                   atol=1e-6)
        if masks:
            np.testing.assert_array_equal(da.masks, db.masks)


def test_roundtrip_matches_live_predictor(rng, tmp_path):
    live = Predictor(_model(), background_class=0, bucket_divisor=64,
                     score_threshold=0.1)
    path = str(tmp_path / "artifact")
    export_predictor(live, path, shapes=[(60, 90), (64, 64)],
                     platforms=("cpu",))

    loaded = load_predictor(path)
    images = [
        rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8),
        rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8),
        rng.integers(0, 255, size=(50, 80, 3)).astype(np.uint8),
        # symbolic batch: three images share the (64, 128) bucket
        rng.integers(0, 255, size=(33, 70, 3)).astype(np.uint8),
    ]
    _assert_same_detections(loaded(images), live(images))


def test_loaded_artifact_needs_no_model(rng, tmp_path):
    """The artifact carries everything: a fresh ExportedPredictor built
    only from the directory serves without touching build_detr or any
    weight conversion (deserialize + call)."""
    live = Predictor(_model(), background_class=0, bucket_divisor=64)
    path = str(tmp_path / "artifact")
    export_predictor(live, path, shapes=[(64, 64)], platforms=("cpu",))

    loaded = load_predictor(path)
    assert not hasattr(loaded.model, "module")  # weights only, no flax
    img = [rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)]
    out = loaded(img)
    assert out[0] is not None and len(out[0].boxes) == len(out[0].scores)

    loaded.warmup([(64, 64)])  # precompile path works on artifacts too


def test_unknown_bucket_raises(rng, tmp_path):
    live = Predictor(_model(), background_class=0, bucket_divisor=64)
    path = str(tmp_path / "artifact")
    export_predictor(live, path, shapes=[(64, 64)], platforms=("cpu",))
    loaded = load_predictor(path)
    big = [rng.integers(0, 255, size=(100, 200, 3)).astype(np.uint8)]
    with pytest.raises(ValueError, match="no exported program"):
        loaded(big)


def test_masked_serving_roundtrip(rng, tmp_path):
    live = Predictor(_model(masks=True), background_class=0,
                     bucket_divisor=64, masks=True, score_threshold=0.1)
    path = str(tmp_path / "artifact")
    export_predictor(live, path, shapes=[(60, 90)], platforms=("cpu",))
    loaded = load_predictor(path)
    images = [rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8)]
    _assert_same_detections(loaded(images), live(images), masks=True)
