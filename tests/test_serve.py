"""HTTP serving daemon (serve.py): live server round-trip with a tiny
model — PNG in, JSON detections (+ RLE masks) out."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from detr_tensorflow_tpu.models import build_detr
from detr_tensorflow_tpu.predictor import Predictor


def _rle_roundtrip(mask):
    import serve
    from detr_tensorflow_tpu.data.masks import rle_to_mask

    rle = serve.mask_to_rle(mask)
    np.testing.assert_array_equal(rle_to_mask(rle).astype(bool), mask)


def test_mask_rle_roundtrip(rng):
    _rle_roundtrip(rng.random((13, 17)) > 0.5)
    _rle_roundtrip(np.zeros((5, 7), bool))
    _rle_roundtrip(np.ones((5, 7), bool))
    m = np.zeros((6, 6), bool)
    m[0, 0] = True  # foreground-first: needs the leading zero-run
    _rle_roundtrip(m)


@pytest.fixture(scope="module")
def server():
    import serve

    model = build_detr(
        num_classes=5, num_queries=6, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(64, 64),
        masks=True, model_dim=16, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, dim_feedforward=32,
    )
    predictor = Predictor(model, background_class=0, bucket_divisor=64,
                          masks=True)
    service = serve.DetrService(
        predictor, ["back", "a", "b", "c", "d"]
    )
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(service)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_daemon_over_export_artifact(rng, tmp_path):
    """serve.py --artifact path: the HTTP daemon runs over a loaded
    jax.export artifact — no model build — and answers /detect."""
    import io

    import serve
    from detr_tensorflow_tpu.export import export_predictor, load_predictor

    model = build_detr(
        num_classes=5, num_queries=6, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(64, 64),
        model_dim=16, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, dim_feedforward=32,
    )
    live = Predictor(model, background_class=0, bucket_divisor=64)
    path = str(tmp_path / "artifact")
    export_predictor(live, path, shapes=[(60, 90)], platforms=("cpu",))

    service = serve.DetrService(
        load_predictor(path), ["back", "a", "b", "c", "d"]
    )
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(service)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        img = rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)  # raw .npy upload: no cv2 dependency
        req = urllib.request.Request(
            f"{url}/detect", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.loads(r.read())
        assert "detections" in payload
    finally:
        httpd.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=300) as r:
        payload = json.loads(r.read())
    assert payload["ok"] is True


def test_detect_roundtrip(server, rng, tmp_path):
    cv2 = pytest.importorskip("cv2")

    img = rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    req = urllib.request.Request(
        f"{server}/detect", data=buf.tobytes(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        payload = json.loads(r.read())
    assert "detections" in payload
    for det in payload["detections"]:
        assert len(det["box"]) == 4
        assert isinstance(det["class"], str)
        assert 0.0 <= det["score"] <= 1.0
        assert det["mask_rle"]["size"] == [60, 90]

    # raw .npy upload path
    import io

    bio = io.BytesIO()
    np.save(bio, img)
    req = urllib.request.Request(
        f"{server}/detect", data=bio.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        payload2 = json.loads(r.read())
    assert len(payload2["detections"]) == len(payload["detections"])

    # malformed body -> 400, not a crash
    req = urllib.request.Request(
        f"{server}/detect", data=b"not an image", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=300)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
