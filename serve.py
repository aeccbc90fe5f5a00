"""HTTP serving daemon: raw images in, JSON detections out.

A deployment surface the reference does not have (its only live path is
the webcam demo): a stdlib-only HTTP server around the bucketed
`Predictor` — one TPU-resident model, AOT-warmed shape buckets, batched
device calls for concurrent requests, per-detection instance masks
(RLE-encoded) when the model carries the segmentation head.

  POST /detect      body: JPEG/PNG bytes (or raw .npy array)
                    -> {"detections": [{"box": [xc, yc, w, h],
                        "label": i, "class": "...", "score": s,
                        "mask_rle": {...}?}, ...]}
  GET  /healthz     -> {"ok": true, "buckets": [...]}

Usage:
  python serve.py --port 8000 --score_threshold 0.5 [--masks] \
      [--warmup 480x640,736x1280]

Run with real weights via the same flags as eval.py (weights load from
local files — no egress here, reference downloads from GCS).
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def mask_to_rle(mask: np.ndarray) -> dict:
    """COCO-style uncompressed RLE (column-major counts) for a bool mask."""
    flat = np.asarray(mask, bool).T.reshape(-1)
    # run-length encode, starting with a (possibly empty) zero-run
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(idx).tolist()
    if flat.size and flat[0]:  # RLE convention: first run is background
        counts = [0] + counts
    return {"size": [int(mask.shape[0]), int(mask.shape[1])],
            "counts": counts}


def _decode_image(body: bytes) -> np.ndarray:
    """JPEG/PNG via cv2, or a raw .npy (H, W, 3) uint8 array."""
    if body[:6] == b"\x93NUMPY":
        import io

        arr = np.load(io.BytesIO(body), allow_pickle=False)
        return np.ascontiguousarray(arr[..., :3].astype(np.uint8))
    import cv2

    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("could not decode image body")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class DetrService:
    """Thread-safe wrapper: serializes device calls, batches same-bucket
    concurrent requests (the Predictor groups them into one XLA call)."""

    def __init__(self, predictor, class_names):
        self.predictor = predictor
        self.class_names = list(class_names)
        self._lock = threading.Lock()

    def detect(self, images):
        with self._lock:  # one device queue; Predictor batches internally
            return self.predictor(images)

    def to_json(self, det) -> dict:
        out = []
        for i in range(len(det.boxes)):
            label = int(det.labels[i])
            d = {
                "box": [float(x) for x in det.boxes[i]],
                "label": label,
                "class": (self.class_names[label]
                          if 0 <= label < len(self.class_names) else str(label)),
                "score": float(det.scores[i]),
            }
            if det.masks is not None:
                d["mask_rle"] = mask_to_rle(det.masks[i])
            out.append(d)
        return {"detections": out}


def make_handler(service: DetrService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                buckets = sorted(
                    {k[0] for k in service.predictor._compiled}
                )
                self._send(200, {"ok": True, "buckets": buckets})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/detect":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                image = _decode_image(self.rfile.read(n))
                det = service.detect([image])[0]
                self._send(200, service.to_json(det))
            except Exception as e:  # noqa: BLE001 — surface to client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(service: DetrService, port: int = 8000):
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    print(f"serving on :{port} (POST /detect, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    from detr_tensorflow_tpu.data import COCO_CLASS_NAME
    from detr_tensorflow_tpu.models import get_detr_model
    from detr_tensorflow_tpu.predictor import Predictor

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--score_threshold", type=float, default=None,
                        help="default 0.5; with --artifact, unset keeps "
                             "the artifact's exported threshold")
    parser.add_argument("--bucket_divisor", type=int, default=128)
    parser.add_argument("--masks", action="store_true")
    parser.add_argument(
        "--warmup", default="",
        help="comma-separated HxW sizes to precompile, e.g. 480x640,800x1344",
    )
    parser.add_argument(
        "--artifact", default="",
        help="serve from a jax.export artifact directory "
             "(export_predictor) instead of building the model — no "
             "model code, no weight conversion at startup",
    )
    args = parser.parse_args()

    if args.artifact:
        from detr_tensorflow_tpu.export import load_predictor

        predictor = load_predictor(args.artifact)
        if args.score_threshold is not None:
            predictor.score_threshold = args.score_threshold
    else:
        model = get_detr_model(None, include_top=True, weights="detr",
                               masks=args.masks)
        predictor = Predictor(
            model, background_class=91, bucket_divisor=args.bucket_divisor,
            score_threshold=(0.5 if args.score_threshold is None
                             else args.score_threshold),
            masks=args.masks,
        )
    if args.warmup:
        shapes = [tuple(map(int, s.split("x"))) for s in args.warmup.split(",")]
        predictor.warmup(shapes)
    serve(DetrService(predictor, COCO_CLASS_NAME), args.port)
