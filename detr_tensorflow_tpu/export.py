"""Hermetic serving artifacts via ``jax.export`` — the SavedModel story.

The reference ships no deployable artifact at all (serving means
re-importing the model code and rebuilding the graph,
/root/reference/webcam_inference.py); TF users lean on SavedModel for
that. This module is the TPU-native equivalent built on
``jax.export``: serialize the Predictor's bucketed serving programs
(normalize → forward → postprocess, one StableHLO program per shape
bucket, batch dimension symbolic) plus the weights into a directory.
A serving host deserializes and calls — **no model definition, no
flax tracing, no weight conversion at startup**, and the same artifact
runs on CPU and TPU (multi-platform lowering).

    predictor = Predictor(model, background_class=91, masks=True)
    export_predictor(predictor, "artifact/", shapes=[(480, 640)])

    # on the serving host:
    predictor = load_predictor("artifact/")     # an ExportedPredictor
    detections = predictor([frame1, frame2])    # same API as Predictor

Layout: ``manifest.json`` (buckets, flags, normalization method),
``program_<H>x<W>.jaxexp`` (serialized exported program per bucket),
``weights.npz`` (flat ``/``-joined param tree). StableHLO serialization
is jax.export's versioned, compatibility-guaranteed format; the
batch dimension is exported symbolically so one program per bucket
serves any request batch.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .predictor import Predictor

_MANIFEST = "manifest.json"
_WEIGHTS = "weights.npz"


def _flatten(tree) -> Dict[str, np.ndarray]:
    from flax.traverse_util import flatten_dict

    return {
        k: np.asarray(v) for k, v in flatten_dict(tree, sep="/").items()
    }


def _unflatten(flat: Dict[str, np.ndarray]):
    from flax.traverse_util import unflatten_dict

    return jax.tree.map(jnp.asarray, unflatten_dict(dict(flat), sep="/"))


def _plain(tree):
    """Normalize variables to plain nested dicts so the traced pytree
    structure matches what ``_unflatten`` rebuilds at load time."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {str(k): _plain(v) for k, v in tree.items()}
    return tree


def export_predictor(
    predictor: Predictor,
    path: str,
    shapes: List[Tuple[int, int]],
    *,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
) -> None:
    """Serialize the Predictor's bucket programs + weights to ``path``.

    ``shapes`` are (height, width) input sizes; each is rounded up to
    the Predictor's bucket like serving does, and one program per
    distinct bucket is exported with a symbolic batch dimension. Only
    the masked variant is exported (it covers exact and padded inputs
    — same choice as ``Predictor.warmup``).
    """
    os.makedirs(path, exist_ok=True)
    module = predictor.model.module
    if "cpu" in platforms and \
            getattr(module, "attn_impl", "xla") != "xla":
        # Pallas Mosaic kernels lower for TPU only; a multi-platform
        # artifact must stage out everywhere. Rebuild the programs on
        # the XLA attention path — identical math (the auto dispatch is
        # a pure perf choice, tests/test_pallas_attention.py).
        from .predictor import Predictor as _P

        model = type(predictor.model)(
            module.clone(attn_impl="xla"), predictor.model.variables,
            getattr(predictor.model, "normalized_method", "torch_resnet"),
        )
        predictor = _P(
            model, predictor.background_class,
            bucket_divisor=predictor.bucket_divisor,
            score_threshold=predictor.score_threshold,
            bbox_format=predictor.bbox_format,
            masks=predictor.masks,
            mask_threshold=predictor.mask_threshold,
        )
    variables = _plain(predictor.model.variables)
    d = predictor.bucket_divisor
    buckets = sorted({
        (((h + d - 1) // d) * d, ((w + d - 1) // d) * d)
        for h, w in shapes
    })

    b = jax_export.symbolic_shape("b")[0]
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables,
    )
    for ph, pw in buckets:
        program = predictor._get_program((ph, pw), masked=True)
        exported = jax_export.export(program, platforms=list(platforms))(
            var_spec,
            jax.ShapeDtypeStruct((b, ph, pw, 3), jnp.uint8),
            jax.ShapeDtypeStruct((b, ph, pw), jnp.bool_),
        )
        with open(os.path.join(path, f"program_{ph}x{pw}.jaxexp"), "wb") as f:
            f.write(exported.serialize())

    np.savez(os.path.join(path, _WEIGHTS), **_flatten(variables))
    manifest = {
        "format": "detr-tensorflow-tpu/jax.export",
        "version": 1,
        "buckets": [list(bk) for bk in buckets],
        "bucket_divisor": d,
        "background_class": predictor.background_class,
        "score_threshold": predictor.score_threshold,
        "bbox_format": predictor.bbox_format,
        "masks": predictor.masks,
        "mask_threshold": predictor.mask_threshold,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)


class _LoadedBundle:
    """The slice of the model bundle the Predictor host path touches."""

    def __init__(self, variables):
        self.variables = variables


class ExportedPredictor(Predictor):
    """A Predictor reconstructed from an artifact directory.

    Same ``__call__`` surface (bucketing, unpadding, thresholding,
    per-image frames, masks) — but ``_get_program`` returns the
    deserialized ``jax.export`` program instead of tracing the model:
    nothing is rebuilt, retraced, or converted at startup. Requests are
    only servable at exported buckets; anything else raises with the
    available list.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            m = json.load(f)
        flat = dict(np.load(os.path.join(path, _WEIGHTS)).items())
        super(Predictor, self).__init__()  # object init; no model bundle
        self.model = _LoadedBundle(_unflatten(flat))
        self.background_class = int(m["background_class"])
        self.bucket_divisor = int(m["bucket_divisor"])
        self.score_threshold = float(m["score_threshold"])
        self.bbox_format = m["bbox_format"]
        self.masks = bool(m["masks"])
        self.mask_threshold = float(m["mask_threshold"])
        self._compiled = {}
        self._aot = {}  # AUTO-layout entries (Predictor.warmup)
        self._buckets = [tuple(bk) for bk in m["buckets"]]
        for ph, pw in self._buckets:
            with open(
                os.path.join(path, f"program_{ph}x{pw}.jaxexp"), "rb"
            ) as f:
                exported = jax_export.deserialize(f.read())
            self._compiled[((ph, pw), True)] = exported.call

    def _get_program(self, shape, masked):
        key = (tuple(shape), True)  # only masked programs are exported
        if key not in self._compiled:
            raise ValueError(
                f"no exported program for bucket {shape}; artifact has "
                f"{self._buckets} — re-export with this shape or resize"
            )
        return self._compiled[key]

    # Predictor.warmup is inherited unchanged: it already goes through
    # the _get_program hook with the masked dummy-call convention.


def load_predictor(path: str) -> ExportedPredictor:
    """Load a serving artifact written by ``export_predictor``."""
    return ExportedPredictor(path)
