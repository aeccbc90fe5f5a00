"""Pretrained-weight conversion and loading.

The reference downloads a converted-from-PyTorch Keras checkpoint and
restores it by layer name (detr_tf/networks/weights.py:5-37), keeping
PyTorch tensor layouts alive inside the TF graph via custom layers
(custom_layers.py:31-54, transformer.py:294-305). Our native format is a
plain flax variables pytree (``{'params': ..., 'frozen': ...}``); this
module converts *into* it from either of the two public DETR weight
naming schemes:

  * ``facebook`` — the original facebookresearch/detr checkpoints
    (``detr-r50-e632da11.pth``): packed ``in_proj_weight`` attention
    parameters, ``backbone.0.body.*`` ResNet naming;
  * ``hf`` — HuggingFace ``DetrForObjectDetection`` state_dicts:
    split q/k/v projections, ``model.backbone.conv_encoder.*`` naming.

Layout rules: torch Linear ``(out, in)`` -> flax ``(in, out)`` transpose;
torch Conv ``OIHW`` -> flax ``HWIO`` transpose; BN statistics land in the
``frozen`` collection.

Loading is file-based (``.pth`` / ``.npz``) by default; point
``DETR_TPU_WEIGHTS`` or the ``weights_path`` argument at a local
checkpoint. ``download_weights`` / ``load_weights(download=True)`` add
the reference's one-command acquisition (detr_tf/networks/weights.py:
5-11 downloads from GCS): a checksum-gated fetch from the public
facebook URLs that activates the moment the environment has egress and
fails fast (with the manual-placement instructions) when it doesn't.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Tuple

import numpy as np

Tree = Dict[str, object]


def _t(x) -> np.ndarray:
    """torch tensor / array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _linear(sd: Mapping, prefix: str) -> Tree:
    return {
        "kernel": _t(sd[f"{prefix}.weight"]).T,
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _layernorm(sd: Mapping, prefix: str) -> Tree:
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _conv(sd: Mapping, key: str) -> Tree:
    return {"kernel": _t(sd[key]).transpose(2, 3, 1, 0)}  # OIHW -> HWIO


def _bn(sd: Mapping, prefix: str) -> Tree:
    return {
        "weight": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "running_mean": _t(sd[f"{prefix}.running_mean"]),
        "running_var": _t(sd[f"{prefix}.running_var"]),
    }


def _packed_attention(sd: Mapping, prefix: str, d: int) -> Tree:
    """facebook scheme: split packed (3d, d) in_proj into q/k/v."""
    w = _t(sd[f"{prefix}.in_proj_weight"])
    b = _t(sd[f"{prefix}.in_proj_bias"])
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": w[i * d : (i + 1) * d].T,
            "bias": b[i * d : (i + 1) * d],
        }
    out["out_proj"] = _linear(sd, f"{prefix}.out_proj")
    return out


def _split_attention(sd: Mapping, prefix: str) -> Tree:
    """hf scheme: q/k/v already split."""
    return {
        name: _linear(sd, f"{prefix}.{name}")
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }


# ---------------------------------------------------------------------------
# ResNet backbone
# ---------------------------------------------------------------------------

_STAGE_SIZES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _convert_backbone(
    sd: Mapping, scheme: str, depth: int
) -> Tuple[Tree, Tree]:
    """Returns (params, frozen) subtrees for the ``backbone`` module."""
    if scheme in ("facebook", "torchvision"):
        # torchvision resnet50/101 state_dicts use the identical layer
        # naming as facebook DETR's backbone, minus the "backbone.0.body"
        # root (DETR wraps a torchvision resnet) — the offline stand-in
        # for the reference's Keras ImageNet backbone (detr.py:148).
        root = "backbone.0.body." if scheme == "facebook" else ""

        def conv_key(s, b, j):
            return f"{root}layer{s + 1}.{b}.conv{j + 1}.weight"

        def bn_prefix(s, b, j):
            return f"{root}layer{s + 1}.{b}.bn{j + 1}"

        def short_conv_key(s, b):
            return f"{root}layer{s + 1}.{b}.downsample.0.weight"

        def short_bn_prefix(s, b):
            return f"{root}layer{s + 1}.{b}.downsample.1"

        stem_conv = f"{root}conv1.weight"
        stem_bn = f"{root}bn1"
    elif scheme == "hf":
        root = "model.backbone.conv_encoder.model"

        def conv_key(s, b, j):
            return f"{root}.encoder.stages.{s}.layers.{b}.layer.{j}.convolution.weight"

        def bn_prefix(s, b, j):
            return f"{root}.encoder.stages.{s}.layers.{b}.layer.{j}.normalization"

        def short_conv_key(s, b):
            return f"{root}.encoder.stages.{s}.layers.{b}.shortcut.convolution.weight"

        def short_bn_prefix(s, b):
            return f"{root}.encoder.stages.{s}.layers.{b}.shortcut.normalization"

        stem_conv = f"{root}.embedder.embedder.convolution.weight"
        stem_bn = f"{root}.embedder.embedder.normalization"
    else:
        raise ValueError(scheme)

    params: Tree = {"conv1": _conv(sd, stem_conv)}
    frozen: Tree = {"bn1": _bn(sd, stem_bn)}
    for s, n_blocks in enumerate(_STAGE_SIZES[depth]):
        layer_p: Tree = {}
        layer_f: Tree = {}
        for b in range(n_blocks):
            block_p: Tree = {}
            block_f: Tree = {}
            for j in range(3):
                block_p[f"conv{j + 1}"] = _conv(sd, conv_key(s, b, j))
                block_f[f"bn{j + 1}"] = _bn(sd, bn_prefix(s, b, j))
            if b == 0:
                block_p["downsample_conv"] = _conv(sd, short_conv_key(s, b))
                block_f["downsample_bn"] = _bn(sd, short_bn_prefix(s, b))
            layer_p[f"block_{b}"] = block_p
            layer_f[f"block_{b}"] = block_f
        params[f"layer{s + 1}"] = layer_p
        frozen[f"layer{s + 1}"] = layer_f
    return params, frozen


# ---------------------------------------------------------------------------
# Transformer + heads
# ---------------------------------------------------------------------------


def _convert_transformer(
    sd: Mapping, scheme: str, num_encoder_layers: int, num_decoder_layers: int,
    model_dim: int,
) -> Tree:
    tr: Tree = {}
    if scheme == "facebook":
        for i in range(num_encoder_layers):
            p = f"transformer.encoder.layers.{i}"
            tr[f"encoder_layer_{i}"] = {
                "self_attn": _packed_attention(sd, f"{p}.self_attn", model_dim),
                "linear1": _linear(sd, f"{p}.linear1"),
                "linear2": _linear(sd, f"{p}.linear2"),
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
            }
        for i in range(num_decoder_layers):
            p = f"transformer.decoder.layers.{i}"
            tr[f"decoder_layer_{i}"] = {
                "self_attn": _packed_attention(sd, f"{p}.self_attn", model_dim),
                "cross_attn": _packed_attention(sd, f"{p}.multihead_attn", model_dim),
                "linear1": _linear(sd, f"{p}.linear1"),
                "linear2": _linear(sd, f"{p}.linear2"),
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
                "norm3": _layernorm(sd, f"{p}.norm3"),
            }
        tr["decoder_norm"] = _layernorm(sd, "transformer.decoder.norm")
    else:  # hf
        for i in range(num_encoder_layers):
            p = f"model.encoder.layers.{i}"
            tr[f"encoder_layer_{i}"] = {
                "self_attn": _split_attention(sd, f"{p}.self_attn"),
                "linear1": _linear(sd, f"{p}.fc1"),
                "linear2": _linear(sd, f"{p}.fc2"),
                "norm1": _layernorm(sd, f"{p}.self_attn_layer_norm"),
                "norm2": _layernorm(sd, f"{p}.final_layer_norm"),
            }
        for i in range(num_decoder_layers):
            p = f"model.decoder.layers.{i}"
            tr[f"decoder_layer_{i}"] = {
                "self_attn": _split_attention(sd, f"{p}.self_attn"),
                "cross_attn": _split_attention(sd, f"{p}.encoder_attn"),
                "linear1": _linear(sd, f"{p}.fc1"),
                "linear2": _linear(sd, f"{p}.fc2"),
                "norm1": _layernorm(sd, f"{p}.self_attn_layer_norm"),
                "norm2": _layernorm(sd, f"{p}.encoder_attn_layer_norm"),
                "norm3": _layernorm(sd, f"{p}.final_layer_norm"),
            }
        tr["decoder_norm"] = _layernorm(sd, "model.decoder.layernorm")
    return tr


def _convert_segmentation_head(sd: Mapping, model_dim: int = 256) -> Tree:
    """Panoptic mask head + attention-map params (facebook DETRsegm and
    HF DetrForSegmentation share the ``mask_head.* / bbox_attention.*``
    naming). The torch ``lay1`` convolves concat(features, attention
    maps); our split form (models/segmentation.py) gets the first
    ``model_dim`` input channels as ``lay1_feats`` and the rest as the
    bias-free ``lay1_attn``."""

    def conv(name):
        out = {"kernel": _t(sd[f"mask_head.{name}.weight"]).transpose(2, 3, 1, 0)}
        bias = f"mask_head.{name}.bias"
        if bias in sd:
            out["bias"] = _t(sd[bias])
        return out

    def gn(name):
        return {
            "scale": _t(sd[f"mask_head.{name}.weight"]),
            "bias": _t(sd[f"mask_head.{name}.bias"]),
        }

    lay1 = _t(sd["mask_head.lay1.weight"]).transpose(2, 3, 1, 0)  # HWIO
    mask_head = {
        "lay1_feats": {
            "kernel": lay1[:, :, :model_dim, :],
            "bias": _t(sd["mask_head.lay1.bias"]),
        },
        "lay1_attn": {"kernel": lay1[:, :, model_dim:, :]},
        "out_lay": conv("out_lay"),
    }
    for j in range(2, 6):
        mask_head[f"lay{j}"] = conv(f"lay{j}")
    for j in range(1, 6):
        mask_head[f"gn{j}"] = gn(f"gn{j}")
    for j in range(1, 4):
        mask_head[f"adapter{j}"] = conv(f"adapter{j}")

    bbox_attention = {
        "q_proj": _linear(sd, "bbox_attention.q_linear"),
        "k_proj": _linear(sd, "bbox_attention.k_linear"),
    }
    return {"mask_head": mask_head, "bbox_attention": bbox_attention}


def convert_torch_detr(
    state_dict: Mapping,
    scheme: str = "auto",
    backbone_depth: int = 50,
    num_encoder_layers: int = 6,
    num_decoder_layers: int = 6,
    model_dim: int = 256,
) -> Tree:
    """Torch DETR state_dict -> flax variables ``{'params', 'frozen'}``.

    ``scheme='auto'`` sniffs facebook vs huggingface naming. Panoptic /
    segmentation checkpoints (facebook DETRsegm, HF DetrForSegmentation)
    are detected by their ``mask_head.*`` keys: the detector lives under
    a ``detr.`` prefix there, and the mask head converts alongside.
    """
    has_mask_head = any(k.startswith("mask_head.") for k in state_dict)
    seg_tree = (
        _convert_segmentation_head(state_dict, model_dim)
        if has_mask_head
        else None
    )
    if any(k.startswith("detr.") for k in state_dict):
        state_dict = {
            k[len("detr."):]: v
            for k, v in state_dict.items()
            if k.startswith("detr.")
        }

    keys = list(state_dict.keys())
    if scheme == "auto":
        scheme = "hf" if any(k.startswith("model.") for k in keys) else "facebook"

    bb_params, bb_frozen = _convert_backbone(state_dict, scheme, backbone_depth)
    tr = _convert_transformer(
        state_dict, scheme, num_encoder_layers, num_decoder_layers, model_dim
    )

    if scheme == "facebook":
        input_proj_w = "input_proj.weight"
        input_proj_b = "input_proj.bias"
        query = "query_embed.weight"
        cls = "class_embed"
        bbox = "bbox_embed.layers"
    else:
        input_proj_w = "model.input_projection.weight"
        input_proj_b = "model.input_projection.bias"
        query = "model.query_position_embeddings.weight"
        cls = "class_labels_classifier"
        bbox = "bbox_predictor.layers"

    params: Tree = {
        "backbone": bb_params,
        "transformer": tr,
        "input_proj": {
            "kernel": _t(state_dict[input_proj_w]).transpose(2, 3, 1, 0),
            "bias": _t(state_dict[input_proj_b]),
        },
        "query_embed": _t(state_dict[query]),
        "class_embed": _linear(state_dict, cls),
        "bbox_embed": {
            f"layer_{j}": _linear(state_dict, f"{bbox}.{j}") for j in range(3)
        },
    }
    if seg_tree is not None:
        params.update(seg_tree)
    return {"params": params, "frozen": {"backbone": bb_frozen}}


def convert_torchvision_backbone(state_dict: Mapping, depth: int = 50) -> Tree:
    """Torchvision ``resnet50/101-*.pth`` -> backbone-only variables.

    Offline ImageNet initialization for from-scratch training — the
    TPU-native stand-in for the reference's ``tf_backbone=True`` Keras
    ImageNet load (detr_tf/networks/detr.py:148). The classifier ``fc``
    weights are ignored. Returns ``{'params': {'backbone': ...},
    'frozen': {'backbone': ...}}`` ready to merge into model variables.
    """
    params, frozen = _convert_backbone(state_dict, "torchvision", depth)
    return {"params": {"backbone": params}, "frozen": {"backbone": frozen}}


def load_backbone_weights(path: str, depth: int = 50) -> Tree:
    """Load a local torchvision resnet checkpoint (.pth/.pt/.bin or a
    converted .npz) into backbone-only variables."""
    if path.endswith(".npz"):
        tree = load_variables_npz(path)
        if "params" not in tree:  # raw backbone subtrees
            raise ValueError(f"{path} is not a variables archive")
        return tree
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torchvision_backbone(sd, depth=depth)


def apply_backbone_weights(variables: Tree, backbone_vars: Tree) -> Tree:
    """Graft converted backbone params+frozen stats into full variables."""
    out = {k: dict(v) for k, v in variables.items()}
    out.setdefault("frozen", {})
    out["params"]["backbone"] = backbone_vars["params"]["backbone"]
    out["frozen"]["backbone"] = backbone_vars["frozen"]["backbone"]
    return out


# ---------------------------------------------------------------------------
# File-based loading (reference weights.py:13-37 equivalent, egress-free)
# ---------------------------------------------------------------------------

WEIGHT_SEARCH_PATHS = ("weights/detr", os.path.expanduser("~/.cache/detr_tpu"))


def save_variables_npz(variables: Tree, path: str) -> None:
    """Flatten a variables pytree into an npz archive."""
    flat = {}

    def rec(prefix, node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_variables_npz(path: str) -> Tree:
    data = np.load(path)
    tree: Tree = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


# Public checkpoint registry (parity target: the reference's GCS
# download table, detr_tf/networks/weights.py:5-11). Facebook's
# published URLs embed the first 8 sha256 hex chars of the file in the
# filename (the torch.hub convention), so integrity is verifiable from
# the table alone: after download the file's sha256 must start with
# ``sha256_prefix``.
PRETRAINED_CHECKPOINTS = {
    "detr-r50": {
        "url": "https://dl.fbaipublicfiles.com/detr/detr-r50-e632da11.pth",
        "sha256_prefix": "e632da11",
    },
    "detr-r101": {
        "url": "https://dl.fbaipublicfiles.com/detr/detr-r101-2c7b67e5.pth",
        "sha256_prefix": "2c7b67e5",
    },
}
# The reference's short name "detr" is its R50 checkpoint.
PRETRAINED_CHECKPOINTS["detr"] = PRETRAINED_CHECKPOINTS["detr-r50"]


def verify_checksum(path: str, sha256_prefix: str) -> None:
    """Raise ValueError unless the file's sha256 starts with the
    registry prefix."""
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    if not digest.startswith(sha256_prefix):
        raise ValueError(
            f"checksum mismatch for {path}: sha256={digest[:16]}… does "
            f"not start with registry prefix {sha256_prefix} — corrupt "
            "or tampered download; delete the file and retry"
        )


def download_weights(name: str = "detr", dest_dir: str = None,
                     _urlopen=None) -> str:
    """Fetch a registered pretrained checkpoint, checksum-gated.

    Activates the moment the environment gains egress — until then it
    fails fast with a clear message instead of hanging. Returns the
    local path (skipping the download when a verified copy already
    exists). ``_urlopen`` is injectable for tests.
    """
    if name not in PRETRAINED_CHECKPOINTS:
        raise KeyError(
            f"unknown checkpoint '{name}'; registered: "
            f"{sorted(set(PRETRAINED_CHECKPOINTS))}"
        )
    entry = PRETRAINED_CHECKPOINTS[name]
    dest_dir = dest_dir or os.environ.get("DETR_TPU_WEIGHTS") or \
        WEIGHT_SEARCH_PATHS[0]
    os.makedirs(dest_dir, exist_ok=True)
    path = os.path.join(dest_dir, entry["url"].rsplit("/", 1)[-1])
    if os.path.exists(path):
        verify_checksum(path, entry["sha256_prefix"])
        return path
    if _urlopen is None:
        from urllib.request import urlopen as _urlopen
    tmp = path + ".part"
    try:
        with _urlopen(entry["url"], timeout=60) as resp, \
                open(tmp, "wb") as out:
            for chunk in iter(lambda: resp.read(1 << 20), b""):
                out.write(chunk)
    except OSError as e:  # URLError subclasses OSError
        if os.path.exists(tmp):
            os.remove(tmp)
        raise ConnectionError(
            f"cannot download {entry['url']}: {e}. This environment "
            "appears to have no network egress — place the checkpoint "
            f"at {path} manually (any machine with egress can fetch "
            "the URL) and re-run."
        ) from e
    try:
        verify_checksum(tmp, entry["sha256_prefix"])
    except ValueError:
        os.remove(tmp)
        raise
    os.replace(tmp, path)
    return path


def load_weights(name_or_path: str = "detr", download: bool = False,
                 **convert_kwargs) -> Tree:
    """Load DETR weights from a local file, converting torch formats.

    Accepts a direct path to a ``.npz`` (our native converted format) or
    ``.pth``/``.pt``/``.bin`` (torch state_dict, facebook or hf naming),
    or a short name (e.g. ``"detr"``) searched under ``weights/detr`` and
    ``$DETR_TPU_WEIGHTS``. With ``download=True`` a registered short
    name with no local copy is fetched from its public URL
    (checksum-gated; see ``download_weights``) — egress required.
    """
    candidates = []
    if os.path.exists(name_or_path):
        candidates.append(name_or_path)
    else:
        search = [os.environ.get("DETR_TPU_WEIGHTS", "")] + list(WEIGHT_SEARCH_PATHS)
        for d in filter(None, search):
            for ext in (".npz", ".pth", ".pt", ".bin"):
                candidates.append(os.path.join(d, name_or_path + ext))
        if name_or_path in PRETRAINED_CHECKPOINTS:
            # The registry filename (e.g. detr-r50-e632da11.pth) under
            # the same search dirs — a manually placed download.
            fname = PRETRAINED_CHECKPOINTS[name_or_path]["url"].rsplit(
                "/", 1)[-1]
            for d in filter(None, search):
                candidates.append(os.path.join(d, fname))
    if download and not any(os.path.exists(p) for p in candidates) \
            and name_or_path in PRETRAINED_CHECKPOINTS:
        candidates.append(download_weights(name_or_path))
    for path in candidates:
        if not os.path.exists(path):
            continue
        if path.endswith(".npz"):
            return load_variables_npz(path)
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]  # facebook checkpoints nest under 'model'
        return convert_torch_detr(sd, **convert_kwargs)
    raise FileNotFoundError(
        f"No local weights found for '{name_or_path}'. This environment has no "
        "network egress; place a torch checkpoint (facebook detr-r50-*.pth or a "
        "HuggingFace DetrForObjectDetection state_dict) or a converted .npz "
        "under weights/detr/ or point DETR_TPU_WEIGHTS at it."
    )
