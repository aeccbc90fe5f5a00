"""Training configuration.

The reference threads a mutable god-object through every layer
(``TrainingConfig``, detr_tf/training_config.py:41-103 — data loaders and
model assembly write back into it, SURVEY.md §1). Here configuration is a
frozen dataclass: anything a component "discovers" (e.g. the dataset's
background class) is *returned* and folded into a new config via
``replace``. Learning rates stay runtime values passed into the jitted
step (so schedules/manual changes never retrace — the TPU-native
equivalent of the reference's ``tf.Variable`` LRs,
training_config.py:64-68).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset paths (reference training_config.py:106-112)."""

    data_dir: Optional[str] = None
    img_dir: Optional[str] = None
    ann_file: Optional[str] = None
    ann_dir: Optional[str] = None

    @property
    def full_img_dir(self) -> Optional[str]:
        if self.data_dir and self.img_dir:
            return os.path.join(self.data_dir, self.img_dir)
        return self.img_dir

    @property
    def full_ann_file(self) -> Optional[str]:
        if self.data_dir and self.ann_file:
            return os.path.join(self.data_dir, self.ann_file)
        return self.ann_file

    @property
    def full_ann_dir(self) -> Optional[str]:
        if self.data_dir and self.ann_dir:
            return os.path.join(self.data_dir, self.ann_dir)
        return self.ann_dir


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    """Flag surface matches the reference parser
    (training_config.py:6-38) plus TPU-native additions."""

    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    background_class: int = 0
    image_size: Tuple[int, int] = (376, 672)  # (height, width)

    # What to train (reference: train_backbone/train_transformers/train_nlayers)
    train_backbone: bool = False
    train_transformers: bool = False
    train_nlayers: bool = False

    # How to train
    finetuning: bool = False
    batch_size: int = 1
    gradient_norm_clipping: float = 0.1
    target_batch: Optional[int] = 1  # virtual batch via accumulation

    # Learning rates (runtime-adjustable; no retrace on change)
    backbone_lr: float = 1e-5
    transformers_lr: float = 1e-4
    nlayers_lr: float = 1e-4

    # Logging / bookkeeping
    log: bool = False
    global_step: int = 0  # informational; the authoritative step lives in TrainState

    # Pipeline
    normalized_method: str = "torch_resnet"

    # Model family (DETR-R50 default; R101 and DC5 protocols supported)
    backbone_depth: int = 50  # 50 | 101
    dilation: bool = False  # DC5: stride-16 C5 via dilated convs

    # Multi-scale training: a discrete ladder of (H, W) train sizes.
    # Each example is resized to one ladder rung (chosen uniformly at
    # random) and the host pipeline groups batches by shape, so every
    # batch is one static shape and XLA caches exactly one program per
    # rung. This is the TPU-native adaptation of the DETR paper's
    # multi-scale recipe, which the reference only carries as disabled
    # code (reference data/transformation.py:96-112) — its README
    # apologizes for fixed-size training (reference README.md:19).
    # None = fixed ``image_size`` (reference behavior).
    multi_scale: Optional[Tuple[Tuple[int, int], ...]] = None

    # TPU-native knobs
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    attn_impl: str = "auto"  # shape-dispatched flash attention (the
    # Pallas kernel where it measures faster — long-key call sites on
    # TPU; models/transformer.py:resolve_attn_impl); "xla"/"pallas"
    # force one path everywhere
    # LAP solver for Hungarian matching: "pallas" fuses all per-layer
    # matchings into one Mosaic program (ops/pallas/lap.py); "xla" is
    # the vmapped while-loop solver. Same exact assignments either way.
    lap_impl: str = "xla"
    # Single-chip trainers AOT-compile the step with compiler-chosen
    # (AUTO) layouts for the data batch and feed batches pre-laid-out,
    # deleting the in-step input relayout copy (train/engine.py,
    # docs/performance.md round 4). Harmless no-op on backends without
    # layout support (graceful fallback).
    auto_input_layout: bool = True
    num_queries: int = 100
    data_parallel: int = 1  # devices along the mesh's data axis
    checkpoint_dir: Optional[str] = None
    # Local torchvision resnet checkpoint for ImageNet backbone init
    # (offline stand-in for the reference's tf_backbone=True Keras load).
    backbone_weights: Optional[str] = None

    @property
    def gradient_aggregate(self) -> int:
        if self.target_batch is None:
            return 1
        return max(1, int(self.target_batch) // int(self.batch_size))

    def replace(self, **kw) -> "TrainingConfig":
        return dataclasses.replace(self, **kw)

    def update_from_args(self, args: argparse.Namespace) -> "TrainingConfig":
        """Fold parsed CLI args into a new config (reference
        training_config.py:85-103, minus the mutation)."""
        kw = {}
        for f in dataclasses.fields(self):
            if f.name in ("data",):
                continue
            if hasattr(args, f.name) and getattr(args, f.name) is not None:
                v = getattr(args, f.name)
                if f.name == "image_size":
                    v = tuple(v)
                elif f.name == "multi_scale":
                    if len(v) % 2:
                        raise SystemExit(
                            "--multi_scale takes H W pairs (even count)"
                        )
                    v = tuple(
                        (int(v[i]), int(v[i + 1])) for i in range(0, len(v), 2)
                    )
                kw[f.name] = v
        data = DataConfig(
            data_dir=getattr(args, "data_dir", None),
            img_dir=getattr(args, "img_dir", None),
            ann_file=getattr(args, "ann_file", None),
            ann_dir=getattr(args, "ann_dir", None),
        )
        return self.replace(data=data, **kw)


def training_config_parser() -> argparse.ArgumentParser:
    """CLI flags, superset of the reference parser (training_config.py:6-38;
    note the reference's LR flags are mistyped ``type=bool`` — fixed here)."""
    p = argparse.ArgumentParser(description="detr_tensorflow_tpu training")
    # Dataset
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--img_dir", type=str, default=None)
    p.add_argument("--ann_file", type=str, default=None)
    p.add_argument("--ann_dir", type=str, default=None)
    p.add_argument("--background_class", type=int, default=None)
    p.add_argument("--image_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="fixed train/resize size (reference default 376 672)")
    p.add_argument("--multi_scale", type=int, nargs="+", default=None,
                   metavar="N",
                   help="multi-scale training size ladder as H W pairs, "
                        "e.g. --multi_scale 320 576 376 672 432 768; "
                        "batches are grouped by size so each rung is one "
                        "compiled XLA program")
    # What to train
    p.add_argument("--train_backbone", action="store_true", default=None)
    p.add_argument("--train_transformers", action="store_true", default=None)
    p.add_argument("--train_nlayers", action="store_true", default=None)
    # How to train
    p.add_argument("--finetuning", action="store_true", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--gradient_norm_clipping", type=float, default=None)
    p.add_argument("--target_batch", type=int, default=None)
    # Learning rates
    p.add_argument("--backbone_lr", type=float, default=None)
    p.add_argument("--transformers_lr", type=float, default=None)
    p.add_argument("--nlayers_lr", type=float, default=None)
    # Logging
    p.add_argument("--log", action="store_true", default=None)
    # TPU-native
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--attn_impl", type=str, default=None,
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--lap_impl", type=str, default=None, choices=["xla", "pallas"],
                   help="Hungarian-matching LAP solver (pallas = fused kernel)")
    p.add_argument("--backbone_depth", type=int, default=None, choices=[50, 101],
                   help="ResNet depth: DETR-R50 (default) or DETR-R101")
    p.add_argument("--dilation", action="store_true", default=None,
                   help="DC5 variant: dilated stride-16 final stage")
    p.add_argument("--data_parallel", type=int, default=None)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--backbone_weights", type=str, default=None,
                   help="local torchvision resnet50/101 .pth for ImageNet "
                        "backbone initialization")
    return p
