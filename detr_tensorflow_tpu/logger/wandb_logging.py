"""Weights & Biases sender (optional dependency, gated import).

Capability parity with the reference ``WandbSender``
(detr_tf/logger/wandb_logging.py:18-228): buffered bbox-overlay images,
cross-batch validation mAP accumulation flushed once per eval pass, and
scalar logging — all silent no-ops when wandb is not installed (the
reference likewise guards the import, wandb_logging.py:8-12).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:  # wandb is optional; this environment does not ship it.
    import wandb
except Exception:  # pragma: no cover
    wandb = None

from ..metrics import MeanAPEvaluator


class WandbSender:
    """Buffers images/metrics and pushes them to wandb when available."""

    # Class-level accumulator mirroring the reference's static AP_DATA
    # (wandb_logging.py:63-123): validation batches accumulate into one
    # evaluator, flushed by ``send_ap_data``.
    _ap_evaluator: Optional[MeanAPEvaluator] = None

    def __init__(self):
        self.images = []

    # -- images -------------------------------------------------------------

    def gather_inference_image(
        self, image: np.ndarray, caption: str = ""
    ) -> None:
        if wandb is None:
            return
        self.images.append(wandb.Image(image, caption=caption))

    def send_images(self, key: str, step: int) -> None:
        if wandb is None or not self.images:
            self.images = []
            return
        wandb.log({key: self.images}, step=step)
        self.images = []

    # -- scalars ------------------------------------------------------------

    @staticmethod
    def send_scalars(scalars: dict, step: int, prefix: str = "") -> None:
        if wandb is None:
            return
        wandb.log({f"{prefix}{k}": v for k, v in scalars.items()}, step=step)

    # -- validation mAP -----------------------------------------------------

    @classmethod
    def init_ap_data(cls, num_classes: int, class_names: Optional[Sequence[str]] = None):
        cls._ap_evaluator = MeanAPEvaluator(num_classes, class_names=class_names)

    @classmethod
    def compute_map_on_batch(
        cls, p_boxes, p_labels, p_scores, t_boxes, t_labels, num_classes: int
    ) -> None:
        """Accumulate one image's detections (corner-format boxes)."""
        if cls._ap_evaluator is None or cls._ap_evaluator.num_classes != num_classes:
            cls.init_ap_data(num_classes)
        cls._ap_evaluator.add_image(p_boxes, p_labels, p_scores, t_boxes, t_labels)

    @classmethod
    def send_ap_data(cls, step: int, prefix: str = "val/") -> Optional[dict]:
        """Flush accumulated mAP to wandb (and return the table); resets
        the accumulator like the reference (wandb_logging.py:114-115)."""
        if cls._ap_evaluator is None:
            return None
        table = cls._ap_evaluator.compute()
        if wandb is not None:
            scalars = {
                f"{prefix}map_box_all": table["box"]["all"],
                f"{prefix}map_box_50": table["box"][50],
                f"{prefix}map_mask_all": table["mask"]["all"],
                f"{prefix}map_mask_50": table["mask"][50],
            }
            wandb.log(scalars, step=step)
            if wandb.run is not None:
                wandb.run.summary.update(scalars)
        cls._ap_evaluator = None
        return table
