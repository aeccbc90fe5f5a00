"""Train/valid logging hooks.

Parity with the reference ``train_log`` / ``valid_log``
(detr_tf/logger/training_logging.py:92-106): every ``log_every`` train
steps, overlay predicted and target boxes on the first images of the
batch and push them (plus scalars) to wandb; during validation,
accumulate mAP per batch and flush on the last one. All host-side, all
no-ops without wandb.
"""

from __future__ import annotations

import numpy as np

from .. import inference as inference_lib
from ..ops import boxes as bbox_ops
from .wandb_logging import WandbSender


def _first_image_overlays(images, batch, m_outputs, config, class_names, max_images=1):
    sender = WandbSender()
    for b in range(min(max_images, images.shape[0])):
        img = np.asarray(images[b])
        # predictions
        outputs_b = {
            "pred_logits": np.asarray(m_outputs["pred_logits"][b : b + 1]),
            "pred_boxes": np.asarray(m_outputs["pred_boxes"][b : b + 1]),
        }
        p_bbox, p_labels, p_scores = inference_lib.get_model_inference(
            outputs_b, config.background_class
        )
        base = img.copy()
        if "pred_masks" in m_outputs:
            # segmentation model: blend instance masks under the boxes
            probs = 1.0 / (1.0 + np.exp(-np.asarray(m_outputs["pred_masks"][b])))
            keep = np.asarray(
                np.argmax(outputs_b["pred_logits"][0], axis=-1)
                != config.background_class
            )
            base = inference_lib.numpy_masks_to_image(
                base, (probs > 0.5)[keep], labels=None, config=config
            )  # uint8 from here; numpy_bbox_to_image passes it through
        pred_img = inference_lib.numpy_bbox_to_image(
            base, p_bbox, p_labels, p_scores, class_names, config
        )
        sender.gather_inference_image(pred_img, caption="prediction")
        # targets
        n = int(np.asarray(batch["mask"][b]).sum())
        t_img = inference_lib.numpy_bbox_to_image(
            img.copy(),
            np.asarray(batch["boxes"][b][:n]),
            np.asarray(batch["classes"][b][:n]),
            None,
            class_names,
            config,
        )
        sender.gather_inference_image(t_img, caption="target")
    return sender


def train_log(batch, m_outputs, config, step, class_names, prefix="train/",
              log_every: int = 100):
    """Image + scalar logging on the train cadence
    (training_logging.py:92-97)."""
    if step % log_every != 0:
        return
    sender = _first_image_overlays(
        batch["images"], batch, m_outputs, config, class_names
    )
    sender.send_images(f"{prefix}images", step)


def valid_log(batch, m_outputs, config, val_step, global_step, class_names,
              evaluation_step: int = 200, prefix="val/"):
    """Accumulate mAP each validation batch; flush on the last
    (training_logging.py:99-106)."""
    logits = np.asarray(m_outputs["pred_logits"])
    boxes = np.asarray(m_outputs["pred_boxes"])
    num_classes = logits.shape[-1]
    for b in range(logits.shape[0]):
        outputs_b = {
            "pred_logits": logits[b : b + 1],
            "pred_boxes": boxes[b : b + 1],
        }
        p_bbox, p_labels, p_scores = inference_lib.get_model_inference(
            outputs_b, config.background_class, bbox_format="xyxy"
        )
        n = int(np.asarray(batch["mask"][b]).sum())
        t_xyxy = bbox_ops.np_xcycwh_to_xyxy(np.asarray(batch["boxes"][b][:n]))
        WandbSender.compute_map_on_batch(
            p_bbox, p_labels, p_scores, t_xyxy,
            np.asarray(batch["classes"][b][:n]), num_classes,
        )
    if val_step + 1 >= evaluation_step:
        WandbSender.send_ap_data(global_step, prefix=prefix)
