"""End-to-end learning: a tiny DETR overfits a fixed scene and the mAP
evaluator confirms it — the full loop (model -> on-device matching ->
loss -> optimizer -> postprocess -> AP) actually learns."""

import numpy as np
import jax
import jax.numpy as jnp

from detr_tensorflow_tpu import inference
from detr_tensorflow_tpu.metrics import MeanAPEvaluator
from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.ops import boxes as bbox_ops
from detr_tensorflow_tpu.train import Trainer, TrainingConfig


def test_overfit_single_scene_improves_ap(rng):
    # One image, two distinctly-placed boxes of different classes.
    image = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    gt_boxes = np.array([[[0.3, 0.3, 0.25, 0.25], [0.7, 0.7, 0.2, 0.3]]], np.float32)
    gt_classes = np.array([[1, 2]], np.int32)
    batch = {
        "images": jnp.asarray(image),
        "boxes": jnp.asarray(np.pad(gt_boxes, ((0, 0), (0, 4), (0, 0)))),
        "classes": jnp.asarray(np.pad(gt_classes, ((0, 0), (0, 4)))),
        "mask": jnp.asarray(np.array([[True, True] + [False] * 4])),
    }

    model = DETR(
        num_classes=4, num_queries=6, model_dim=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=64,
        dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    config = TrainingConfig(
        background_class=0, train_backbone=True, train_transformers=True,
        target_batch=None, backbone_lr=1e-3, transformers_lr=1e-3,
    )
    trainer = Trainer(model, variables, config)

    def measure_ap():
        out, _ = trainer.evaluate(batch)
        ev = MeanAPEvaluator(num_classes=4)
        p_bbox, p_labels, p_scores = inference.get_model_inference(
            {k: np.asarray(v) for k, v in out.items()
             if k in ("pred_logits", "pred_boxes")},
            config.background_class, bbox_format="xyxy",
        )
        ev.add_image(
            p_bbox, p_labels, p_scores,
            bbox_ops.np_xcycwh_to_xyxy(gt_boxes[0]), gt_classes[0],
        )
        return ev.compute()["box"]

    first_loss = float(trainer.step(batch)["total_loss"])
    for _ in range(80):
        log = trainer.step(batch)
    final_loss = float(log["total_loss"])
    assert final_loss < first_loss * 0.5, (first_loss, final_loss)

    table = measure_ap()
    # Overfit on one scene: near-perfect detection at IoU .50.
    assert table[50] >= 95.0, table
    assert table["all"] > 20.0, table
