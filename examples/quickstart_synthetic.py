"""Fully-offline quickstart: the whole framework end to end in ~2 minutes.

Generates a tiny synthetic COCO dataset, finetunes a small DETR on it
(heads-only epoch, then staged unfreeze), evaluates with the mAP table,
and runs the bucketed Predictor on mixed-size images — no network, no
weights, no GPU/TPU required (runs on CPU; on a TPU host it just runs
faster).

  python examples/quickstart_synthetic.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from detr_tensorflow_tpu.data import make_synthetic_coco  # noqa: E402


def main():
    from detr_tensorflow_tpu.data import load_coco_dataset
    from detr_tensorflow_tpu.logger import valid_log
    from detr_tensorflow_tpu.models import build_detr
    from detr_tensorflow_tpu.predictor import Predictor
    from detr_tensorflow_tpu.train import (
        DataConfig, Trainer, TrainingConfig, fit,
    )

    root = tempfile.mkdtemp(prefix="detr_tpu_quickstart_")
    make_synthetic_coco(root)
    print(f"synthetic COCO dataset at {root}")

    config = TrainingConfig(
        data=DataConfig(data_dir=root, img_dir="images", ann_file="ann.json"),
        image_size=(128, 128), batch_size=4, target_batch=None,
        train_backbone=True, train_transformers=True,
        backbone_lr=3e-3, transformers_lr=3e-3, num_queries=8,
    )
    train_dt, class_names = load_coco_dataset(
        config, config.batch_size, augmentation=False, num_workers=2
    )
    config = config.replace(background_class=train_dt.background_class)
    print("classes:", class_names, "| background:", config.background_class)

    # A small DETR (full architecture, shrunken dims) trained from scratch.
    model = build_detr(
        num_classes=len(class_names), num_queries=8, head="detr",
        model_dim=64, num_heads=4, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=128, dropout=0.0,
        backbone_stage_sizes=(1, 1, 1, 1), image_size=config.image_size,
    )
    trainer = Trainer(model.module, model.variables, config)

    for epoch in range(120):
        fit(trainer, train_dt, config, epoch, class_names,
            log_every=10 if epoch % 20 == 0 else 10**9)

    # Validation mAP via the logger's accumulator.
    from detr_tensorflow_tpu.logger.wandb_logging import WandbSender

    for val_step, batch in enumerate(train_dt):
        outputs, _ = trainer.evaluate(batch)
        valid_log(batch, outputs, config, val_step, int(trainer.state.step),
                  class_names, evaluation_step=10**9)
    if WandbSender._ap_evaluator is not None:
        WandbSender._ap_evaluator.print_table()

    # Serving on mixed-size raw images.
    model.variables = trainer.variables
    predictor = Predictor(model, config.background_class, bucket_divisor=64,
                          score_threshold=0.5)
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 60, size=(100, 150, 3)).astype(np.uint8),
              rng.integers(0, 60, size=(128, 128, 3)).astype(np.uint8)]
    dets = predictor(frames)
    for i, det in enumerate(dets):
        print(f"image {i}: {len(det.boxes)} detections above 0.5")
    print("quickstart complete.")


if __name__ == "__main__":
    main()
