"""Finetune the pretrained DETR (with its COCO heads) on COCO —
transformers only (reference ``finetune_coco.py``:50-52).

Usage:
  python finetune_coco.py --data_dir /path/coco --img_dir train2017 \
      --ann_file annotations/instances_train2017.json --batch_size 8
"""

from detr_tensorflow_tpu.data import load_coco_dataset
from detr_tensorflow_tpu.models import get_detr_model
from detr_tensorflow_tpu.parallel import make_mesh
from detr_tensorflow_tpu.train import (
    Trainer,
    TrainingConfig,
    fit,
    eval_loop,
    save_checkpoint,
    training_config_parser,
)

if __name__ == "__main__":
    args = training_config_parser().parse_args()
    config = TrainingConfig(
        train_transformers=True, batch_size=8, target_batch=32,
    ).update_from_args(args)

    train_dt, class_names = load_coco_dataset(config, config.batch_size,
                                              augmentation=True)
    valid_dt, _ = load_coco_dataset(config, config.batch_size,
                                    augmentation=False, shuffle=False)
    config = config.replace(background_class=train_dt.background_class)

    model = get_detr_model(config, include_top=True, weights="detr")
    mesh = make_mesh(config.data_parallel) if config.data_parallel > 1 else None
    trainer = Trainer(model.module, model.variables, config, mesh=mesh)

    for epoch in range(100):
        eval_loop(trainer, valid_dt, config, class_names, evaluation_step=200)
        fit(trainer, train_dt, config, epoch, class_names)
        if config.checkpoint_dir:
            save_checkpoint(trainer.state, config.checkpoint_dir)
