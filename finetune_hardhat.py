"""Finetune DETR on the Hard Hat CSV dataset (3 classes, "person"
excluded) with the staged unfreeze — workflow parity with the reference
``finetune_hardhat.py`` (:52-55 class exclusion, :72-78 unfreeze,
180 epochs).

Usage:
  python finetune_hardhat.py --data_dir /path/hardhat \
      --img_dir train --ann_file train/_annotations.csv
"""

from detr_tensorflow_tpu.data import load_tfcsv_dataset
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
        background_class=0, train_nlayers=True, nlayers_lr=1e-3,
        batch_size=8, target_batch=32, image_size=(480, 720),
    ).update_from_args(args)

    train_dt, class_names = load_tfcsv_dataset(
        config, config.batch_size, augmentation=True, exclude=["person"]
    )
    valid_dt, _ = load_tfcsv_dataset(
        config, config.batch_size, augmentation=False, exclude=["person"],
        shuffle=False,
    )

    model = get_detr_model(
        config, include_top=False, nb_class=len(class_names), weights="detr"
    )
    mesh = make_mesh(config.data_parallel) if config.data_parallel > 1 else None
    trainer = Trainer(model.module, model.variables, config, mesh=mesh)

    for epoch in range(180):
        if epoch == 1:
            trainer.set_trainable(train_transformers=True)
            trainer.set_learning_rates(transformers=1e-4, nlayers=1e-4)
        eval_loop(trainer, valid_dt, config, class_names, evaluation_step=50)
        fit(trainer, train_dt, config, epoch, class_names)
        if config.checkpoint_dir:
            save_checkpoint(trainer.state, config.checkpoint_dir)
