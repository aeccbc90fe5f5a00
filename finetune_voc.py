"""Finetune DETR on Pascal VOC with fresh heads and a staged unfreeze.

Workflow parity with the reference ``finetune_voc.py``: headless
pretrained trunk + new class/box heads (reference :44-49), epoch 0
trains the heads only at 1e-3, epoch >= 1 unfreezes the transformers at
1e-4 (reference :90-96) — here via ``Trainer.set_trainable`` /
``set_learning_rates`` (LR changes are retrace-free).

Usage:
  python finetune_voc.py --data_dir /path/VOC2012 --img_dir JPEGImages \
      --ann_dir Annotations --batch_size 8 --target_batch 32
"""

from detr_tensorflow_tpu.data import load_voc_dataset
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

    train_dt, class_names = load_voc_dataset(config, config.batch_size,
                                             augmentation=True)
    valid_dt, _ = load_voc_dataset(config, config.batch_size,
                                   augmentation=False, shuffle=False)

    # Pretrained trunk, fresh heads sized to the discovered classes
    # (reference finetune_voc.py:33-58).
    model = get_detr_model(
        config, include_top=False, nb_class=len(class_names), weights="detr"
    )
    mesh = make_mesh(config.data_parallel) if config.data_parallel > 1 else None
    trainer = Trainer(model.module, model.variables, config, mesh=mesh)

    for epoch in range(100):
        if epoch == 1:
            # Staged unfreeze (reference :90-96).
            trainer.set_trainable(train_transformers=True)
            trainer.set_learning_rates(transformers=1e-4, nlayers=1e-4)
        eval_loop(trainer, valid_dt, config, class_names, evaluation_step=100)
        fit(trainer, train_dt, config, epoch, class_names)
        if config.checkpoint_dir:
            save_checkpoint(trainer.state, config.checkpoint_dir)
