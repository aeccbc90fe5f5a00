"""Train the instance-segmentation head on COCO with the detector frozen
— the DETR-paper panoptic recipe (detector trained first, then the mask
head alone on top of frozen weights).

Capability beyond the reference, whose mask path is a zero placeholder
(reference eval.py:54, README.md:88): the model here carries a real
attention-map + FPN mask head (models/segmentation.py), the loader
rasterizes COCO segmentation annotations (data/masks.py), and the loss
adds focal + dice terms on matched queries (ops/losses.py). The mask
head parameters live in the "nlayers" optimizer group, so
``train_nlayers``-only training is exactly frozen-detector mask training.

Usage:
  python finetune_coco_masks.py --data_dir /path/coco --img_dir train2017 \
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
        # Frozen detector: only the mask head ("nlayers" group) trains.
        train_backbone=False, train_transformers=False, train_nlayers=True,
        batch_size=8, target_batch=32,
    ).update_from_args(args)

    train_dt, class_names = load_coco_dataset(
        config, config.batch_size, augmentation=True, include_masks=True
    )
    valid_dt, _ = load_coco_dataset(
        config, config.batch_size, augmentation=False, shuffle=False,
        include_masks=True,
    )
    config = config.replace(background_class=train_dt.background_class)

    model = get_detr_model(config, include_top=True, weights="detr", masks=True)
    mesh = make_mesh(config.data_parallel) if config.data_parallel > 1 else None
    trainer = Trainer(model.module, model.variables, config, mesh=mesh)

    for epoch in range(25):
        eval_loop(trainer, valid_dt, config, class_names, evaluation_step=200)
        fit(trainer, train_dt, config, epoch, class_names)
        if config.checkpoint_dir:
            save_checkpoint(trainer.state, config.checkpoint_dir)
