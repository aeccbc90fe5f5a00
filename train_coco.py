"""Train DETR from scratch on COCO.

Workflow parity with the reference ``train_coco.py``: fresh model,
backbone + transformers trained (reference :57-58), one eval pass then
one training epoch per outer iteration, 100 epochs (reference :64-66).
The reference uses the TF-keras ImageNet backbone for from-scratch runs
(``tf_backbone=True``, :39) which flips the normalization method; the
architecture here is identical (ImageNet weights aren't downloadable in
this egress-free environment — pass --backbone_weights to load a local
converted checkpoint).

Usage:
  python train_coco.py --data_dir /path/coco --img_dir train2017 \
      --ann_file annotations/instances_train2017.json \
      --batch_size 8 --target_batch 32 --train_backbone --train_transformers
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
        train_backbone=True,
        train_transformers=True,
        batch_size=8,
        target_batch=32,
    ).update_from_args(args)

    # Peek at the class count, then build the model BEFORE the loaders so
    # they capture the config with the model's normalization method (the
    # reference builds the model first for the same reason, detr.py:147).
    # With --backbone_weights (torchvision ImageNet init) the input
    # normalization is the torch scheme; tf_backbone only makes sense for
    # a caffe-normalized TF-pretrained backbone.
    from detr_tensorflow_tpu.data.coco_api import CocoIndex

    coco_index = CocoIndex(config.data.full_ann_file)
    n_class = max(coco_index.getCatIds()) + 2
    model = get_detr_model(config, include_top=False, nb_class=n_class,
                           tf_backbone=config.backbone_weights is None)
    config = config.replace(normalized_method=model.normalized_method,
                            train_nlayers=True)

    train_dt, class_names = load_coco_dataset(config, config.batch_size,
                                              augmentation=True)
    valid_dt, _ = load_coco_dataset(config, config.batch_size,
                                    augmentation=False, shuffle=False)
    config = config.replace(background_class=train_dt.background_class)

    mesh = make_mesh(config.data_parallel) if config.data_parallel > 1 else None
    trainer = Trainer(model.module, model.variables, config, mesh=mesh)

    for epoch in range(100):
        eval_loop(trainer, valid_dt, config, class_names, evaluation_step=200)
        fit(trainer, train_dt, config, epoch, class_names)
        if config.checkpoint_dir:
            save_checkpoint(trainer.state, config.checkpoint_dir)
