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

With ``--panoptic_ann panoptic_train2017.json`` training targets come
from the panoptic annotations instead — every segment, STUFF included,
becomes a (box, class, mask) target (the DETR-panoptic recipe); size
the head past the stuff ids (e.g. ``--nb_class``/num_classes >= 201
for COCO panoptic).
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
    parser = training_config_parser()
    parser.add_argument(
        "--panoptic_ann", default=None,
        help="COCO panoptic_*.json: train on things+stuff segments "
             "(data/panoptic.py loader) instead of instance masks.",
    )
    parser.add_argument("--panoptic_png_dir", default=None)
    args = parser.parse_args()
    config = TrainingConfig(
        # Frozen detector: only the mask head ("nlayers" group) trains.
        train_backbone=False, train_transformers=False, train_nlayers=True,
        batch_size=8, target_batch=32,
    ).update_from_args(args)

    if args.panoptic_ann:
        from detr_tensorflow_tpu.data.panoptic import (
            load_coco_panoptic_train,
        )

        train_dt, class_names = load_coco_panoptic_train(
            config, config.batch_size, ann_file=args.panoptic_ann,
            png_dir=args.panoptic_png_dir,
        )
        valid_dt = None  # panoptic metrics: eval.py --pq --panoptic_ann
    else:
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
        if valid_dt is not None:
            eval_loop(trainer, valid_dt, config, class_names,
                      evaluation_step=200)
        fit(trainer, train_dt, config, epoch, class_names)
        if config.checkpoint_dir:
            save_checkpoint(trainer.state, config.checkpoint_dir)
