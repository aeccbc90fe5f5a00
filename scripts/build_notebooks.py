"""Build the tutorial notebooks (notebooks/*.ipynb) from source.

Each notebook is a runnable, fully-offline walkthrough against the
synthetic COCO dataset (data/synthetic.py) — the reference's three
notebooks all require downloads; these run anywhere, in a couple of
minutes each on CPU. Execute with:

  python scripts/build_notebooks.py            # write .ipynb
  python scripts/build_notebooks.py --execute  # write + run in place
"""

import argparse
import os

import nbformat as nbf

ROOT = os.path.join(os.path.dirname(__file__), "..", "notebooks")

PREAMBLE = """\
import os, sys, tempfile
sys.path.insert(0, os.path.abspath(".."))  # repo root
import numpy as np
import jax, jax.numpy as jnp
import matplotlib.pyplot as plt

from detr_tensorflow_tpu.data import make_synthetic_coco, load_coco_dataset
from detr_tensorflow_tpu.models import build_detr
from detr_tensorflow_tpu.train import (
    DataConfig, Trainer, TrainingConfig, fit,
)

root = tempfile.mkdtemp(prefix="detr_tpu_nb_")
print("devices:", jax.devices())
"""


def nb(cells):
    book = nbf.v4.new_notebook()
    book["cells"] = [
        nbf.v4.new_markdown_cell(src) if kind == "md"
        else nbf.v4.new_code_cell(src)
        for kind, src in cells
    ]
    book["metadata"]["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python",
    }
    return book


def md(s):
    return ("md", s)


def code(s):
    return ("code", s)


# ---------------------------------------------------------------------------
# 1. Inference tutorial
# ---------------------------------------------------------------------------

INFERENCE = [
    md("""\
# Inference with detr-tensorflow-tpu

This tutorial walks the **serving path**: build a DETR, run the
bucketed `Predictor` on raw mixed-size images, and visualize the
detections — fully offline, against a synthetic dataset.

The TPU-native design difference from the reference
(`webcam_inference.py` / `eval.py`, which re-trace eagerly per image
shape): arbitrary image sizes are zero-padded up to **shape buckets**
with a pixel mask, so XLA compiles a *bounded* set of programs while
the results stay **mathematically exact** for the valid region (the
network is exactly padding-invariant under the mask — masked attention,
mask-aware sine positions, per-conv validity masking).

> With real COCO weights you would call
> `get_detr_model(config, include_top=True, weights="detr")` — the
> converter accepts both the facebook and HuggingFace checkpoint
> layouts (`models/weights.py`). This environment has no network, so we
> train a tiny DETR from scratch on synthetic data instead."""),
    code(PREAMBLE),
    md("""\
## A tiny model on a synthetic dataset

One bright rectangle per image; the box is the annotation. The model is
the full DETR architecture (ResNet backbone → sine positions →
encoder/decoder transformer → class + box heads) with shrunken dims so
a CPU can train it in under a minute."""),
    code("""\
make_synthetic_coco(root, n_images=8)
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

model = build_detr(
    num_classes=len(class_names), num_queries=8, head="detr",
    model_dim=64, num_heads=4, num_encoder_layers=2, num_decoder_layers=2,
    dim_feedforward=128, dropout=0.0,
    backbone_stage_sizes=(1, 1, 1, 1), image_size=config.image_size,
)
trainer = Trainer(model.module, model.variables, config)
for epoch in range(60):
    fit(trainer, train_dt, config, epoch, class_names,
        log_every=10 if epoch % 20 == 0 else 10**9)
model.variables = trainer.variables"""),
    md("""\
## Serving raw images with the `Predictor`

`Predictor` takes a list of **uint8 RGB images of any sizes**,
normalizes on device, groups same-bucket images into one batched XLA
call, and returns ragged per-image `Detection`s (boxes normalized to
each image's own frame). `warmup()` precompiles the bucket programs so
first-request latency is flat in production."""),
    code("""\
from detr_tensorflow_tpu.predictor import Predictor

predictor = Predictor(model, config.background_class, bucket_divisor=64,
                      score_threshold=0.5)
predictor.warmup([(128, 128), (100, 150)])

import cv2
frames = [
    cv2.cvtColor(cv2.imread(os.path.join(root, "images", f"img{i}.png")),
                 cv2.COLOR_BGR2RGB)
    for i in range(4)
]
frames.append(np.pad(frames[0], ((0, 10), (0, 30), (0, 0))))  # odd size
dets = predictor(frames)
for i, det in enumerate(dets):
    print(f"image {i} {frames[i].shape[:2]}: {len(det.boxes)} detections, "
          f"labels={det.labels.tolist()}")"""),
    md("""\
## Visualizing detections

`inference.numpy_bbox_to_image` draws rescaled boxes + class labels on
the (de-normalized) image — the same helper the webcam demo and the
training logger use."""),
    code("""\
from detr_tensorflow_tpu import inference

fig, axes = plt.subplots(1, 4, figsize=(16, 4))
for ax, frame, det in zip(axes, frames, dets):
    img = inference.numpy_bbox_to_image(
        frame, det.boxes, labels=det.labels, scores=det.scores,
        class_name=class_names,
    )
    ax.imshow(img); ax.axis("off")
plt.tight_layout(); plt.show()"""),
    md("""\
## Single-image API parity

`get_model_inference(outputs, background_class, bbox_format)` mirrors
the reference's call signature exactly (ragged numpy arrays for batch
element 0) if you are porting code over."""),
    code("""\
batch = next(iter(train_dt))
outputs, _ = trainer.evaluate(batch)
boxes, labels, scores = inference.get_model_inference(
    outputs, config.background_class, bbox_format="xy_center"
)
print("boxes:", boxes.shape, "labels:", labels.tolist())"""),
]


# ---------------------------------------------------------------------------
# 2. Finetuning tutorial
# ---------------------------------------------------------------------------

FINETUNING = [
    md("""\
# Finetuning DETR

The reference's finetuning recipe (`finetune_voc.py`): start from a
pretrained DETR **without its classification top**, attach fresh heads
for your classes, train the heads first at a high LR, then unfreeze the
transformer at a lower LR — all without retracing, because learning
rates are **runtime inputs** to the jitted train step.

Offline here, so "pretrained" is a from-scratch tiny model; with real
weights you'd pass `weights="detr"` to `get_detr_model` /
`build_detr`."""),
    code(PREAMBLE),
    code("""\
make_synthetic_coco(root, n_images=8)
config = TrainingConfig(
    data=DataConfig(data_dir=root, img_dir="images", ann_file="ann.json"),
    image_size=(128, 128), batch_size=4, target_batch=None,
    # heads-only first: backbone + transformer frozen
    train_backbone=False, train_transformers=False, train_nlayers=True,
    nlayers_lr=1e-2, num_queries=8,
)
train_dt, class_names = load_coco_dataset(
    config, config.batch_size, augmentation=True, num_workers=2
)
config = config.replace(background_class=train_dt.background_class)

# head="finetune": fresh Dense(nb_class) + box-MLP on every decoder
# layer (the reference's add_heads_nlayers); the trunk would carry
# pretrained weights in a real run.
model = build_detr(
    num_classes=len(class_names), nb_class=len(class_names),
    num_queries=8, head="finetune",
    model_dim=64, num_heads=4, num_encoder_layers=2, num_decoder_layers=2,
    dim_feedforward=128, dropout=0.0,
    backbone_stage_sizes=(1, 1, 1, 1), image_size=config.image_size,
)
trainer = Trainer(model.module, model.variables, config)"""),
    md("""\
## Stage 1 — heads only

`train_{backbone,transformers,nlayers}` build a three-group optimizer
(Adam + per-tensor clipnorm 0.1, like the reference); frozen groups get
zero updates. Watch the loss drop with only the heads learning:"""),
    code("""\
losses = []
for epoch in range(20):
    for batch in trainer.prefetch(train_dt):
        log = trainer.step(batch)
    losses.append(float(jax.device_get(log["total_loss"])))
print(f"heads-only: loss {losses[0]:.2f} -> {losses[-1]:.2f}")"""),
    md("""\
## Stage 2 — unfreeze the transformer

The reference flips `tf.Variable` LRs mid-run (`finetune_voc.py:90-96`);
here `set_trainable` rebuilds the optimizer groups (one retrace) and
`set_learning_rates` adjusts LRs with **no retrace at all**."""),
    code("""\
trainer.set_trainable(train_transformers=True, train_backbone=True)
trainer.set_learning_rates(transformers=1e-3, backbone=1e-3, nlayers=3e-3)
for epoch in range(40):
    for batch in trainer.prefetch(train_dt):
        log = trainer.step(batch)
    losses.append(float(jax.device_get(log["total_loss"])))
print(f"after unfreeze: {losses[-1]:.2f}")
plt.plot(losses); plt.xlabel("epoch"); plt.ylabel("total loss")
plt.axvline(20, color="r", ls="--", label="unfreeze"); plt.legend()
plt.show()"""),
    md("""\
## Checkpointing and resume

The reference never saves weights (SURVEY §5); here the full train
state (params + 3 optimizer states + step) checkpoints through Orbax,
and `restore_latest` resumes a crashed/preempted run. `fit(...,
checkpoint_every=N)` does this automatically, and a `PreemptionGuard`
turns SIGTERM into checkpoint-and-return on preemptible TPU VMs."""),
    code("""\
from detr_tensorflow_tpu.train.checkpoint import (
    save_checkpoint, restore_latest,
)

ckpt_dir = os.path.join(root, "ckpt")
save_checkpoint(trainer.state, ckpt_dir)
restored = restore_latest(trainer.state, ckpt_dir)
print("restored step:", int(restored.step), "== live:", int(trainer.state.step))"""),
    md("""\
## Scaling out

The same `Trainer` runs data-parallel by passing a mesh — the batch
shards over chips and XLA inserts the gradient all-reduce over ICI:

```python
from detr_tensorflow_tpu.parallel import make_mesh
trainer = Trainer(model.module, model.variables, config,
                  mesh=make_mesh())          # all visible chips
```

Tensor parallelism (`parallel/tp.py`), GPipe pipeline parallelism for
the encoder (`parallel/pp.py`, `DETR(pipeline=PipelineSpec(...))`) and
gradient accumulation (`target_batch=`) compose with it — see
`docs/parallelism.md`."""),
]


# ---------------------------------------------------------------------------
# 3. Evaluation tutorial
# ---------------------------------------------------------------------------

EVALUATION = [
    md("""\
# Evaluating DETR (COCO mAP)

The reference evaluates COCO val2017 at **original image size**, batch
1, eagerly re-tracing per shape (`eval.py:41-58`), and reports the
published AP table (box AP 36.53). This walkthrough reproduces the
whole protocol offline on synthetic data:

* bucket-padded static shapes (bounded compile count, exact numbers);
* the vectorized greedy AP evaluator (same 101-point protocol as the
  reference's `compute_map.py`);
* the `--paper_protocol` resize (shortest-side 800 / max 1333) behind
  the paper's AP 42.0 exists as a flag on the real `eval.py`."""),
    code(PREAMBLE),
    code("""\
make_synthetic_coco(root, n_images=8)
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
model = build_detr(
    num_classes=len(class_names), num_queries=8, head="detr",
    model_dim=64, num_heads=4, num_encoder_layers=2, num_decoder_layers=2,
    dim_feedforward=128, dropout=0.0,
    backbone_stage_sizes=(1, 1, 1, 1), image_size=config.image_size,
)
trainer = Trainer(model.module, model.variables, config)
for epoch in range(60):
    fit(trainer, train_dt, config, epoch, class_names, log_every=10**9)
model.variables = trainer.variables
print("trained", int(trainer.state.step), "steps")"""),
    md("""\
## The evaluation loop

`eval.eval_model` is the real CLI's engine: original-size images
bucket-padded with a pixel mask, one fused XLA program per bucket
(forward + postprocess), host-side AP bookkeeping. GT stays in the
original frame — the padded+mask forward is exactly padding-invariant,
so predictions are normalized to the valid frame and no rescale is
needed."""),
    code("""\
import importlib
eval_mod = importlib.import_module("eval")

valid_dt, _ = load_coco_dataset(
    config, 1, augmentation=None, bucket_divisor=64, shuffle=False,
    num_workers=2,
)
table = eval_mod.eval_model(model, config, class_names, valid_dt)
print("box AP (all IoUs):", round(table["box"]["all"], 2))"""),
    md("""\
## What the table means

Rows mirror the reference's ASCII table: `box` / `mask` AP averaged
over classes, per IoU threshold .50:.05:.95 plus the `all` average.
The `mask` row is **real** when the model carries the segmentation head
(see the segmentation tutorial) — in the reference it is a hardwired
zero.

On real COCO:

```bash
python eval.py --data_dir /data/coco --img_dir val2017 \\
    --ann_file annotations/instances_val2017.json          # AP 36.53 protocol
python eval.py ... --paper_protocol                        # AP 42.0 protocol
python eval.py ... --masks --pq                            # + mask AP and PQ
python eval.py ... --masks --pq --panoptic_ann panoptic_val2017.json
#   ^ published COCO panoptic PQ protocol (things+stuff, crowd, void)
```

`--exact_shapes` compiles per exact image shape instead (the
reference's behavior) — same numbers, more compiles; the default
buckets by 128."""),
    code("""\
# The evaluator is a plain library object too:
from detr_tensorflow_tpu.metrics import MeanAPEvaluator

ev = MeanAPEvaluator(num_classes=3, class_names=["N/A", "white", "red"])
ev.add_image(
    p_boxes=np.asarray([[0.1, 0.1, 0.5, 0.5]]), p_labels=np.asarray([1]),
    p_scores=np.asarray([0.9]),
    t_boxes=np.asarray([[0.1, 0.1, 0.5, 0.5]]), t_labels=np.asarray([1]),
)
t = ev.compute()
print("perfect overlap -> AP@.50:", t["box"][50])"""),
]


# ---------------------------------------------------------------------------
# 4. Segmentation tutorial
# ---------------------------------------------------------------------------

SEGMENTATION = [
    md("""\
# Instance segmentation & panoptic quality

The reference has **no segmentation** — its mask AP row is a zero
placeholder (`eval.py:54`). This framework implements the DETR-paper
panoptic mask head end to end: per-query attention maps over the
encoder memory fused with FPN features, a GroupNorm conv trunk, one
stride-4 mask logit map per query — weight-compatible with the public
panoptic checkpoints.

This tutorial trains the head on synthetic data (rectangles double as
instance masks), visualizes predictions, and scores **COCO-protocol
mask AP** (IoU at original image resolution) plus **PQ**."""),
    code(PREAMBLE),
    code("""\
make_synthetic_coco(root, n_images=8, masks=True)
config = TrainingConfig(
    data=DataConfig(data_dir=root, img_dir="images", ann_file="ann.json"),
    image_size=(128, 128), batch_size=4, target_batch=None,
    train_backbone=True, train_transformers=True, train_nlayers=True,
    backbone_lr=3e-3, transformers_lr=3e-3, nlayers_lr=3e-3,
    num_queries=8,
)
train_dt, class_names = load_coco_dataset(
    config, config.batch_size, augmentation=False, num_workers=2,
    include_masks=True,            # <- rasterized GT masks ride along
)
config = config.replace(background_class=train_dt.background_class)

model = build_detr(
    num_classes=len(class_names), num_queries=8, head="detr",
    masks=True,                    # <- attention-map + FPN mask head
    model_dim=64, num_heads=4, num_encoder_layers=2, num_decoder_layers=2,
    dim_feedforward=128, dropout=0.0,
    backbone_stage_sizes=(1, 1, 1, 1), image_size=config.image_size,
)
trainer = Trainer(model.module, model.variables, config)
batch = next(iter(train_dt))
print("t_masks:", batch["t_masks"].shape, "(stride-4 lattice)")"""),
    md("""\
## Training with mask losses

With `t_masks` in the batch the set loss adds the DETR-paper terms:
**sigmoid focal** + **DICE** on the matched (query, target) pairs —
targets live on the head's stride-4 output lattice so the loss does no
resampling. Watch `mask_loss`/`dice_loss` fall alongside the box
terms:"""),
    code("""\
hist = {"total_loss": [], "mask_loss": [], "dice_loss": []}
for epoch in range(60):
    for batch in trainer.prefetch(train_dt):
        log = trainer.step(batch)
    got = jax.device_get(log)
    for k in hist:
        hist[k].append(float(got[k]))
for k, v in hist.items():
    print(f"{k}: {v[0]:.3f} -> {v[-1]:.3f}")
plt.plot(hist["mask_loss"], label="focal"); plt.plot(hist["dice_loss"], label="dice")
plt.xlabel("epoch"); plt.legend(); plt.show()
model.variables = trainer.variables"""),
    md("""\
## Visualizing instance masks

`postprocess_masks` thresholds the sigmoid logits (optionally
upsampled); `numpy_masks_to_image` alpha-blends them. The `Predictor`
serves the same thing in production (`Predictor(..., masks=True)`
returns per-detection full-resolution masks)."""),
    code("""\
from detr_tensorflow_tpu import inference

batch = next(iter(train_dt))
outputs, _ = trainer.evaluate(batch)
boxes, labels, scores, keep = inference.postprocess(
    outputs, config.background_class
)
masks = inference.postprocess_masks(outputs, out_size=(128, 128))
k0 = np.asarray(keep[0])
img = inference.numpy_masks_to_image(
    np.asarray(batch["images"][0]), np.asarray(masks[0])[k0],
    labels=np.asarray(labels[0])[k0], config=config,
)
plt.imshow(img); plt.axis("off"); plt.show()"""),
    md("""\
## COCO-protocol mask AP and PQ

Mask IoU is defined at **original image resolution**: the eval path
crops the valid stride-4 cells, bilinearly upsamples the probabilities
to the image frame (torch `F.interpolate` semantics) and scores
against full-resolution GT. `--pq` adds Panoptic Quality over the
pixel-argmax merge; with a `panoptic_*.json` it implements the full
Kirillov protocol (stuff classes, crowd, void)."""),
    code("""\
import importlib
eval_mod = importlib.import_module("eval")

valid_dt, _ = load_coco_dataset(
    config, 1, augmentation=None, bucket_divisor=64, shuffle=False,
    num_workers=2, include_masks=True, full_res_masks=True,
)
table = eval_mod.eval_model(
    model, config, class_names, valid_dt, report_pq=True
)
print("box AP:", round(table["box"]["all"], 2),
      "| mask AP:", round(table["mask"]["all"], 2),
      "| PQ:", round(100 * table["pq"]["pq"], 2))"""),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--execute", action="store_true")
    parser.add_argument("--only", default=None)
    args = parser.parse_args()

    books = {
        "inference_tutorial.ipynb": INFERENCE,
        "finetuning_tutorial.ipynb": FINETUNING,
        "evaluation_tutorial.ipynb": EVALUATION,
        "segmentation_tutorial.ipynb": SEGMENTATION,
    }
    os.makedirs(ROOT, exist_ok=True)
    for name, cells in books.items():
        if args.only and args.only not in name:
            continue
        path = os.path.join(ROOT, name)
        nbf.write(nb(cells), path)
        print("wrote", path)
        if args.execute:
            from nbclient import NotebookClient

            book = nbf.read(path, as_version=4)
            client = NotebookClient(
                book, timeout=1200, resources={"metadata": {"path": ROOT}},
            )
            client.execute()
            nbf.write(book, path)
            print("executed", path)


if __name__ == "__main__":
    main()
