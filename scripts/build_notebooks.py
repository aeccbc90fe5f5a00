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


# ---------------------------------------------------------------------------
# 5. Scaling tutorial: DP / TP / PP / 1F1B on a simulated 8-device mesh
# ---------------------------------------------------------------------------

SCALING = [
    md("""\
# Scaling DETR: data, tensor, and pipeline parallelism

Every scaling axis in the framework runs through `jax.sharding` over a
device `Mesh` — no communication framework, no per-axis code paths.
This notebook demos all of them on a **simulated 8-device CPU mesh**
(the same mechanism the test suite and the multi-chip dryrun use), so
it runs anywhere; on a real TPU slice the identical code scales over
ICI.

| axis | mechanism | demo below |
|---|---|---|
| data | batch sharding + GSPMD grad psum | Trainer on a 1-D mesh |
| model (TP) | Megatron column/row shardings | `shard_params` |
| stage (PP) | GPipe `shard_map`/`ppermute` schedule | `PipelineSpec` |
| stage (1F1B) | explicit-VJP interleaved schedule | `detr_1f1b_value_and_grad` |

See `docs/parallelism.md` for the full guide (multi-host, elastic
recovery, memory bounds)."""),
    code("""\
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass  # backend already initialized (e.g. inside the test suite)
sys.path.insert(0, os.path.abspath(".."))
import numpy as np
import jax.numpy as jnp

assert jax.device_count() >= 8, jax.devices()
print("devices:", jax.device_count())"""),
    code("""\
from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.parallel import make_mesh
from detr_tensorflow_tpu.train import Trainer, TrainingConfig

KW = dict(num_classes=8, num_queries=6, model_dim=16, num_heads=2,
          num_encoder_layers=4, num_decoder_layers=1,
          dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
          dropout=0.0)
CONFIG = TrainingConfig(background_class=7, train_backbone=True,
                        train_transformers=True, train_nlayers=True,
                        batch_size=8, target_batch=8,
                        transformers_lr=1e-3)

rng = np.random.default_rng(0)
BATCH = {
    "images": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
    "boxes": np.clip(rng.uniform(0.2, 0.8, (8, 6, 4)), 0.05, 0.95)
        .astype(np.float32),
    "classes": np.ones((8, 6), np.int32),
    "mask": np.tile([True, True, False, False, False, False], (8, 1)),
}

def init(model):
    return jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))"""),
    md("""\
## Data parallelism

A 1-D mesh over all devices; the batch shards over `data`, state is
replicated, and GSPMD inserts the gradient all-reduce. The Trainer is
unchanged — DP is a mesh argument. (Gradients are *exactly* those of
the unsharded big batch — asserted in `tests/test_engine.py`.)"""),
    code("""\
mesh = make_mesh(8)                 # ("data",) over all 8 devices
model = DETR(**KW)
trainer = Trainer(model, init(model), CONFIG, mesh=mesh)
for i in range(3):
    log = trainer.step(BATCH)
    print(f"dp step {i}: total_loss={float(log['total_loss']):.4f}")"""),
    md("""\
## Tensor parallelism (Megatron splits)

On a mesh with a `model` axis, attention heads and the FFN shard
column/row-wise purely via parameter sharding annotations
(`parallel/tp.py`); GSPMD inserts one all-reduce per block. The
Trainer TP-shards its state whenever the mesh carries a `model`
axis."""),
    code("""\
mesh_tp = make_mesh(8, axis_names=("data", "model"), axis_sizes=(2, 4))
model = DETR(**KW)
trainer = Trainer(model, init(model), CONFIG, mesh=mesh_tp)
for i in range(2):
    log = trainer.step(BATCH)
    print(f"dp x tp step {i}: total_loss={float(log['total_loss']):.4f}")

w = trainer.state.params["transformer"]["encoder_layer_0"]["linear1"]["kernel"]
print("linear1 kernel sharding:", w.sharding.spec)"""),
    md("""\
## Pipeline parallelism (GPipe, a model flag)

`DETR(pipeline=PipelineSpec(mesh, data_axis="data"))` pipelines the
encoder stack over the mesh's `stage` axis — one SPMD `lax.scan`,
activations rotated between neighbour stages with `ppermute`. The
parameter tree is identical to the sequential model, so checkpoints
interchange; forward and gradients are equal to the sequential model
(`tests/test_pipeline_parallel.py`)."""),
    code("""\
from detr_tensorflow_tpu.parallel import PipelineSpec

mesh_pp = make_mesh(8, axis_names=("data", "stage"), axis_sizes=(2, 4))
model = DETR(**KW, pipeline=PipelineSpec(mesh=mesh_pp, data_axis="data"))
trainer = Trainer(model, init(DETR(**KW)), CONFIG, mesh=mesh_pp)
for i in range(2):
    log = trainer.step(BATCH)
    print(f"dp x pp step {i}: total_loss={float(log['total_loss']):.4f}")"""),
    md("""\
## 1F1B: depth-bounded memory

GPipe+AD holds O(n_micro) live residuals; the 1F1B schedule
(`pipeline_train_1f1b`) interleaves each microbatch's backward as soon
as the last stage has scored it — live memory is bounded by pipeline
*depth* (proven with XLA's own memory accounting, see
`docs/parallelism.md`). The DETR integration returns a standard
params-shaped gradient tree whose every leaf equals
`jax.value_and_grad` of the sequential model — plug into any optax
optimizer:"""),
    code("""\
import optax
from detr_tensorflow_tpu.ops.losses import detr_loss
from detr_tensorflow_tpu.parallel import detr_1f1b_value_and_grad

model = DETR(**KW)
variables = init(model)
batch = {k: jnp.asarray(v) for k, v in BATCH.items()}

loss, grads = jax.jit(
    lambda v, b: detr_1f1b_value_and_grad(
        model, v, b, mesh_pp, background_class=7, data_axis="data")
)(variables, batch)

def seq_loss(p):
    out = model.apply({"params": p, "frozen": variables["frozen"]},
                      batch["images"])
    return detr_loss(out, batch["boxes"], batch["classes"],
                     batch["mask"], 7)[0]

loss_seq, g_seq = jax.value_and_grad(seq_loss)(variables["params"])
print(f"1f1b loss {float(loss):.6f}  sequential {float(loss_seq):.6f}")

err = max(float(jnp.abs(a - b).max()) for a, b in
          zip(jax.tree.leaves(grads), jax.tree.leaves(g_seq)))
print("max grad |1f1b - sequential|:", err)

opt = optax.adam(1e-4)
updates, _ = opt.update(grads, opt.init(variables["params"]),
                        variables["params"])
print("optax update OK:",
      len(jax.tree.leaves(optax.apply_updates(variables["params"],
                                              updates))), "leaves")"""),
    md("""\
## Beyond one process

* **Multi-host**: one process per host, one global mesh —
  `parallel/multihost.py` (`initialize`, `process_shard`,
  `global_batch`); verified with two real OS processes in
  `tests/test_multihost.py`.
* **Elastic recovery**: `scripts/elastic_launch.py` relaunches the
  survivors from the latest checkpoint when a worker dies
  (`tests/test_elastic.py` kills one mid-run).
* **Performance**: trace-backed rooflines and the measured-kernel
  verdicts live in `docs/performance.md`."""),
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
        "scaling_tutorial.ipynb": SCALING,
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
