"""Three-group optimizer with per-tensor clipnorm, runtime LRs, and
gradient accumulation.

Reference semantics being reproduced (detr_tf/optimizers.py):
  * three Adam optimizers over backbone / transformers / nlayers variable
    groups (optimizers.py:67-107). The reference's group partition —
    derived from Keras layer introspection (optimizers.py:10-43) — puts
    the backbone, input_proj and query_embed in the "backbone" group,
    the transformer plus pretrained heads in "transformers", and fresh
    finetuning heads in "nlayers"; we reproduce that by parameter path;
  * per-tensor gradient-norm clipping (Keras ``clipnorm``) at 0.1
    applied before Adam (optimizers.py:86-88);
  * virtual batching: gradients accumulated ``target_batch//batch_size``
    steps then applied (optimizers.py:137-163) — here via
    ``optax.MultiSteps``, composed naturally with data parallelism;
  * learning rates adjustable at runtime without retracing
    (training_config.py:64-68) — Adam runs with lr=1 and the jitted step
    scales each group's update by ``-lr[group]`` passed as a runtime
    array.

Disabled groups (``train_backbone=False`` etc.) receive
``optax.set_to_zero`` exactly like the reference's skipped
``apply_gradients`` (optimizers.py:148): no update, no moment drift.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

GROUPS = ("backbone", "transformers", "nlayers")

# Top-level parameter collections in the "backbone" group (see module
# docstring; matches reference optimizers.py:29-41 which excludes only the
# transformer from the detr submodel).
_BACKBONE_TOPLEVEL = {"backbone", "input_proj", "query_embed"}
# Fresh heads: finetuning class/box heads, plus the segmentation head
# (trained with the detector frozen per the DETR panoptic recipe — run
# with train_nlayers only).
_NLAYERS_TOPLEVEL = {"cls_layer", "pos_layer", "mask_head", "bbox_attention"}


def param_labels(params: Dict[str, Any]) -> Dict[str, Any]:
    """Label every parameter leaf with its optimizer group."""

    def label_for(top: str) -> str:
        if top in _BACKBONE_TOPLEVEL:
            return "backbone"
        if top in _NLAYERS_TOPLEVEL:
            return "nlayers"
        return "transformers"

    return {
        top: jax.tree.map(lambda _: label_for(top), sub)
        for top, sub in params.items()
    }


def clip_by_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """Per-tensor L2-norm clipping — Keras ``clipnorm`` semantics (each
    gradient tensor clipped by its own norm), unlike optax's global clip."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(config, params: Dict[str, Any]) -> optax.GradientTransformation:
    """Build the composite transform. Emitted updates are **pre-LR**
    ascent directions (Adam with lr=1); callers scale by ``-lr`` per
    group via ``scale_updates_by_lr``."""

    enabled = {
        "backbone": config.train_backbone,
        "transformers": config.train_transformers,
        "nlayers": config.train_nlayers,
    }

    def group_transform(name: str) -> optax.GradientTransformation:
        if not enabled[name]:
            return optax.set_to_zero()
        return optax.chain(
            clip_by_leaf_norm(config.gradient_norm_clipping),
            optax.scale_by_adam(),
        )

    tx = optax.multi_transform(
        {g: group_transform(g) for g in GROUPS}, param_labels(params)
    )
    k = config.gradient_aggregate
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx


def scale_updates_by_lr(
    updates: Dict[str, Any], lrs: Dict[str, jnp.ndarray]
) -> Dict[str, Any]:
    """Apply ``-lr[group]`` to each update leaf (runtime, retrace-free)."""

    def scale_top(top: str, sub):
        if top in _BACKBONE_TOPLEVEL:
            lr = lrs["backbone"]
        elif top in _NLAYERS_TOPLEVEL:
            lr = lrs["nlayers"]
        else:
            lr = lrs["transformers"]
        return jax.tree.map(lambda u: -lr * u, sub)

    return {top: scale_top(top, sub) for top, sub in updates.items()}


def lr_dict(config) -> Dict[str, jnp.ndarray]:
    return {
        "backbone": jnp.asarray(config.backbone_lr, jnp.float32),
        "transformers": jnp.asarray(config.transformers_lr, jnp.float32),
        "nlayers": jnp.asarray(config.nlayers_lr, jnp.float32),
    }
