"""DETR set loss, fully vectorized and on-device.

Replicates the semantics of the reference's ``detr_tf/loss/loss.py``:
  * weighted softmax CE over all queries, weight 0.1 for unmatched
    (background) queries and 1.0 for matched ones, normalized by the sum
    of weights — DETR's ``eos_coef`` (loss.py:43-67);
  * L1 on xcycwh and GIoU on clipped xyxy over matched pairs, both
    normalized by the total number of matched pairs across the whole
    batch (loss.py:72-96 computes over a batch-flattened concat, so the
    normalizer is batch-global — we reproduce that exactly);
  * total = 1*CE + 2*GIoU + 5*L1 summed over the final decoder layer and
    every auxiliary decoder layer, each with its own Hungarian matching
    (loss.py:6-33);
  * metrics true_neg / true_pos / pos_accuracy (loss.py:53-61).

Unlike the reference there is no Python loop over the batch
(loss.py:115) and no host round trip for the matcher: matching is
``vmap``ed over (aux_layer, batch) and everything stays on the TPU.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import boxes
from .matcher import hungarian_match_batch

Array = jnp.ndarray

LOSS_WEIGHTS = {
    "label_cost": 1.0,
    "giou_loss": 2.0,
    "l1_loss": 5.0,
    # Instance-mask losses (the reference has no mask training at all —
    # its mask AP row is a zero placeholder). Coefficients follow the
    # DETR-paper panoptic recipe: focal 1.0, dice 1.0.
    "mask_loss": 1.0,
    "dice_loss": 1.0,
}


def _softmax_ce(logits: Array, labels: Array) -> Array:
    """Sparse softmax cross-entropy, elementwise over leading dims."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return lse - picked


def sigmoid_focal_loss(
    logits: Array, targets: Array, alpha: float = 0.25, gamma: float = 2.0
) -> Array:
    """Per-element sigmoid focal loss (RetinaNet form, as used by the
    DETR-paper mask head). ``targets`` in {0, 1}."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return alpha_t * loss


def optax_sigmoid_ce(logits: Array, labels: Array) -> Array:
    """Numerically-stable elementwise sigmoid cross-entropy."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def mask_losses(
    p_masks: Array,  # (B, Q, Hm, Wm) logits
    t_masks: Array,  # (B, T, Ht, Wt) binary target masks
    t_of_p: Array,  # (B, Q) matched target slot per query (or -1)
    matched: Array,  # (B, Q) bool
    n_matched: Array = None,  # external normalizer (microbatched callers)
) -> Dict[str, Array]:
    """Focal + dice losses over matched (query, target-mask) pairs.

    Target masks are resized on device to the prediction resolution
    (nearest), so the host pipeline can carry masks at any convenient
    scale. Normalized by the batch-global matched count, matching the
    box-loss normalization convention.
    """
    b, q, hm, wm = p_masks.shape
    t = t_masks.shape[1]
    t_masks = t_masks.astype(jnp.float32)
    if t_masks.shape[2:] != (hm, wm):
        t_masks = jax.image.resize(t_masks, (b, t, hm, wm), method="nearest")

    safe_idx = jnp.clip(t_of_p, 0, t - 1)
    gathered = jnp.take_along_axis(
        t_masks, safe_idx[..., None, None], axis=1
    )  # (B, Q, Hm, Wm)

    if n_matched is None:
        n_matched = jnp.sum(matched)
    n_matched = jnp.maximum(n_matched, 1)
    w = matched.astype(jnp.float32)  # (B, Q)

    focal = sigmoid_focal_loss(p_masks, gathered).mean(axis=(-2, -1))  # (B, Q)
    mask_loss = jnp.sum(focal * w) / n_matched

    probs = jax.nn.sigmoid(p_masks.astype(jnp.float32)).reshape(b, q, -1)
    flat_t = gathered.reshape(b, q, -1)
    num = 2.0 * jnp.sum(probs * flat_t, axis=-1)
    den = jnp.sum(probs, axis=-1) + jnp.sum(flat_t, axis=-1)
    dice = 1.0 - (num + 1.0) / (den + 1.0)  # (B, Q)
    dice_loss = jnp.sum(dice * w) / n_matched

    return {"mask_loss": mask_loss, "dice_loss": dice_loss}


def global_loss_normalizers(
    t_mask: Array, num_queries: int, eos_weight: float = 0.1
) -> Dict[str, Array]:
    """Batch-global loss normalizers, computed from the targets alone.

    The Hungarian matching always matches every valid target (queries
    outnumber targets), so ``n_matched == sum(t_mask)`` is known before
    any matching runs. A caller that scores the batch in pieces — the
    1F1B pipeline (parallel/pp.py), or gradient accumulation that must
    be bitwise-faithful to the big batch — computes these over the FULL
    batch and passes them as ``norm=`` to ``detr_loss`` /
    ``single_layer_loss`` on each piece: every term becomes
    sum(term)/global_denominator, so the sum over pieces equals the
    whole-batch loss exactly.
    """
    n = jnp.sum(t_mask)
    bq = t_mask.shape[0] * num_queries
    return {
        "n_matched": n,
        "n_unmatched": bq - n,
        "sum_weights": n + eos_weight * (bq - n),
    }


def single_layer_loss(
    p_logits: Array,
    p_boxes: Array,
    t_bbox: Array,
    t_class: Array,
    t_mask: Array,
    background_class: int,
    eos_weight: float = 0.1,
    p_masks: Array = None,
    t_masks: Array = None,
    match: Dict[str, Array] = None,
    lap_impl: str = "xla",
    norm: Dict[str, Array] = None,
) -> Dict[str, Array]:
    """Set loss for one decoder layer over a batch.

    Args:
      p_logits: (B, Q, C) class logits.
      p_boxes:  (B, Q, 4) predicted boxes, xcycwh in [0, 1].
      t_bbox:   (B, T, 4) padded target boxes, xcycwh.
      t_class:  (B, T) padded target class ids.
      t_mask:   (B, T) bool validity of target slots.
      background_class: id of the background ("no object") class.
      match: optional precomputed ``hungarian_match_batch`` result for
        this layer -- ``detr_loss`` batches the matching of every
        decoder layer into one solver call and passes the slices in.
      lap_impl: LAP solver used when ``match`` is None (see
        ``ops.matcher.solve_lap_masked_batch``).
      norm: optional external loss normalizers
        (``global_loss_normalizers``) replacing the batch-local sums —
        how a microbatched caller (1F1B pipeline, gradient
        accumulation with exactness requirements) reproduces the
        batch-GLOBAL normalization of the reference loss: each
        microbatch contributes sum(term)/global_denominator, so the
        sum over microbatches equals the whole-batch loss exactly.

    Returns dict of scalars: label_cost, giou_loss, l1_loss, true_neg,
    true_pos, pos_accuracy (names match reference loss.py:166-173).
    """
    if match is None:
        match = hungarian_match_batch(
            p_boxes, p_logits, t_bbox, t_class, t_mask, impl=lap_impl
        )
    t_of_p = match["target_of_pred"]  # (B, Q)
    matched = match["pred_matched"]  # (B, Q) bool

    safe_idx = jnp.clip(t_of_p, 0, t_bbox.shape[1] - 1)
    gathered_class = jnp.take_along_axis(t_class, safe_idx, axis=1)  # (B, Q)
    gathered_bbox = jnp.take_along_axis(
        t_bbox, safe_idx[..., None], axis=1
    )  # (B, Q, 4)

    # ---- classification (loss.py:37-70) ----
    targets = jnp.where(matched, gathered_class, background_class)
    ce = _softmax_ce(p_logits, targets)  # (B, Q)
    norm = norm or {}
    weights = jnp.where(matched, 1.0, eos_weight)
    sum_weights = norm.get("sum_weights")
    if sum_weights is None:
        sum_weights = jnp.sum(weights)
    label_cost = jnp.sum(ce * weights) / sum_weights

    pred_cls = jnp.argmax(p_logits, axis=-1)  # (B, Q)
    n_matched = norm.get("n_matched")
    if n_matched is None:
        n_matched = jnp.sum(matched)
    n_matched = jnp.maximum(n_matched, 1)
    n_unmatched = norm.get("n_unmatched")
    if n_unmatched is None:
        n_unmatched = jnp.sum(~matched)
    n_unmatched = jnp.maximum(n_unmatched, 1)
    true_neg = jnp.sum((pred_cls == background_class) & ~matched) / n_unmatched
    true_pos = jnp.sum((pred_cls != background_class) & matched) / n_matched
    pos_accuracy = jnp.sum((pred_cls == targets) & matched) / n_matched

    # ---- boxes (loss.py:72-96) ----
    l1_per = jnp.sum(jnp.abs(p_boxes - gathered_bbox), axis=-1)  # (B, Q)
    l1_loss = jnp.sum(jnp.where(matched, l1_per, 0.0)) / n_matched

    p_xy = boxes.xcycwh_to_xyxy(p_boxes, clip=True)
    t_xy = boxes.xcycwh_to_xyxy(gathered_bbox, clip=True)
    giou_per = boxes.elementwise_giou(p_xy, t_xy)  # (B, Q)
    giou_loss = jnp.sum(jnp.where(matched, 1.0 - giou_per, 0.0)) / n_matched

    out = {
        "label_cost": label_cost,
        "giou_loss": giou_loss,
        "l1_loss": l1_loss,
        "true_neg": true_neg,
        "true_pos": true_pos,
        "pos_accuracy": pos_accuracy,
    }
    if p_masks is not None and t_masks is not None:
        out.update(mask_losses(
            p_masks, t_masks, t_of_p, matched,
            n_matched=norm.get("n_matched"),
        ))
    return out


def total_from_log(log: Dict[str, Array]) -> Array:
    """Weighted sum over every loss entry whose name contains a known loss
    key, aux suffixes included — same substring rule as loss.py:6-19."""
    total = jnp.float32(0.0)
    for key, value in log.items():
        for loss_name, weight in LOSS_WEIGHTS.items():
            if loss_name in key:
                total = total + weight * value
    return total


def detr_loss(
    outputs: Dict[str, Array],
    t_bbox: Array,
    t_class: Array,
    t_mask: Array,
    background_class: int,
    t_masks: Array = None,
    lap_impl: str = "xla",
    norm: Dict[str, Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Full DETR training loss: final layer + auxiliary decoder layers.

    Args:
      outputs: dict with
        'pred_logits' (B, Q, C), 'pred_boxes' (B, Q, 4) and optionally
        'aux_logits' (A, B, Q, C), 'aux_boxes' (A, B, Q, 4) for the
        auxiliary decoder layers (reference builds these as a list of
        dicts, detr.py:195-202; we keep them stacked so one vmapped
        matching covers every layer).
      t_bbox / t_class / t_mask: padded targets as in single_layer_loss.
      background_class: id of the "no object" class.
      norm: optional ``global_loss_normalizers`` result — microbatched
        callers (the 1F1B pipeline) pass the GLOBAL batch's normalizers
        so the sum of per-microbatch losses equals the whole-batch loss
        exactly. The same normalizers apply to every decoder layer:
        the Hungarian matching matches every valid target in every
        layer, so n_matched is layer-independent.

    Returns (total_loss, log) where log carries the reference's key
    naming: plain names for the final layer, ``_i`` suffix per aux layer
    (loss.py:26-29).
    """
    has_aux = "aux_logits" in outputs and outputs["aux_logits"] is not None

    # One LAP solve for every decoder layer: stack final + aux into a
    # (A+1, B) problem batch so the solver — in particular the fused
    # Pallas kernel (lap_impl="pallas") — launches once per step.
    if has_aux:
        all_logits = jnp.concatenate(
            [outputs["pred_logits"][None], outputs["aux_logits"]], axis=0
        )
        all_boxes = jnp.concatenate(
            [outputs["pred_boxes"][None], outputs["aux_boxes"]], axis=0
        )
        n_layers = all_logits.shape[0]
        bcast = lambda x: jnp.broadcast_to(x, (n_layers,) + x.shape)
        match_all = hungarian_match_batch(
            all_boxes, all_logits, bcast(t_bbox), bcast(t_class),
            bcast(t_mask), impl=lap_impl,
        )
        match_final = {k: v[0] for k, v in match_all.items()}
    else:
        match_final = None

    log = single_layer_loss(
        outputs["pred_logits"], outputs["pred_boxes"], t_bbox, t_class, t_mask,
        background_class,
        # Mask losses apply to the final decoder layer only — the mask
        # head consumes hs[-1] (models/detr.py), like the DETR paper.
        p_masks=outputs.get("pred_masks"),
        t_masks=t_masks,
        match=match_final,
        lap_impl=lap_impl,
        norm=norm,
    )

    if has_aux:
        aux_fn = jax.vmap(
            lambda lg, bx, m: single_layer_loss(
                lg, bx, t_bbox, t_class, t_mask, background_class, match=m,
                norm=norm,
            )
        )
        aux_match = {k: v[1:] for k, v in match_all.items()}
        aux = aux_fn(outputs["aux_logits"], outputs["aux_boxes"], aux_match)
        n_aux = outputs["aux_logits"].shape[0]
        for a in range(n_aux):
            for key in ("label_cost", "giou_loss", "l1_loss", "true_neg",
                        "true_pos", "pos_accuracy"):
                log[f"{key}_{a}"] = aux[key][a]

    total = total_from_log(log)
    return total, log


# ---------------------------------------------------------------------------
# Reference-API compatibility shim
# ---------------------------------------------------------------------------


def get_losses(m_outputs, t_bbox, t_class, config):
    """Signature parity with reference ``get_losses`` (loss.py:22-35).

    Accepts the reference's padded-with-header target layout
    (processing.py:35-55): row 0 of ``t_bbox`` is ``[n, 0, 0, 0]`` and
    real targets follow. Internally converts to the mask layout.
    """
    from ..data.processing import unpack_labels

    boxes_, classes_, mask_ = unpack_labels(t_bbox, t_class)
    outputs = dict(m_outputs)
    if "aux" in outputs and isinstance(outputs["aux"], (list, tuple)):
        if outputs["aux"]:
            outputs["aux_logits"] = jnp.stack(
                [a["pred_logits"] for a in outputs["aux"]]
            )
            outputs["aux_boxes"] = jnp.stack(
                [a["pred_boxes"] for a in outputs["aux"]]
            )
        outputs.pop("aux")
    return detr_loss(
        outputs, boxes_, classes_, mask_, int(config.background_class)
    )
