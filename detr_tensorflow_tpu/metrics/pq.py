"""Panoptic Quality (PQ) metric.

Completes the segmentation metric story around the panoptic-style merge
(`inference.merge_instance_masks`): PQ = SQ x RQ over segment matches,
the standard panoptic benchmark number (Kirillov et al.; the DETR paper
reports PQ 43.4 for the R50 panoptic model). The reference repo has no
segmentation at all — its evaluator feeds a zero mask placeholder
(reference eval.py:54) — so this metric, like the whole mask subsystem,
is capability beyond parity.

Matching uses the PQ theorem: segments of the same class with
IoU > 0.5 form a unique matching, so a greedy overlap scan is exact.
Host-side numpy, like metrics/ap.py — this runs once per evaluation,
not in the hot path.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def _segments_from_map(seg_map: np.ndarray, labels: np.ndarray):
    """(H, W) id-map (-1 = unassigned) + per-id class -> list of
    (class, bool-mask). Empty ids are skipped."""
    out = []
    for sid in np.unique(seg_map):
        if sid < 0:
            continue
        mask = seg_map == sid
        out.append((int(labels[sid]), mask))
    return out


def panoptic_quality(
    pred_seg_maps: Sequence[np.ndarray],   # per image: (H, W) int, -1=void
    pred_labels: Sequence[np.ndarray],     # per image: (Q,) class per id
    gt_masks: Sequence[np.ndarray],        # per image: (N, H, W) bool
    gt_classes: Sequence[np.ndarray],      # per image: (N,) int
) -> Dict[str, object]:
    """Dataset PQ/SQ/RQ, class-averaged (and per class).

    Returns ``{"pq", "sq", "rq", "n_classes", "per_class":
    {cls: {"pq", "sq", "rq", "tp", "fp", "fn"}}}``. Classes absent from
    both prediction and ground truth contribute nothing (standard
    protocol). Ground-truth segments with empty masks are ignored.
    """
    iou_sum: Dict[int, float] = {}
    tp: Dict[int, int] = {}
    fp: Dict[int, int] = {}
    fn: Dict[int, int] = {}

    def bump(d, c, v=1):
        d[c] = d.get(c, 0) + v

    for seg_map, labels, gmasks, gclasses in zip(
        pred_seg_maps, pred_labels, gt_masks, gt_classes
    ):
        seg_map = np.asarray(seg_map)
        preds = _segments_from_map(seg_map, np.asarray(labels))
        gts: List = [
            (int(c), np.asarray(m).astype(bool))
            for c, m in zip(np.asarray(gclasses), np.asarray(gmasks))
            if np.asarray(m).any()
        ]
        matched_pred = set()
        matched_gt = set()
        for gi, (gc, gm) in enumerate(gts):
            g_area = gm.sum()
            for pi, (pc, pm) in enumerate(preds):
                if pc != gc or pi in matched_pred:
                    continue
                inter = np.logical_and(gm, pm).sum()
                if inter == 0:
                    continue
                union = g_area + pm.sum() - inter
                iou = inter / union
                if iou > 0.5:
                    # IoU > 0.5 matches are provably unique per segment.
                    matched_pred.add(pi)
                    matched_gt.add(gi)
                    bump(tp, gc)
                    bump(iou_sum, gc, float(iou))
                    break
        for gi, (gc, _) in enumerate(gts):
            if gi not in matched_gt:
                bump(fn, gc)
        for pi, (pc, _) in enumerate(preds):
            if pi not in matched_pred:
                bump(fp, pc)

    per_class = {}
    classes = sorted(set(tp) | set(fp) | set(fn))
    for c in classes:
        t, f_p, f_n = tp.get(c, 0), fp.get(c, 0), fn.get(c, 0)
        denom = t + 0.5 * f_p + 0.5 * f_n
        sq = iou_sum.get(c, 0.0) / t if t else 0.0
        rq = t / denom if denom else 0.0
        per_class[c] = {
            "pq": sq * rq, "sq": sq, "rq": rq, "tp": t, "fp": f_p, "fn": f_n,
        }
    n = len(per_class)
    agg = lambda k: (  # noqa: E731
        sum(v[k] for v in per_class.values()) / n if n else 0.0
    )
    return {
        "pq": agg("pq"), "sq": agg("sq"), "rq": agg("rq"),
        "n_classes": n, "per_class": per_class,
    }


def panoptic_quality_from_outputs(
    m_outputs,
    gt_masks: Sequence[np.ndarray],
    gt_classes: Sequence[np.ndarray],
    background_class: int,
    mask_threshold: float = 0.5,
) -> Dict[str, object]:
    """PQ straight from model outputs: runs the panoptic pixel-argmax
    merge (inference.merge_instance_masks) and scores against ground
    truth. ``gt_masks`` must be at the model's mask resolution (use
    ops/masks utilities to rasterize/resize)."""
    import jax.numpy as jnp

    from ..inference import merge_instance_masks

    seg_map, _ = merge_instance_masks(
        m_outputs, background_class, mask_threshold
    )
    logits = np.asarray(m_outputs["pred_logits"])
    labels = logits.argmax(-1)  # (B, Q)
    seg_map = np.asarray(jnp.asarray(seg_map))
    return panoptic_quality(
        [seg_map[i] for i in range(seg_map.shape[0])],
        [labels[i] for i in range(labels.shape[0])],
        gt_masks,
        gt_classes,
    )
