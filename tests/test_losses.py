"""Set loss vs a host-side numpy replication of the reference formulas
(detr_tf/loss/loss.py:37-96 semantics with scipy matching)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from detr_tensorflow_tpu.ops import boxes, losses

BACKGROUND = 91


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _np_giou_elem(a_xy, b_xy):
    inter_min = np.maximum(a_xy[:, :2], b_xy[:, :2])
    inter_max = np.minimum(a_xy[:, 2:], b_xy[:, 2:])
    wh = np.clip(inter_max - inter_min, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (a_xy[:, 2] - a_xy[:, 0]) * (a_xy[:, 3] - a_xy[:, 1])
    area_b = (b_xy[:, 2] - b_xy[:, 0]) * (b_xy[:, 3] - b_xy[:, 1])
    union = area_a + area_b - inter
    iou = inter / union
    enc_min = np.minimum(a_xy[:, :2], b_xy[:, :2])
    enc_max = np.maximum(a_xy[:, 2:], b_xy[:, 2:])
    ewh = np.clip(enc_max - enc_min, 0, None)
    enclose = ewh[:, 0] * ewh[:, 1]
    return iou - (enclose - union) / enclose


def _reference_loss(p_logits, p_boxes, t_bbox, t_class, t_counts):
    """Numpy replication of the reference single-layer loss over a batch."""
    B, Q, _ = p_logits.shape
    all_w, all_ce = [], []
    l1_sum, giou_sum, n_matched = 0.0, 0.0, 0
    tn_num = tn_den = tp_num = tp_den = acc_num = 0
    for b in range(B):
        n = t_counts[b]
        tb, tc = t_bbox[b, :n], t_class[b, :n]
        prob = _np_softmax(p_logits[b])
        c_class = -prob[:, tc]
        l1 = np.abs(p_boxes[b][:, None] - tb[None]).sum(-1)
        p_xy = np.clip(boxes.np_xcycwh_to_xyxy(p_boxes[b]), 0, 1)
        t_xy = np.clip(boxes.np_xcycwh_to_xyxy(tb), 0, 1)
        g = np.asarray(boxes.giou(jnp.asarray(p_xy), jnp.asarray(t_xy)))
        cost = 5 * l1 + c_class - 2 * g
        rows, cols = linear_sum_assignment(cost)

        matched = np.zeros(Q, bool)
        matched[rows] = True
        targets = np.full(Q, BACKGROUND)
        targets[rows] = tc[cols]
        logits = p_logits[b]
        lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
        ce = lse - logits[np.arange(Q), targets]
        w = np.where(matched, 1.0, 0.1)
        all_w.append(w)
        all_ce.append(ce)

        pb = p_boxes[b][rows]
        tb_m = tb[cols]
        l1_sum += np.abs(pb - tb_m).sum()
        giou_sum += (1 - _np_giou_elem(np.clip(boxes.np_xcycwh_to_xyxy(pb), 0, 1),
                                       np.clip(boxes.np_xcycwh_to_xyxy(tb_m), 0, 1))).sum()
        n_matched += len(rows)

        pred_cls = logits.argmax(-1)
        tn_num += ((pred_cls == BACKGROUND) & ~matched).sum()
        tn_den += (~matched).sum()
        tp_num += ((pred_cls != BACKGROUND) & matched).sum()
        tp_den += matched.sum()
        acc_num += ((pred_cls == targets) & matched).sum()

    w = np.concatenate(all_w)
    ce = np.concatenate(all_ce)
    return {
        "label_cost": (w * ce).sum() / w.sum(),
        "l1_loss": l1_sum / n_matched,
        "giou_loss": giou_sum / n_matched,
        "true_neg": tn_num / tn_den,
        "true_pos": tp_num / tp_den,
        "pos_accuracy": acc_num / tp_den,
    }


def _instance(rng, B=3, Q=100, T=100, C=92):
    p_logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    p_boxes = rng.uniform(0.25, 0.75, size=(B, Q, 4)).astype(np.float32)
    t_counts = rng.integers(1, 15, size=(B,))
    t_bbox = np.zeros((B, T, 4), np.float32)
    t_class = np.zeros((B, T), np.int32)
    t_mask = np.zeros((B, T), bool)
    for b in range(B):
        n = t_counts[b]
        t_bbox[b, :n] = rng.uniform(0.25, 0.75, size=(n, 4))
        t_class[b, :n] = rng.integers(0, C - 1, size=(n,))
        t_mask[b, :n] = True
    return p_logits, p_boxes, t_bbox, t_class, t_mask, t_counts


def test_single_layer_loss_matches_reference_semantics(rng):
    p_logits, p_boxes, t_bbox, t_class, t_mask, t_counts = _instance(rng)
    log = jax.jit(losses.single_layer_loss, static_argnums=(5,))(
        jnp.asarray(p_logits), jnp.asarray(p_boxes), jnp.asarray(t_bbox),
        jnp.asarray(t_class), jnp.asarray(t_mask), BACKGROUND,
    )
    ref = _reference_loss(p_logits, p_boxes, t_bbox, t_class, t_counts)
    for k, v in ref.items():
        np.testing.assert_allclose(float(log[k]), v, rtol=1e-4, atol=1e-4, err_msg=k)


def test_total_loss_weights():
    log = {"label_cost": jnp.float32(1.0), "giou_loss": jnp.float32(10.0),
           "l1_loss": jnp.float32(100.0), "true_pos": jnp.float32(999.0),
           "label_cost_0": jnp.float32(0.5), "l1_loss_3": jnp.float32(2.0)}
    total = float(losses.total_from_log(log))
    np.testing.assert_allclose(total, 1 + 20 + 500 + 0.5 + 10.0, rtol=1e-6)


def test_detr_loss_with_aux(rng):
    p_logits, p_boxes, t_bbox, t_class, t_mask, _ = _instance(rng, B=2)
    aux_logits = np.stack([p_logits, p_logits * 0.5])
    aux_boxes = np.stack([p_boxes, p_boxes])
    outputs = {
        "pred_logits": jnp.asarray(p_logits),
        "pred_boxes": jnp.asarray(p_boxes),
        "aux_logits": jnp.asarray(aux_logits),
        "aux_boxes": jnp.asarray(aux_boxes),
    }
    total, log = losses.detr_loss(
        outputs, jnp.asarray(t_bbox), jnp.asarray(t_class), jnp.asarray(t_mask), BACKGROUND
    )
    assert "label_cost_1" in log and "giou_loss_0" in log
    # aux layer 0 is an exact copy of the main head -> identical loss terms
    np.testing.assert_allclose(float(log["label_cost_0"]), float(log["label_cost"]), rtol=1e-5)
    np.testing.assert_allclose(float(log["l1_loss_0"]), float(log["l1_loss"]), rtol=1e-5)
    expected = sum(
        w * float(log[k2]) for k2, v in log.items()
        for k, w in losses.LOSS_WEIGHTS.items() if k in k2
        for _ in [0]
    )
    # recompute total independently
    expected = 0.0
    for key, val in log.items():
        for k, w in losses.LOSS_WEIGHTS.items():
            if k in key:
                expected += w * float(val)
    np.testing.assert_allclose(float(total), expected, rtol=1e-5)


def test_microbatched_loss_with_global_norm_equals_whole_batch(rng):
    """global_loss_normalizers: scoring the batch in microbatches with
    the global normalizers sums to the whole-batch detr_loss exactly —
    the contract the 1F1B pipeline (and bitwise-exact gradient
    accumulation) relies on."""
    B, Q = 4, 100
    p_logits, p_boxes, t_bbox, t_class, t_mask, _ = _instance(rng, B=B)
    aux_logits = np.stack([p_logits * 0.7])
    aux_boxes = np.stack([np.clip(p_boxes * 1.1, 0.0, 1.0)])

    def outputs(sl):
        return {
            "pred_logits": jnp.asarray(p_logits[sl]),
            "pred_boxes": jnp.asarray(p_boxes[sl]),
            "aux_logits": jnp.asarray(aux_logits[:, sl]),
            "aux_boxes": jnp.asarray(aux_boxes[:, sl]),
        }

    total_full, _ = losses.detr_loss(
        outputs(slice(None)), jnp.asarray(t_bbox), jnp.asarray(t_class),
        jnp.asarray(t_mask), BACKGROUND,
    )

    norm = losses.global_loss_normalizers(jnp.asarray(t_mask), Q)
    np.testing.assert_array_equal(
        int(norm["n_matched"]), int(t_mask.sum()))

    total_mb = 0.0
    for i in range(B):
        sl = slice(i, i + 1)
        t, _ = losses.detr_loss(
            outputs(sl), jnp.asarray(t_bbox[sl]), jnp.asarray(t_class[sl]),
            jnp.asarray(t_mask[sl]), BACKGROUND, norm=norm,
        )
        total_mb += float(t)
    # Loss terms sum exactly; metric terms (true_neg/true_pos/...) are
    # not in the total. fp32 summation order differs -> tiny rtol.
    np.testing.assert_allclose(total_mb, float(total_full), rtol=2e-5)


def test_microbatched_mask_losses_with_global_norm(rng):
    """The focal/dice mask losses also sum exactly across microbatches
    under the global normalizer (the 1F1B/masked-model contract)."""
    B, Q, T, C = 4, 6, 6, 8
    p_logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    p_boxes = rng.uniform(0.25, 0.75, size=(B, Q, 4)).astype(np.float32)
    t_bbox = np.zeros((B, T, 4), np.float32)
    t_class = np.zeros((B, T), np.int32)
    t_mask = np.zeros((B, T), bool)
    for b in range(B):
        n = 2 + b % 2
        t_bbox[b, :n] = rng.uniform(0.25, 0.75, size=(n, 4))
        t_class[b, :n] = rng.integers(0, C - 2, size=(n,))
        t_mask[b, :n] = True
    p_masks = rng.normal(size=(B, Q, 8, 8)).astype(np.float32)
    t_masks = (rng.uniform(size=(B, T, 8, 8)) > 0.5).astype(np.uint8)

    def outputs(sl):
        return {
            "pred_logits": jnp.asarray(p_logits[sl]),
            "pred_boxes": jnp.asarray(p_boxes[sl]),
            "pred_masks": jnp.asarray(p_masks[sl]),
        }

    total_full, log_full = losses.detr_loss(
        outputs(slice(None)), jnp.asarray(t_bbox), jnp.asarray(t_class),
        jnp.asarray(t_mask), C - 1, t_masks=jnp.asarray(t_masks),
    )
    assert "mask_loss" in log_full and "dice_loss" in log_full

    norm = losses.global_loss_normalizers(jnp.asarray(t_mask), Q)
    total_mb = 0.0
    for i in range(B):
        sl = slice(i, i + 1)
        t, _ = losses.detr_loss(
            outputs(sl), jnp.asarray(t_bbox[sl]), jnp.asarray(t_class[sl]),
            jnp.asarray(t_mask[sl]), C - 1,
            t_masks=jnp.asarray(t_masks[sl]), norm=norm,
        )
        total_mb += float(t)
    np.testing.assert_allclose(total_mb, float(total_full), rtol=2e-5)


def test_pack_unpack_roundtrip(rng):
    from detr_tensorflow_tpu.data import processing

    n = 7
    tb = rng.uniform(size=(n, 4)).astype(np.float32)
    tc = rng.integers(0, 90, size=(n, 1))
    _, bbox_packed, cls_packed = processing.pad_labels(None, tb, tc)
    assert bbox_packed.shape == (100, 4) and cls_packed.shape == (100, 1)
    assert bbox_packed[0, 0] == n
    b, c, m = processing.unpack_labels(bbox_packed[None], cls_packed[None])
    assert int(np.asarray(m).sum()) == n
    np.testing.assert_allclose(np.asarray(b)[0, :n], tb, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c)[0, :n], tc[:, 0])


def test_normalization_roundtrip(rng):
    from detr_tensorflow_tpu.data import processing

    class Cfg:
        normalized_method = "torch_resnet"

    img = rng.integers(0, 255, size=(32, 48, 3)).astype(np.uint8)
    norm = processing.normalized_images(img, Cfg())
    assert norm.dtype == np.float32
    back = processing.denormalize_image(norm, Cfg())
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1

    Cfg.normalized_method = "tf_resnet"
    norm = processing.normalized_images(img, Cfg())
    back = processing.denormalize_image(norm, Cfg())
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_get_losses_reference_layout_shim(rng):
    """The reference-signature get_losses accepts header-row targets
    (processing.py:35-55 layout) and matches the native-layout loss."""
    from detr_tensorflow_tpu.data import processing

    p_logits, p_boxes, t_bbox, t_class, t_mask, t_counts = _instance(rng, B=2)
    m_outputs = {"pred_logits": jnp.asarray(p_logits), "pred_boxes": jnp.asarray(p_boxes)}

    # Build reference-layout targets from the native ones.
    ref_bbox = np.zeros((2, 101, 4), np.float32)
    ref_cls = np.zeros((2, 101, 1), np.int64)
    for b in range(2):
        n = t_counts[b]
        _, bb, cc = processing.pad_labels(None, t_bbox[b, :n], t_class[b, :n],
                                          max_targets=101)
        ref_bbox[b], ref_cls[b] = bb, cc

    class Cfg:
        background_class = BACKGROUND

    total_shim, log_shim = losses.get_losses(m_outputs, jnp.asarray(ref_bbox),
                                             jnp.asarray(ref_cls), Cfg())
    total_native, _ = losses.detr_loss(
        m_outputs, jnp.asarray(t_bbox), jnp.asarray(t_class),
        jnp.asarray(t_mask), BACKGROUND,
    )
    np.testing.assert_allclose(float(total_shim), float(total_native), rtol=1e-5)
    assert "label_cost" in log_shim
