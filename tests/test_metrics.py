"""mAP evaluator: hand cases + randomized equivalence against the
reference implementation (imported read-only from /root/reference)."""

import sys

import numpy as np
import pytest

from detr_tensorflow_tpu.metrics import MeanAPEvaluator, DEFAULT_IOU_THRESHOLDS


def _boxes(rows):
    return np.asarray(rows, np.float32)


def test_perfect_detection_scores_100():
    ev = MeanAPEvaluator(num_classes=3)
    gt = _boxes([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]])
    ev.add_image(gt, [1, 2], [0.9, 0.8], gt, [1, 2])
    table = ev.compute()
    assert table["box"]["all"] == pytest.approx(100.0)
    assert table["box"][50] == pytest.approx(100.0)
    assert table["box"][95] == pytest.approx(100.0)
    assert table["mask"]["all"] == pytest.approx(0.0)  # no masks supplied


def test_missed_gt_scores_0():
    ev = MeanAPEvaluator(num_classes=2)
    gt = _boxes([[0.1, 0.1, 0.4, 0.4]])
    ev.add_image(np.zeros((0, 4)), [], [], gt, [1])
    assert ev.compute()["box"]["all"] == pytest.approx(0.0)


def test_localization_quality_separates_thresholds():
    ev = MeanAPEvaluator(num_classes=2)
    gt = _boxes([[0.0, 0.0, 0.5, 0.5]])
    # IoU with gt = 0.25/0.30 ≈ 0.833: true through .80, false at .85+.
    pred = _boxes([[0.0, 0.0, 0.5, 0.6]])
    ev.add_image(pred, [1], [0.9], gt, [1])
    t = ev.compute()["box"]
    assert t[50] == pytest.approx(100.0)
    assert t[80] == pytest.approx(100.0)
    assert t[85] == pytest.approx(0.0)
    assert t[95] == pytest.approx(0.0)


def test_duplicate_detections_are_false_positives():
    ev = MeanAPEvaluator(num_classes=2)
    gt = _boxes([[0.1, 0.1, 0.5, 0.5]])
    pred = _boxes([[0.1, 0.1, 0.5, 0.5], [0.1, 0.1, 0.5, 0.5]])
    ev.add_image(pred, [1, 1], [0.9, 0.8], gt, [1])
    t = ev.compute()["box"]
    # one TP at rank 1, one FP at rank 2 -> AP still 100 (recall saturates
    # at the top-ranked detection).
    assert t[50] == pytest.approx(100.0)

    # reversed scores: FP first -> precision at recall=1 is 0.5
    ev2 = MeanAPEvaluator(num_classes=2)
    shifted = pred.copy()
    shifted[1] += 0.3  # second det matches nothing
    ev2.add_image(shifted[::-1], [1, 1], [0.9, 0.8], gt, [1])
    assert ev2.compute()["box"][50] < 100.0


def _random_scene(rng, n_classes=5):
    n_gt = rng.integers(1, 6)
    n_pred = rng.integers(0, 10)
    gt = np.sort(rng.uniform(0, 1, size=(n_gt, 2, 2)), axis=1).reshape(n_gt, 4)
    gt = gt[:, [0, 2, 1, 3]]
    gt_cls = rng.integers(1, n_classes, size=(n_gt,))
    # half of preds are jittered copies of gts, half random
    preds, cls, scores = [], [], []
    for _ in range(n_pred):
        if rng.random() < 0.5 and n_gt:
            j = rng.integers(0, n_gt)
            jitter = rng.normal(0, 0.05, size=4)
            b = gt[j] + jitter
            b = np.array([min(b[0], b[2]), min(b[1], b[3]),
                          max(b[0], b[2]) + 1e-3, max(b[1], b[3]) + 1e-3])
            preds.append(b)
            cls.append(gt_cls[j] if rng.random() < 0.8 else rng.integers(1, n_classes))
        else:
            b = np.sort(rng.uniform(0, 1, size=(2, 2)), axis=0).reshape(4)[[0, 2, 1, 3]]
            preds.append(b)
            cls.append(rng.integers(1, n_classes))
        scores.append(rng.uniform(0.1, 1.0))
    preds = np.asarray(preds, np.float32).reshape(-1, 4)
    return preds, np.asarray(cls), np.asarray(scores), gt, gt_cls


def test_equivalence_with_reference_evaluator(rng):
    sys.path.insert(0, "/root/reference")
    try:
        from detr_tf.loss.compute_map import APDataObject, cal_map, calc_map
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference evaluator unavailable: {e}")
    finally:
        sys.path.remove("/root/reference")

    n_classes = 5
    thresholds = list(DEFAULT_IOU_THRESHOLDS)
    ref_data = {
        "box": [[APDataObject() for _ in range(n_classes)] for _ in thresholds],
        "mask": [[APDataObject() for _ in range(n_classes)] for _ in thresholds],
    }
    ours = MeanAPEvaluator(num_classes=n_classes, iou_thresholds=thresholds)

    for _ in range(8):
        preds, cls, scores, gt, gt_cls = _random_scene(rng, n_classes)
        ours.add_image(preds, cls, scores, gt, gt_cls)
        cal_map(
            preds, cls, scores, np.zeros((8, 8, len(preds))),
            gt, gt_cls, np.zeros((8, 8, len(gt))), ref_data, thresholds,
        )

    ref_table = calc_map(ref_data, thresholds, ["c%d" % i for i in range(n_classes)])
    our_table = ours.compute()
    for key in ref_table["box"]:
        assert our_table["box"][key] == pytest.approx(ref_table["box"][key], abs=1e-2), key


def test_print_table_runs(capsys):
    ev = MeanAPEvaluator(num_classes=2)
    ev.add_image(_boxes([[0, 0, 1, 1]]), [1], [0.9], _boxes([[0, 0, 1, 1]]), [1])
    ev.print_table()
    out = capsys.readouterr().out
    assert "box" in out and "all" in out
