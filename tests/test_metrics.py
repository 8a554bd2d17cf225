import numpy as np
import pytest

pytest.importorskip("jax")

from objectdetection_3d_tpu.metrics import MetricEvaluator  # noqa: E402


def box(x, y, rz=0.0, dx=1.0, dy=1.0, dz=3.0):
    return [x, y, 0.0, dx, dy, dz, 0.0, 0.0, rz]


def test_perfect_predictions():
    me = MetricEvaluator(eval_dim=3)
    gt = np.array([box(2, 2), box(6, 6)], np.float32)
    pred = {"bbox": gt.copy(), "label": np.zeros(2), "score": np.ones(2)}
    target = {"bbox": gt, "label": np.zeros(2)}
    p, r = me.evaluate([pred], [target], [0], [0.5])
    np.testing.assert_allclose(p, [[100.0]])
    np.testing.assert_allclose(r, [[100.0]])


def test_false_positive_and_negative():
    me = MetricEvaluator(eval_dim=3)
    gt = np.array([box(2, 2), box(6, 6)], np.float32)
    # one perfect match, one far-away false positive; second GT missed
    pred_boxes = np.array([box(2, 2), box(30, 30)], np.float32)
    pred = {"bbox": pred_boxes, "label": np.zeros(2),
            "score": np.array([0.9, 0.8])}
    target = {"bbox": gt, "label": np.zeros(2)}
    p, r = me.evaluate([pred], [target], [0], [0.5])
    np.testing.assert_allclose(p, [[50.0]])  # 1 TP, 1 FP
    np.testing.assert_allclose(r, [[50.0]])  # 1 TP, 1 FN


def test_best_match_only_rule():
    """Two predictions over one GT: only the best-overlap one is TP
    (reference model/metrics.py:128-141)."""
    me = MetricEvaluator(eval_dim=3)
    gt = np.array([box(2, 2)], np.float32)
    pred_boxes = np.array([box(2, 2), box(2.2, 2)], np.float32)
    pred = {"bbox": pred_boxes, "label": np.zeros(2),
            "score": np.array([0.9, 0.8])}
    target = {"bbox": gt, "label": np.zeros(1)}
    p, r = me.evaluate([pred], [target], [0], [0.3])
    np.testing.assert_allclose(p, [[50.0]])  # second match counts as FP
    np.testing.assert_allclose(r, [[100.0]])


def test_no_predictions():
    me = MetricEvaluator(eval_dim=3)
    gt = np.array([box(2, 2)], np.float32)
    pred = {"bbox": np.zeros((0, 9), np.float32), "label": np.zeros(0),
            "score": np.zeros(0)}
    target = {"bbox": gt, "label": np.zeros(1)}
    p, r = me.evaluate([pred], [target], [0], [0.5])
    np.testing.assert_allclose(r, [[0.0]])


def test_multiple_clouds_aggregate():
    me = MetricEvaluator(eval_dim=2)
    gt1 = np.array([box(2, 2)], np.float32)
    gt2 = np.array([box(6, 6)], np.float32)
    pred1 = {"bbox": gt1.copy(), "label": np.zeros(1),
             "score": np.ones(1)}
    pred2 = {"bbox": np.array([box(20, 20)], np.float32),
             "label": np.zeros(1), "score": np.ones(1)}
    t1 = {"bbox": gt1, "label": np.zeros(1)}
    t2 = {"bbox": gt2, "label": np.zeros(1)}
    p, r = me.evaluate([pred1, pred2], [t1, t2], [0], [0.5])
    np.testing.assert_allclose(p, [[50.0]])
    np.testing.assert_allclose(r, [[50.0]])
