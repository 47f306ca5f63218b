import numpy as np
import pytest

from cerberusdet_tpu.evaluation.metrics import (
    IOUV,
    ConfusionMatrix,
    DetMetrics,
    ap_per_class,
    compute_ap,
    fitness,
    overall_fitness,
    process_batch,
)

pytestmark = pytest.mark.smoke  # fast core tier: pytest -m smoke


def test_fitness_weights():
    out = fitness(np.array([[0.5, 0.6, 0.8, 0.4]]))
    np.testing.assert_allclose(out, [0.1 * 0.8 + 0.9 * 0.4])


def test_overall_fitness_mean():
    r = {"a": (0, 0, 1.0, 1.0), "b": (0, 0, 0.0, 0.0)}
    assert overall_fitness(r) == pytest.approx(0.5)


def test_compute_ap_perfect():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    ap, _, _ = compute_ap(recall, precision)
    assert ap == pytest.approx(1.0, abs=0.02)


def test_compute_ap_worthless():
    recall = np.array([0.0, 0.0])
    precision = np.array([0.0, 0.0])
    ap, _, _ = compute_ap(recall, precision)
    assert ap < 0.05


def test_process_batch_simple_match():
    det = np.array([[10, 10, 50, 50, 0.9, 0.0]])
    labels = np.array([[0.0, 10, 10, 50, 50]])
    correct = process_batch(det, labels, IOUV)
    assert correct.shape == (1, 10)
    assert correct.all()  # IoU 1.0 passes every threshold


def test_process_batch_wrong_class():
    det = np.array([[10, 10, 50, 50, 0.9, 1.0]])
    labels = np.array([[0.0, 10, 10, 50, 50]])
    assert not process_batch(det, labels, IOUV).any()


def test_process_batch_iou_threshold():
    # IoU ~= 0.52: passes the 0.5 threshold but not 0.55+
    det = np.array([[0, 0, 10, 5.2, 0.9, 0.0]])
    labels = np.array([[0.0, 0, 0, 10, 10]])
    correct = process_batch(det, labels, IOUV)
    assert correct[0, 0] and not correct[0, 1:].any()


def test_process_batch_greedy_unique():
    # two detections on one label: only the higher-IoU one matches
    det = np.array([
        [0, 0, 10, 10, 0.9, 0.0],
        [1, 1, 11, 11, 0.8, 0.0],
    ])
    labels = np.array([[0.0, 0, 0, 10, 10]])
    correct = process_batch(det, labels, IOUV)
    assert correct[0, 0] and not correct[1, 0]


def test_ap_per_class_perfect_detector():
    n = 20
    tp = np.ones((n, 10), bool)
    conf = np.linspace(0.9, 0.5, n)
    pred_cls = np.zeros(n)
    target_cls = np.zeros(n)
    _, _, p, r, f1, ap, classes, *_ = ap_per_class(tp, conf, pred_cls, target_cls)
    assert ap.shape == (1, 10)
    assert ap[0, 0] == pytest.approx(1.0, abs=0.02)


def test_ap_per_class_half_fp():
    # alternating TP/FP at IoU .5 only
    n = 40
    tp = np.zeros((n, 10), bool)
    tp[::2, 0] = True
    conf = np.linspace(0.95, 0.05, n)
    out = ap_per_class(tp, conf, np.zeros(n), np.zeros(20))
    ap = out[5]
    assert 0.3 < ap[0, 0] < 0.75
    assert ap[0, 1:].max() == 0


def test_det_metrics_end_to_end():
    m = DetMetrics(nc=2, names=["a", "b"])
    for _ in range(5):
        m.update(np.ones((3, 10), bool), np.full(3, 0.9), np.array([0, 0, 1.0]),
                 np.array([0, 0, 1.0]))
    m.process()
    mp, mr, map50, mAP = m.mean_results()
    assert mAP == pytest.approx(1.0, abs=0.02)
    assert m.maps.shape == (2,)
    assert list(m.ap_class_index) == [0, 1]
    assert m.nt_per_class().tolist() == [10, 5]


def test_confusion_matrix():
    cm = ConfusionMatrix(nc=2)
    det = np.array([[10, 10, 50, 50, 0.9, 0.0]])
    labels = np.array([[0.0, 10, 10, 50, 50]])
    cm.process_batch(det, labels)
    assert cm.matrix[0, 0] == 1
    # missed gt -> background FN
    cm.process_batch(np.zeros((0, 6)), np.array([[1.0, 0, 0, 20, 20]]))
    assert cm.matrix[2, 1] == 1
    # spurious detection alongside a matched one -> background FP
    # (reference quirk, metrics.py:322-325: FPs only tallied when the batch
    # has at least one match)
    cm.process_batch(
        np.array([[10, 10, 50, 50, 0.9, 0.0], [100, 100, 150, 150, 0.9, 1.0]]),
        np.array([[0.0, 10, 10, 50, 50]]),
    )
    assert cm.matrix[1, 2] == 1
