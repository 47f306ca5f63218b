import numpy as np
import jax.numpy as jnp
import pytest

from cerberusdet_tpu.ops.nms import cross_task_suppress, greedy_nms, non_max_suppression

pytestmark = pytest.mark.smoke  # fast core tier: pytest -m smoke


def _pred(boxes_xywh, scores):
    """Build a (1, N, 4+nc) prediction array."""
    return jnp.concatenate([jnp.asarray(boxes_xywh), jnp.asarray(scores)], axis=1)[None]


def test_greedy_nms_suppresses_overlaps():
    boxes = jnp.array([[0.0, 0, 10, 10], [1.0, 1, 11, 11], [20.0, 20, 30, 30]])
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, valid = greedy_nms(boxes, scores, iou_thres=0.5, max_det=3)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_nms_basic_and_padding():
    boxes = [[50, 50, 20, 20], [51, 51, 20, 20], [150, 150, 30, 30]]
    scores = [[0.9, 0.0], [0.85, 0.0], [0.0, 0.7]]
    dets, counts = non_max_suppression(_pred(boxes, scores), nc=2, conf_thres=0.25, iou_thres=0.5)
    assert dets.shape == (1, 300, 6)
    assert int(counts[0]) == 2
    d = np.asarray(dets[0][:2])
    # highest conf first
    assert d[0, 4] >= d[1, 4]
    assert set(d[:, 5].tolist()) == {0.0, 1.0}
    # padding rows zero
    assert np.all(np.asarray(dets[0][2:]) == 0)


def test_nms_class_aware_keeps_different_classes():
    # same box, two classes above threshold -> both kept when not agnostic
    boxes = [[50, 50, 20, 20], [50, 50, 20, 20]]
    scores = [[0.9, 0.0], [0.0, 0.8]]
    dets, counts = non_max_suppression(_pred(boxes, scores), nc=2)
    assert int(counts[0]) == 2
    dets, counts = non_max_suppression(_pred(boxes, scores), nc=2, agnostic=True)
    assert int(counts[0]) == 1


def test_nms_multi_label():
    boxes = [[50, 50, 20, 20]]
    scores = [[0.9, 0.8]]
    dets, counts = non_max_suppression(_pred(boxes, scores), nc=2, multi_label=True)
    assert int(counts[0]) == 2  # one box reported under both classes
    dets, counts = non_max_suppression(_pred(boxes, scores), nc=2, multi_label=False)
    assert int(counts[0]) == 1


def test_nms_conf_threshold_filters():
    boxes = [[50, 50, 20, 20], [100, 100, 20, 20]]
    scores = [[0.9, 0.0], [0.1, 0.0]]
    dets, counts = non_max_suppression(_pred(boxes, scores), nc=2, conf_thres=0.25)
    assert int(counts[0]) == 1


def test_nms_classes_filter():
    boxes = [[50, 50, 20, 20], [100, 100, 20, 20]]
    scores = [[0.9, 0.0], [0.0, 0.8]]
    dets, counts = non_max_suppression(_pred(boxes, scores), nc=2, classes=(1,))
    assert int(counts[0]) == 1
    assert float(dets[0, 0, 5]) == 1.0


def _numpy_greedy_nms(boxes, scores, iou_thres):
    """Reference O(n^2) greedy NMS (torchvision.ops.nms semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter + 1e-7)
        suppressed |= iou > iou_thres
    return np.array(keep)


def test_nms_matches_numpy_reference():
    rng = np.random.default_rng(42)
    n = 200
    xy = rng.uniform(50, 600, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes_xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    ref = _numpy_greedy_nms(boxes_xyxy, scores, 0.5)
    idx, valid = greedy_nms(jnp.asarray(boxes_xyxy), jnp.asarray(scores), 0.5, max_det=n)
    ours = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(ours, ref)


def test_cross_task_suppress():
    # task 0 box overlaps task 1 box; keep higher conf (task 1 here)
    dets = jnp.array(
        [
            [0.0, 0, 10, 10, 0.7, 0.0],
            [1.0, 1, 11, 11, 0.9, 5.0],
            [50.0, 50, 60, 60, 0.8, 1.0],
            [0.0, 0, 0, 0, 0.0, 0.0],  # padding
        ]
    )
    task_idx = jnp.array([0, 1, 0, 0])
    keep = np.asarray(cross_task_suppress(dets, task_idx, iou_thres=0.5))
    assert keep.tolist() == [False, True, True, False]


def test_cross_task_same_task_not_suppressed():
    dets = jnp.array(
        [
            [0.0, 0, 10, 10, 0.7, 0.0],
            [1.0, 1, 11, 11, 0.9, 1.0],
        ]
    )
    keep = np.asarray(cross_task_suppress(dets, jnp.array([0, 0]), iou_thres=0.5))
    assert keep.tolist() == [True, True]


def test_nms_selection_invariant_to_candidate_order():
    """The no-truncation select path keeps candidates in anchor order instead
    of sorting by score (ops/nms.py:_select_candidates). Greedy NMS selects by
    argmax, so the selected DET ROWS must be identical for any permutation of
    the candidate axis — the property that makes skipping the sort exact."""
    rng = np.random.default_rng(3)
    n, nc = 400, 7
    xy = rng.uniform(0, 500, (2, n, 2))
    wh = rng.uniform(5, 80, (2, n, 2))
    pred = np.concatenate(
        [xy + wh / 2, wh, rng.uniform(0, 1, (2, n, nc)) ** 4], -1
    ).astype(np.float32)
    perm = rng.permutation(n)
    a, ca = non_max_suppression(jnp.asarray(pred), nc=nc, conf_thres=0.25,
                                iou_thres=0.45, max_det=50)
    b, cb = non_max_suppression(jnp.asarray(pred[:, perm]), nc=nc,
                                conf_thres=0.25, iou_thres=0.45, max_det=50)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_cross_task_suppress_scan_rows_exact():
    """scan_rows=(T-1)*max_det skips only provably no-op iterations: for a
    task-major layout the bounded scan must equal the full scan bitwise."""
    rng = np.random.default_rng(4)
    m, md = 120, 60  # 2 tasks x 60 rows
    xy = rng.uniform(0, 200, (m, 2)); wh = rng.uniform(5, 120, (m, 2))
    dets = np.concatenate(
        [xy, xy + wh, rng.uniform(0, 1, (m, 1)), rng.integers(0, 5, (m, 1))],
        -1).astype(np.float32)
    dets[rng.uniform(size=m) < 0.2, 4] = 0.0  # padding rows
    task_idx = jnp.asarray((np.arange(m) >= md).astype(np.int32))
    full = np.asarray(cross_task_suppress(jnp.asarray(dets), task_idx, 0.3))
    bounded = np.asarray(cross_task_suppress(jnp.asarray(dets), task_idx, 0.3,
                                             scan_rows=md))
    np.testing.assert_array_equal(full, bounded)


def _iou_np(a, b):
    """Pairwise IoU of (n,4) and (m,4) xyxy boxes (test-local)."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)


def _reference_cross_task(dets, task_idx, iou_thres):
    """Verbatim port of the reference nms_between_tasks scan
    (cerberusdet/utils/general.py:493-554) on an already task-major layout,
    returning a keep mask over the padded input. Test-only: pins
    cross_task_suppress differentially, incl. the quirk that already-deleted
    columns stay in later groups and can win them."""
    valid = dets[:, 4] > 0
    idx_map = np.where(valid)[0]  # compact -> global (order preserved)
    bb = dets[idx_map]
    t = task_idx[idx_map]
    n = len(bb)
    iou_matrix = np.zeros((n, n))
    if n:
        full = _iou_np(bb[:, :4], bb[:, :4])
        upper = t[:, None] < t[None, :]  # only upper task blocks are filled
        iou_matrix = np.where(upper, full, 0.0)
    to_delete = set()
    for row_i in range(n):
        if row_i in to_delete:
            continue
        idxs = list(np.where(iou_matrix[row_i] > iou_thres)[0])
        if not idxs:
            continue
        idxs = idxs + [row_i]
        scores = bb[idxs][:, 4]
        winner = int(np.argmax(scores))  # first max, like torch.argmax
        to_delete.update(int(ix) for k, ix in enumerate(idxs) if k != winner)
    keep = np.zeros(len(dets), bool)
    for k in range(n):
        if k not in to_delete:
            keep[idx_map[k]] = True
    return keep


@pytest.mark.smoke
def test_cross_task_suppress_differential_fuzz():
    """500 random multi-task overlap configurations (clustered boxes to force
    chained overlaps, occasional exact score ties) must produce keep sets
    IDENTICAL to the reference's sequential loop (VERDICT r3 item 7)."""
    rng = np.random.default_rng(0)
    mismatches = []
    for case in range(500):
        T = int(rng.integers(2, 5))
        per_task = int(rng.integers(2, 9))
        m = T * per_task
        n_clusters = int(rng.integers(1, 5))
        centers = rng.uniform(20, 180, (n_clusters, 2))
        xy = centers[rng.integers(0, n_clusters, m)] + rng.uniform(-6, 6, (m, 2))
        wh = rng.uniform(20, 40, (m, 2)) * rng.uniform(0.9, 1.1, (m, 1))
        conf = rng.uniform(0.1, 1.0, m)
        if case % 3 == 0:  # force exact ties into some cases
            conf = np.round(conf, 1) + 0.05
        dets = np.concatenate(
            [xy - wh / 2, xy + wh / 2, conf[:, None],
             rng.integers(0, 3, (m, 1)).astype(np.float64)], axis=1
        ).astype(np.float32)
        dets[rng.uniform(size=m) < 0.15, 4] = 0.0  # padding rows
        task_idx = np.repeat(np.arange(T), per_task).astype(np.int32)
        iou_thres = float(rng.choice([0.3, 0.5, 0.8]))
        ref = _reference_cross_task(dets, task_idx, iou_thres)
        ours = np.asarray(cross_task_suppress(
            jnp.asarray(dets), jnp.asarray(task_idx), iou_thres))
        if not np.array_equal(ours, ref):
            mismatches.append((case, ours.tolist(), ref.tolist()))
    assert not mismatches, mismatches[:3]


@pytest.mark.smoke
def test_cross_task_suppress_deleted_column_still_wins():
    """Reference quirk (general.py:540-551): a box deleted by an earlier row
    stays in later rows' overlap groups and can WIN them — row 1 here is
    deleted because the already-deleted box 2 outscores it."""
    dets = jnp.asarray(np.array([
        [0, 0, 10, 10, 0.5, 0],
        [1, 1, 11, 11, 0.4, 0],
        [0, 0, 10, 10, 0.9, 5],
    ], np.float32))
    keep = np.asarray(cross_task_suppress(dets, jnp.array([0, 0, 1]), 0.5))
    assert keep.tolist() == [False, False, True]
