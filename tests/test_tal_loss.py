import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cerberusdet_tpu.train.loss import DetectionLoss, _df_loss
from cerberusdet_tpu.train.tal import TaskAlignedAssigner

pytestmark = pytest.mark.smoke  # fast core tier: pytest -m smoke


def _synthetic(B=2, N=84, M=4, NC=5, seed=0):
    rng = np.random.default_rng(seed)
    pd_scores = rng.uniform(0, 1, (B, N, NC)).astype(np.float32)
    anc = (rng.uniform(0, 64, (N, 2))).astype(np.float32)
    half = rng.uniform(1, 5, (N, 2)).astype(np.float32)
    pd_boxes = np.concatenate([anc - half, anc + half], -1).astype(np.float32)
    pd_boxes = np.broadcast_to(pd_boxes, (B, N, 4)).copy()
    gt_boxes = np.tile(
        np.array([[[5.0, 5, 25, 25], [30.0, 30, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32),
        (B, 1, 1),
    )
    gt_labels = np.tile(np.array([[1, 3, 0, 0]], np.int64), (B, 1))
    mask_gt = np.tile(np.array([[True, True, False, False]]), (B, 1))
    return pd_scores, pd_boxes, anc, gt_labels, gt_boxes, mask_gt


def test_assigner_basic_properties():
    pd_scores, pd_boxes, anc, gt_labels, gt_boxes, mask_gt = _synthetic()
    tal = TaskAlignedAssigner(topk=10, num_classes=5, alpha=0.5, beta=6.0)
    res = tal(jnp.asarray(pd_scores), jnp.asarray(pd_boxes), jnp.asarray(anc),
              jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(mask_gt))
    fg = np.asarray(res.fg_mask)
    assert fg.any() and not fg.all()
    # every fg anchor's center lies inside its assigned gt box
    for b in range(2):
        for i in np.where(fg[b])[0]:
            tb = np.asarray(res.target_bboxes)[b, i]
            assert tb[0] <= anc[i, 0] <= tb[2] and tb[1] <= anc[i, 1] <= tb[3]
            assert np.asarray(res.target_labels)[b, i] in (1, 3)
    # background anchors get zero scores
    assert np.all(np.asarray(res.target_scores)[~fg] == 0)


def test_assigner_empty_gt():
    pd_scores, pd_boxes, anc, gt_labels, gt_boxes, _ = _synthetic()
    mask_gt = np.zeros((2, 4), bool)
    tal = TaskAlignedAssigner(topk=10, num_classes=5, alpha=0.5, beta=6.0)
    res = tal(jnp.asarray(pd_scores), jnp.asarray(pd_boxes), jnp.asarray(anc),
              jnp.asarray(gt_labels), jnp.asarray(gt_boxes * 0), jnp.asarray(mask_gt))
    assert not np.asarray(res.fg_mask).any()
    assert np.all(np.asarray(res.target_scores) == 0)


@pytest.fixture(scope="module")
def ref_tal():
    """Import the reference TaskAlignedAssigner (read-only, for golden tests),
    stubbing its unavailable deps."""
    import sys
    import types

    if "pkg_resources" not in sys.modules:
        pkg = types.ModuleType("pkg_resources")
        pkg.parse_version = lambda v: v
        sys.modules["pkg_resources"] = pkg
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=None)
        sys.modules["torchvision"] = tv
    sys.path.insert(0, "/root/reference")
    try:
        from cerberusdet.utils.tal import TaskAlignedAssigner as RefTAL
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove("/root/reference")
    return RefTAL


def test_assigner_matches_reference(ref_tal):
    """Golden comparison on tie-free data (all CIoU > 0): zero-metric top-k
    picks are tie-broken arbitrarily in BOTH implementations and carry zero
    loss weight, so the comparison is restricted to the deterministic regime."""
    import torch

    rng = np.random.default_rng(7)
    B, N, M, NC = 2, 84, 4, 5
    pd_scores = rng.uniform(0.1, 1, (B, N, NC)).astype(np.float32)
    anc = rng.uniform(25, 40, (N, 2)).astype(np.float32)
    half = rng.uniform(28, 34, (N, 2)).astype(np.float32)
    pd_boxes = np.broadcast_to(
        np.concatenate([anc - half, anc + half], -1).astype(np.float32), (B, N, 4)
    ).copy()
    gt_boxes = np.tile(
        np.array([[[5.0, 5, 45, 45], [20.0, 20, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32),
        (B, 1, 1),
    )
    gt_labels = np.tile(np.array([[1, 3, 0, 0]], np.int64), (B, 1))
    mask_gt = np.tile(np.array([[True, True, False, False]]), (B, 1))

    from cerberusdet_tpu.ops.boxes import bbox_iou as our_iou

    ov = np.asarray(our_iou(jnp.asarray(gt_boxes)[:, :2, None, :], jnp.asarray(pd_boxes)[:, None, :, :],
                            xywh=False, CIoU=True))
    assert (ov > 1e-6).all(), "golden data must be tie-free"
    ref = ref_tal(topk=10, num_classes=5, alpha=0.5, beta=6.0)
    r_lab, r_box, r_scores, r_fg, r_idx = ref(
        torch.from_numpy(pd_scores), torch.from_numpy(pd_boxes), torch.from_numpy(anc),
        torch.from_numpy(gt_labels.astype(np.float32))[..., None],
        torch.from_numpy(gt_boxes), torch.from_numpy(mask_gt)[..., None],
    )
    tal = TaskAlignedAssigner(topk=10, num_classes=5, alpha=0.5, beta=6.0)
    res = tal(jnp.asarray(pd_scores), jnp.asarray(pd_boxes), jnp.asarray(anc),
              jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(mask_gt))
    np.testing.assert_array_equal(np.asarray(res.fg_mask), r_fg.numpy())
    np.testing.assert_allclose(np.asarray(res.target_scores), r_scores.numpy(), atol=1e-5)
    fg = r_fg.numpy()
    np.testing.assert_allclose(np.asarray(res.target_bboxes)[fg], r_box.numpy()[fg], atol=1e-5)


def _fake_feats_and_batch(B=2, nc=5, reg_max=16, M=8, seed=0):
    rng = np.random.default_rng(seed)
    no = nc + 4 * reg_max
    feats = [jnp.asarray(rng.normal(0, 0.5, (B, s, s, no)).astype(np.float32)) for s in (8, 4, 2)]
    cls = rng.integers(0, nc, (B, M))
    boxes = np.stack([
        rng.uniform(0.3, 0.7, (B, M)), rng.uniform(0.3, 0.7, (B, M)),
        rng.uniform(0.1, 0.3, (B, M)), rng.uniform(0.1, 0.3, (B, M)),
    ], -1).astype(np.float32)
    mask = np.zeros((B, M), bool)
    mask[:, :3] = True
    batch = {"cls": jnp.asarray(cls), "bboxes": jnp.asarray(boxes),
             "mask": jnp.asarray(mask), "prob": jnp.ones((B, M), jnp.float32)}
    return feats, batch


def test_loss_finite_and_items():
    feats, batch = _fake_feats_and_batch()
    loss_fn = DetectionLoss(nc=5, strides=(8, 16, 32))
    total, items = loss_fn(feats, batch)
    assert np.isfinite(float(total))
    assert float(items.total) > 0
    assert abs(float(items.box + items.cls + items.dfl - items.total)) < 1e-5


def test_loss_empty_gt_is_cls_only():
    feats, batch = _fake_feats_and_batch()
    batch = dict(batch, mask=jnp.zeros_like(batch["mask"]))
    loss_fn = DetectionLoss(nc=5, strides=(8, 16, 32))
    total, items = loss_fn(feats, batch)
    assert np.isfinite(float(total))
    assert float(items.box) == 0.0 and float(items.dfl) == 0.0


def test_loss_grad_flows():
    feats, batch = _fake_feats_and_batch()
    loss_fn = DetectionLoss(nc=5, strides=(8, 16, 32))

    def f(feats):
        return loss_fn(feats, batch)[0]

    grads = jax.grad(f)(feats)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in grads)
    assert np.isfinite(gnorm) and gnorm > 0


def test_df_loss_peaked_target():
    # logits peaked exactly at integer target -> near-zero loss
    reg_max = 16
    pred = np.full((1, 1, 4, reg_max), -20.0, np.float32)
    pred[..., 7] = 20.0
    target = np.full((1, 1, 4), 7.0, np.float32)
    out = _df_loss(jnp.asarray(pred), jnp.asarray(target), reg_max)
    assert float(out[0, 0]) < 1e-3
