"""Golden loss parity: our DetectionLoss vs the reference Loss on identical
predictions and targets (extends the TAL golden test to the full loss:
BCE + CIoU + DFL weighting, target preprocessing, gain application)."""

import numpy as np
import jax.numpy as jnp
import pytest

# NOTE: no module-level smoke mark — it would stack with @pytest.mark.slow
# below and pull the slow golden test into the fast tier (ADVICE r4).


@pytest.mark.slow
def test_loss_matches_reference():
    from tests.ref_torch import load_reference_cerberusdet

    RefCerberusDet = load_reference_cerberusdet()
    if RefCerberusDet is None:
        pytest.skip("reference not importable")
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import torch
        from cerberusdet.utils.loss import Loss as RefLoss
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)
    task_ids = ["a", "b"]
    ref_model = RefCerberusDet(
        task_ids=task_ids, nc=[3, 5],
        cfg="/root/reference/cerberusdet/models/yolov8x_voc_obj365.yaml",
        verbose=False,
    )
    ref_model.hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5}
    ref_loss = RefLoss(ref_model, task_ids)

    # identical fabricated predictions: 3 levels at 64px (8/16/32 strides)
    rng = np.random.default_rng(0)
    B, nc = 2, 3
    no = nc + 64
    shapes = [(8, 8), (4, 4), (2, 2)]
    feats_np = [rng.normal(0, 0.7, (B, h, w, no)).astype(np.float32) for h, w in shapes]

    # targets: 3 boxes in image 0, 1 box in image 1 (normalized xywh)
    tgt = np.array([
        [0, 0, 1.0, 0.5, 0.5, 0.4, 0.4],
        [0, 1, 1.0, 0.3, 0.3, 0.2, 0.2],
        [0, 2, 1.0, 0.7, 0.7, 0.3, 0.3],
        [1, 0, 1.0, 0.5, 0.5, 0.6, 0.6],
    ], np.float32)  # [batch_idx, cls, prob, x, y, w, h]

    ref_batch = {
        "batch_idx": torch.from_numpy(tgt[:, 0]),
        "cls": torch.from_numpy(tgt[:, 1]),
        "prob": torch.from_numpy(tgt[:, 2]),
        "bboxes": torch.from_numpy(tgt[:, 3:7]),
    }
    ref_feats = [torch.from_numpy(f.transpose(0, 3, 1, 2)).contiguous() for f in feats_np]
    ref_total, ref_items = ref_loss(ref_feats, ref_batch, "a")

    from cerberusdet_tpu.train.loss import DetectionLoss

    ours = DetectionLoss(nc=3, strides=(8, 16, 32), box_w=7.5, cls_w=0.5, dfl_w=1.5)
    M = 4
    cls = np.zeros((B, M), np.int32)
    boxes = np.zeros((B, M, 4), np.float32)
    mask = np.zeros((B, M), bool)
    for b in range(B):
        rows = tgt[tgt[:, 0] == b]
        cls[b, :len(rows)] = rows[:, 1]
        boxes[b, :len(rows)] = rows[:, 3:7]
        mask[b, :len(rows)] = True
    batch = {"cls": jnp.asarray(cls), "bboxes": jnp.asarray(boxes),
             "mask": jnp.asarray(mask), "prob": jnp.ones((B, M), jnp.float32)}
    total, items = ours([jnp.asarray(f) for f in feats_np], batch)

    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-4)
    ref_items = ref_items.numpy()
    np.testing.assert_allclose(
        [float(items.box), float(items.cls), float(items.dfl)],
        ref_items[:3], rtol=2e-4,
    )


def test_df_loss_masked_selection_equals_gather():
    """The DFL bin selection is a masked reduction (no TPU gather —
    PROFILE.md 'DFL loss gather elimination'); values AND gradients must be
    bitwise identical to the take_along_axis formulation it replaced."""
    import jax
    import jax.numpy as jnp

    from cerberusdet_tpu.train.loss import _df_loss

    reg_max = 16

    def df_loss_gather(pred_dist, target):
        tl = jnp.floor(target).astype(jnp.int32)
        tr = tl + 1
        wl = tr.astype(target.dtype) - target
        wr = 1.0 - wl
        logp = jax.nn.log_softmax(pred_dist, axis=-1)
        take = lambda idx: jnp.take_along_axis(
            logp, jnp.clip(idx, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
        ce = -(take(tl) * wl + take(tr) * wr)
        return jnp.mean(ce, axis=-1)

    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.normal(0, 3, (2, 57, 4, reg_max)), jnp.float32)
    # targets cover interior, exact-integer, and clip boundaries
    tgt = jnp.asarray(
        np.concatenate([
            rng.uniform(0, reg_max - 1, (2, 55, 4)),
            np.full((2, 1, 4), 0.0),
            np.full((2, 1, 4), reg_max - 1 - 1e-6),
        ], axis=1), jnp.float32)

    ours, g_ours = jax.value_and_grad(
        lambda p: jnp.sum(_df_loss(p, tgt, reg_max)))(pred)
    ref, g_ref = jax.value_and_grad(
        lambda p: jnp.sum(df_loss_gather(p, tgt)))(pred)
    assert np.array_equal(np.asarray(ours), np.asarray(ref))
    assert np.array_equal(np.asarray(g_ours), np.asarray(g_ref))
