"""Pallas TAL assigner golden tests (VERDICT r2 item 3): ops/tal_pallas.py
must match train/tal.py's XLA assigner — exactly on the integer/bool outputs
(assignment identity) and to fp rounding on the normalized scores — across
tie-free random scenes, empty-gt rows, dense multi-assignment, and multi-tile
gt counts. Runs in interpreter mode on the CPU test backend; the real-chip
compiled path is exercised by the train-step benches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cerberusdet_tpu.ops.tal_pallas import assign_pallas
from cerberusdet_tpu.train.tal import TaskAlignedAssigner


def _random_scene(seed, B=2, N=256, NC=7, M=12, dense=False, empty_first=False):
    rng = np.random.default_rng(seed)
    pd_scores = rng.uniform(0, 1, (B, N, NC)).astype(np.float32)
    anc = rng.uniform(0, 64, (N, 2)).astype(np.float32)
    wh = rng.uniform(2, 20, (B, N, 2)).astype(np.float32)
    pd_bboxes = np.concatenate([anc[None] - wh / 2, anc[None] + wh / 2], -1)
    gt_bboxes = np.zeros((B, M, 4), np.float32)
    gt_labels = np.zeros((B, M), np.int64)
    mask_gt = np.zeros((B, M), bool)
    for b in range(B):
        if empty_first and b == 0:
            continue
        n_gt = int(rng.integers(M // 2, M)) if dense else int(rng.integers(3, M))
        for m in range(n_gt):
            if dense:
                # overlapping boxes around the same region -> anchors inside
                # several gts, exercising select_highest_overlaps
                cx, cy = rng.uniform(24, 40, 2)
                w, h = rng.uniform(20, 40, 2)
            else:
                cx, cy = rng.uniform(8, 56, 2)
                w, h = rng.uniform(6, 30, 2)
            gt_bboxes[b, m] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            gt_labels[b, m] = rng.integers(0, NC)
            mask_gt[b, m] = True
    return tuple(jnp.asarray(x) for x in
                 (pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt))


def _compare(scene, NC, topk=10):
    xla = TaskAlignedAssigner(topk=topk, num_classes=NC)
    ref = xla(*scene)
    out = assign_pallas(*scene, topk=topk, num_classes=NC, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.target_labels),
                                  np.asarray(out.target_labels))
    np.testing.assert_array_equal(np.asarray(ref.fg_mask),
                                  np.asarray(out.fg_mask))
    np.testing.assert_array_equal(np.asarray(ref.target_gt_idx),
                                  np.asarray(out.target_gt_idx))
    np.testing.assert_array_equal(np.asarray(ref.target_bboxes),
                                  np.asarray(out.target_bboxes))
    np.testing.assert_allclose(np.asarray(ref.target_scores),
                               np.asarray(out.target_scores),
                               rtol=1e-5, atol=1e-6)
    return ref


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_assigner_matches_xla_random(seed):
    scene = _random_scene(seed)
    ref = _compare(scene, NC=7)
    assert bool(np.asarray(ref.fg_mask).any())  # non-trivial scene


def test_pallas_assigner_dense_multi_assignment():
    """Overlapping gts: anchors claimed by several gts must resolve to the
    highest-CIoU gt identically (select_highest_overlaps semantics)."""
    scene = _random_scene(5, dense=True, M=16)
    xla = TaskAlignedAssigner(topk=10, num_classes=7)
    ref = xla(*scene)
    # the scene must actually exercise the multi-assignment path
    mask_in = np.asarray(
        (scene[4][:, :, None, :2] < scene[2][None, None]).all(-1)
        & (scene[2][None, None] < scene[4][:, :, None, 2:4]).all(-1))
    assert (mask_in.sum(1) > 1).any()
    _compare(scene, NC=7)


def test_pallas_assigner_empty_gt_row():
    scene = _random_scene(3, empty_first=True)
    ref = _compare(scene, NC=7)
    assert not np.asarray(ref.fg_mask)[0].any()


def test_pallas_assigner_multitile_gts():
    """M=40 > tile size 32: accumulation across gt tiles."""
    scene = _random_scene(7, M=40, N=384)
    _compare(scene, NC=7)


def test_loss_with_pallas_tal_matches_xla():
    """Full DetectionLoss: identical loss values with either assigner."""
    from cerberusdet_tpu.train.loss import DetectionLoss

    rng = np.random.default_rng(0)
    B, M, nc = 2, 8, 3
    strides = (8.0, 16.0, 32.0)
    feats = [jnp.asarray(rng.normal(0, 1, (B, s, s, nc + 64)).astype(np.float32))
             for s in (8, 4, 2)]
    batch = {
        "cls": jnp.asarray(rng.integers(0, nc, (B, M)).astype(np.int32)),
        "bboxes": jnp.asarray(rng.uniform(0.3, 0.6, (B, M, 4)).astype(np.float32)),
        "mask": jnp.asarray(np.tile([True] * 5 + [False] * 3, (B, 1))),
        "prob": jnp.ones((B, M), jnp.float32),
    }
    l_xla = DetectionLoss(nc=nc, strides=strides, tal_impl="xla")
    l_pl = DetectionLoss(nc=nc, strides=strides, tal_impl="pallas")
    tot_x, items_x = l_xla(feats, batch)
    tot_p, items_p = l_pl(feats, batch)
    np.testing.assert_allclose(float(tot_x), float(tot_p), rtol=1e-5)
    for f in items_x._fields:
        np.testing.assert_allclose(float(getattr(items_x, f)),
                                   float(getattr(items_p, f)), rtol=1e-5,
                                   err_msg=f)


def test_pallas_assigner_partitions_over_mesh():
    """Under a data-parallel mesh the assigner must run per batch shard
    (custom_partitioning rule): results equal the unsharded run and the
    compiled HLO contains NO all-gather of the (B, N, nc) inputs."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    scene = _random_scene(11, B=8, N=256, NC=7, M=12)
    ref = assign_pallas(*scene, topk=10, num_classes=7, interpret=True)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    def shard(x, batched=True):
        spec = P("data") if batched else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    sharded = tuple(shard(x, batched=(i != 2)) for i, x in enumerate(scene))
    fn = jax.jit(lambda *a: assign_pallas(*a, topk=10, num_classes=7,
                                          interpret=True))
    out = fn(*sharded)
    for name in ref._fields:
        np.testing.assert_array_equal(np.asarray(getattr(ref, name)),
                                      np.asarray(getattr(out, name)),
                                      err_msg=name)
    hlo = fn.lower(*sharded).compile().as_text()
    assert "all-gather" not in hlo, "assigner inputs were all-gathered"
