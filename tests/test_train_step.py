import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.train.loss import DetectionLoss
from cerberusdet_tpu.train.step import MultiTaskTrainer, init_train_state
from cerberusdet_tpu.train.optim import build_group_tree, leaf_group


@pytest.fixture(scope="module")
def setup():
    model = CerberusModel("configs/models/yolov8n.yaml", ["a", "b"], [2, 3])
    params = model.init(jax.random.PRNGKey(0))
    losses = {
        "a": DetectionLoss(nc=2, strides=model.strides),
        "b": DetectionLoss(nc=3, strides=model.strides),
    }
    trainer = MultiTaskTrainer(model, losses)
    return model, params, trainer


def _batch(B=2, M=4, nc=2, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (B, 64, 64, 3)).astype(np.float32)
    cls = rng.integers(0, nc, (B, M))
    boxes = np.stack([
        np.full((B, M), 0.5), np.full((B, M), 0.5),
        np.full((B, M), 0.4), np.full((B, M), 0.4),
    ], -1).astype(np.float32)
    mask = np.zeros((B, M), bool)
    mask[:, :2] = True
    return {
        "img": jnp.asarray(img),
        "cls": jnp.asarray(cls),
        "bboxes": jnp.asarray(boxes),
        "mask": jnp.asarray(mask),
        "prob": jnp.ones((B, M), jnp.float32),
    }


@pytest.mark.smoke
def test_train_step_runs_and_loss_decreases(setup):
    """Losses transiently rise while momentum/BN stats warm up, then descend;
    assert a clear descent from the peak on a fixed batch."""
    model, params, trainer = setup
    state = init_train_state(params)
    batches = {"a": _batch(nc=2, seed=0), "b": _batch(nc=3, seed=1)}
    lrs = np.array([0.005, 0.005, 0.005], np.float32)
    history = []
    for i in range(35):
        state, items = trainer.step(state, batches, lrs, 0.9)
        history.append(sum(float(v.total) for v in items.values()))
    assert all(np.isfinite(h) for h in history)
    assert min(history[-5:]) < 0.75 * max(history), history[::5]


def test_bn_stats_and_ema_update(setup):
    model, params, trainer = setup
    state = init_train_state(params)
    batches = {"a": _batch(nc=2), "b": _batch(nc=3, seed=1)}
    state2, _ = trainer.step(state, batches, np.zeros(3, np.float32), 0.9)
    # zero LR: weights unchanged, but BN running stats must move
    p0 = params["b0"]["bn"]
    p1 = state2.params["b0"]["bn"]
    assert not np.allclose(np.asarray(p0["mean"]), np.asarray(p1["mean"]))
    np.testing.assert_allclose(np.asarray(p0["scale"]), np.asarray(p1["scale"]))
    assert int(state2.n_updates) == 1


def test_single_task_subset_step(setup):
    model, params, trainer = setup
    state = init_train_state(params)
    state2, items = trainer.step(state, {"a": _batch(nc=2)}, np.full(3, 0.01, np.float32), 0.9)
    assert set(items) == {"a"}
    # head_b untouched by a-only step
    wb0 = np.asarray(params["head_b"]["box0"]["0"]["w"])
    wb1 = np.asarray(state2.params["head_b"]["box0"]["0"]["w"])
    np.testing.assert_allclose(wb0, wb1)
    wa0 = np.asarray(params["head_a"]["box0"]["0"]["w"])
    wa1 = np.asarray(state2.params["head_a"]["box0"]["0"]["w"])
    assert not np.allclose(wa0, wa1)


def test_freeze_shared(setup):
    model, params, trainer = setup
    state = init_train_state(params)
    batches = {"a": _batch(nc=2), "b": _batch(nc=3, seed=1)}
    state2, _ = trainer.step(state, batches, np.full(3, 0.01, np.float32), 0.9,
                             freeze_shared=True)
    # shared backbone conv unchanged (weights AND bn stats frozen)
    np.testing.assert_allclose(np.asarray(params["b0"]["w"]), np.asarray(state2.params["b0"]["w"]))
    np.testing.assert_allclose(
        np.asarray(params["b0"]["bn"]["mean"]), np.asarray(state2.params["b0"]["bn"]["mean"])
    )
    # heads still train
    assert not np.allclose(
        np.asarray(params["head_a"]["box0"]["0"]["w"]),
        np.asarray(state2.params["head_a"]["box0"]["0"]["w"]),
    )


def test_leaf_groups(setup):
    model, params, _ = setup
    groups = build_group_tree(params)
    # conv weight -> 0, bn scale -> 1, bn bias -> 2, stats -> -1
    assert groups["b0"]["w"] == 0
    assert groups["b0"]["bn"]["scale"] == 1
    assert groups["b0"]["bn"]["bias"] == 2
    assert groups["b0"]["bn"]["mean"] == -1
    assert groups["head_a"]["box0"]["2"]["b"] == 2


@pytest.mark.smoke
def test_task_order_invariance():
    """The jitted multi-task step is task-order-invariant by construction
    (T forwards in one program, gradients summed) — the property the
    reference's sequential averaging trainer lacks (PROFILE.md round-5
    A/B: reversing task_ids moves its converged fitness by 0.2-0.4).
    Params are task-name-keyed, so the same state is steppable under both
    task orders; updates must agree to float-summation tolerance."""
    m1 = CerberusModel("configs/models/yolov8n.yaml", ["a", "b"], [2, 3])
    m2 = CerberusModel("configs/models/yolov8n.yaml", ["b", "a"], [3, 2])
    la = DetectionLoss(nc=2, strides=m1.strides)
    lb = DetectionLoss(nc=3, strides=m1.strides)
    t1 = MultiTaskTrainer(m1, {"a": la, "b": lb})
    t2 = MultiTaskTrainer(m2, {"b": lb, "a": la})
    params = m1.init(jax.random.PRNGKey(0))
    batches = {"a": _batch(nc=2, seed=0), "b": _batch(nc=3, seed=1)}
    lrs = np.full(3, 0.01, np.float32)

    s1, items1 = t1.step(init_train_state(params), batches, lrs, 0.9)
    s2, items2 = t2.step(init_train_state(params), dict(reversed(batches.items())),
                         lrs, 0.9)
    assert set(items1) == set(items2) == {"a", "b"}
    for t in items1:
        np.testing.assert_allclose(float(items1[t].total), float(items2[t].total),
                                   rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(s2.params))
    # Weights/optimizer state see only the SUMMED gradients, so they are
    # order-invariant up to float associativity (~1e-5). BN running stats
    # keep the usual sequential-EMA recency weighting: swapping the task
    # order perturbs them by O(momentum^2)*|mu_a - mu_b| ~ 2e-4 per step —
    # bounded and decaying, unlike the reference where task order moves
    # CONVERGED fitness by 0.2-0.4 (PROFILE.md round-5 swap control).
    groups = build_group_tree(params)
    gflat = dict(jax.tree_util.tree_leaves_with_path(groups))
    for path, leaf in flat1:
        is_stat = gflat[path] == -1
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat2[path]),
            rtol=5e-3 if is_stat else 2e-4,
            atol=1e-3 if is_stat else 1e-5,
            err_msg=jax.tree_util.keystr(path))
