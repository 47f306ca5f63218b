"""Branch-plan correctness vs the reference's sequential_split semantics
(cerberusdet/models/cerberus.py:704-737, README.md:85-105)."""

import jax
import jax.numpy as jnp
import pytest

from cerberusdet_tpu.models.cerberus import CerberusModel, build_branch_labels


@pytest.mark.smoke
def test_no_cerber_all_shared():
    labels = build_branch_labels(None, n_neck=12, n_tasks=3)
    for t in range(3):
        assert all(l == () for l in labels[t])


@pytest.mark.smoke
def test_two_task_split_at_2():
    # [[2, [[13], [14]]]] with 12 neck layers: layers 1-2 shared, 3-12 split.
    labels = build_branch_labels([[2, [[13], [14]]]], n_neck=12, n_tasks=2)
    for layer in (1, 2):
        assert labels[0][layer - 1] == labels[1][layer - 1] == ()
    for layer in range(3, 13):
        assert labels[0][layer - 1] != labels[1][layer - 1]


@pytest.mark.smoke
def test_readme_nested_example():
    # [[2, [[15], [13, 14]]], [6, [[13], [14]]]] for 3 tasks (heads 13,14,15):
    # task 15 (idx 2) fully separate after layer 2; tasks 13,14 share 3-6 then split.
    cerber = [[2, [[15], [13, 14]]], [6, [[13], [14]]]]
    labels = build_branch_labels(cerber, n_neck=12, n_tasks=3)
    t13, t14, t15 = labels[0], labels[1], labels[2]
    for layer in (1, 2):
        assert t13[layer - 1] == t14[layer - 1] == t15[layer - 1] == ()
    for layer in range(3, 7):
        assert t13[layer - 1] == t14[layer - 1]
        assert t13[layer - 1] != t15[layer - 1]
    for layer in range(7, 13):
        assert len({t13[layer - 1], t14[layer - 1], t15[layer - 1]}) == 3


@pytest.mark.smoke
def test_unmentioned_task_stays_on_trunk():
    # a split mentioning only tasks 0 and 1 leaves task 2 with the original blocks
    cerber = [[6, [[13], [14]]]]
    labels = build_branch_labels(cerber, n_neck=12, n_tasks=3)
    for layer in range(7, 13):
        assert labels[2][layer - 1] == ()
        assert labels[0][layer - 1] != () and labels[1][layer - 1] != ()
        assert labels[0][layer - 1] != labels[1][layer - 1]


@pytest.mark.smoke
def test_invalid_head_id_raises():
    with pytest.raises(ValueError):
        build_branch_labels([[2, [[99], [14]]]], n_neck=12, n_tasks=2)


@pytest.fixture(scope="module")
def tiny_model():
    return CerberusModel("configs/models/yolov8n.yaml", ["a", "b"], [3, 5])


@pytest.mark.smoke
def test_plan_dedups_shared_blocks(tiny_model):
    m = tiny_model
    steps = m.plan()
    uids = [s.uid for s in steps]
    assert len(uids) == len(set(uids))
    # no cerber section: single set of neck blocks plus 2 heads
    assert sum(u.startswith("head_") for u in uids) == 2
    assert sum(u.startswith("n") for u in uids) == m.n_neck


@pytest.mark.smoke
def test_single_task_plan_subset(tiny_model):
    full = {s.uid for s in tiny_model.plan()}
    sub = {s.uid for s in tiny_model.plan(["a"])}
    assert sub < full
    assert "head_b" not in sub and "head_a" in sub


@pytest.mark.smoke
def test_serving_counts_2task_split():
    m = CerberusModel("configs/models/yolov8x_2task.yaml", ["voc", "animals"], [20, 19])
    # backbone + neck layers 1,2 (yolo 10,11) serve both tasks
    assert m.serving_counts["b0"] == 2 and m.serving_counts["n10"] == 2
    assert m.serving_counts["n11"] == 2
    # all later neck layers are duplicated per task
    branched = [u for u in m.serving_counts if ":" in u]
    assert len(branched) == 20  # 10 layers x 2 branches
    assert all(m.serving_counts[u] == 1 for u in branched)


def test_param_count_matches_reference_2task():
    """Reference README.md:241 reports 105M params for 2-task v8x."""
    m = CerberusModel("configs/models/yolov8x_2task.yaml", ["voc", "animals"], [20, 19])
    params = m.init(jax.random.PRNGKey(0))
    n = m.num_params(params)
    assert 104e6 < n < 107e6, n


@pytest.mark.smoke
def test_grad_scale_tree(tiny_model):
    params = tiny_model.init(jax.random.PRNGKey(0))
    scales = tiny_model.grad_scale_tree(params)
    flat = jax.tree_util.tree_leaves(scales["b0"])
    assert all(abs(float(s) - 0.5) < 1e-9 for s in flat)
    flat_h = jax.tree_util.tree_leaves(scales["head_a"])
    assert all(abs(float(s) - 1.0) < 1e-9 for s in flat_h)


def test_param_count_matches_reference_3task():
    """Reference README.md:242 reports 142M params for 3-task v8x."""
    m = CerberusModel("configs/models/yolov8x_3task.yaml",
                      ["voc", "animals", "tableware"], [20, 19, 12])
    params = m.init(jax.random.PRNGKey(0))
    n = m.num_params(params)
    assert 140e6 < n < 144e6, n


def test_param_count_matches_reference_2task_full():
    """Reference README.md:243 reports 107M params for VOC + full
    Objects365 (365 classes)."""
    m = CerberusModel("configs/models/yolov8x_2task.yaml",
                      ["voc", "objects365_full"], [20, 365])
    params = m.init(jax.random.PRNGKey(0))
    n = m.num_params(params)
    assert 106e6 < n < 109e6, n
