"""Checkpoint round-trip + GOLDEN parity: the reference torch CerberusDet and
our model produce matching fp32 outputs from imported weights (the north-star
gate in BASELINE.md / SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cerberusdet_tpu.manager.checkpoint import (
    flatten_tree,
    intersect_trees,
    load_checkpoint,
    save_checkpoint,
    strip_checkpoint,
    unflatten_tree,
)
from cerberusdet_tpu.manager.pt_import import import_state_dict
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx


def test_flatten_roundtrip():
    tree = {"a": {"b": np.ones(3), "c": {"d": np.zeros((2, 2))}}, "e": np.arange(4)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])


def test_checkpoint_save_load_roundtrip(tmp_path):
    model = CerberusModel("configs/models/yolov8n.yaml", ["a"], [2])
    params = model.init(jax.random.PRNGKey(0))
    meta = {"epoch": 3, "task_ids": ["a"], "nc": [2], "best_fitness": 0.5}
    p = tmp_path / "last.ckpt.npz"
    save_checkpoint(p, params, meta, ema_params=params, half=True)
    ckpt = load_checkpoint(p)
    assert ckpt["meta"]["epoch"] == 3
    # fp16 round trip: close but not exact
    a = flatten_tree(params)
    b = flatten_tree(ckpt["params"])
    assert set(a) == set(b)
    k = "b0/w"
    np.testing.assert_allclose(np.asarray(a[k]), b[k], atol=1e-3)
    assert b[k].dtype == np.float32


def test_strip_checkpoint(tmp_path):
    model = CerberusModel("configs/models/yolov8n.yaml", ["a"], [2])
    params = model.init(jax.random.PRNGKey(0))
    ema = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    p = tmp_path / "last.ckpt.npz"
    save_checkpoint(p, params, {"epoch": 1}, ema_params=ema,
                    opt_momentum=params, half=False)
    strip_checkpoint(p)
    ckpt = load_checkpoint(p)
    assert ckpt["ema"] is None and ckpt["opt"] is None
    # ema promoted to params
    np.testing.assert_allclose(  # fp16 resolution: strip saves half like the reference
        flatten_tree(ckpt["params"])["b0/w"], np.asarray(params["b0"]["w"]) + 1.0, atol=1e-3
    )
    assert ckpt["meta"]["stripped"]


def test_intersect_trees():
    a = {"x": {"w": np.zeros((2, 2))}, "y": np.zeros(3)}
    b = {"x": {"w": np.ones((2, 2))}, "y": np.ones(4)}  # y shape mismatch
    merged, matched, total = intersect_trees(a, b)
    assert matched == 1 and total == 2
    np.testing.assert_array_equal(merged["x"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["y"], np.zeros(3))


@pytest.mark.slow
def test_golden_forward_parity_vs_reference():
    """Build the reference torch CerberusDet (random init), import its state
    dict, and require fp32 output parity per task on a fixed input."""
    from tests.ref_torch import load_reference_cerberusdet

    RefCerberusDet = load_reference_cerberusdet()
    if RefCerberusDet is None:
        pytest.skip("reference torch model not importable")
    import torch

    torch.manual_seed(0)
    ref = RefCerberusDet(
        task_ids=["a", "b"], nc=[3, 5],
        cfg="/root/reference/cerberusdet/models/yolov8x_voc_obj365.yaml",
        verbose=False,
    ).float().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = CerberusModel("configs/models/yolov8x_2task.yaml", ["a", "b"], [3, 5])
    params = model.init(jax.random.PRNGKey(0))
    params = import_state_dict(model, params, sd)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = model(params, jnp.asarray(x), Ctx(train=False))
    for t in ("a", "b"):
        r = ref_out[t]
        r = r[0] if isinstance(r, (tuple, list)) else r  # (B, 4+nc, N)
        r = r.numpy().transpose(0, 2, 1)  # -> (B, N, 4+nc)
        o = np.asarray(ours[t][0])
        assert o.shape == r.shape, (o.shape, r.shape)
        # boxes in pixels: compare with atol on box coords, tight on scores
        np.testing.assert_allclose(o[..., :4], r[..., :4], atol=2e-2, rtol=1e-4)
        np.testing.assert_allclose(o[..., 4:], r[..., 4:], atol=2e-4)
