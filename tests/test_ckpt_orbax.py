"""Orbax directory checkpoint backend: identical logical contents and load
contract as the .npz path (manager/checkpoint.py orbax section)."""

import jax
import numpy as np

from cerberusdet_tpu.manager.attempt_load import load_single
from cerberusdet_tpu.manager.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    strip_checkpoint,
)
from cerberusdet_tpu.models.cerberus import CerberusModel


def _assert_trees_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _assert_trees_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(np.asarray(a[k], np.float32),
                                       np.asarray(b[k], np.float32),
                                       rtol=1e-3, atol=1e-3, err_msg=f"{path}/{k}")


def test_orbax_roundtrip_matches_npz(tmp_path):
    model = CerberusModel("configs/models/yolov8n.yaml", ["t"], [2])
    params = model.init(jax.random.PRNGKey(0))
    meta = {"epoch": 3, "task_ids": ["t"], "nc": [2], "names": [["a", "b"]],
            "cfg": "configs/models/yolov8n.yaml", "n_updates": 7}

    npz = tmp_path / "w" / "last.ckpt.npz"
    odir = tmp_path / "w" / "last.ckpt"  # no .npz suffix -> orbax directory
    save_checkpoint(npz, params, meta, ema_params=params, opt_momentum=params)
    save_checkpoint(odir, params, meta, ema_params=params, opt_momentum=params)
    assert odir.is_dir()

    a, b = load_checkpoint(npz), load_checkpoint(odir)
    assert a["meta"] == b["meta"]
    _assert_trees_equal(a["params"], b["params"])
    _assert_trees_equal(a["ema"], b["ema"])
    _assert_trees_equal(a["opt"], b["opt"])


def test_orbax_strip_and_attempt_load(tmp_path):
    model = CerberusModel("configs/models/yolov8n.yaml", ["t"], [2])
    params = model.init(jax.random.PRNGKey(1))
    meta = {"epoch": 0, "task_ids": ["t"], "nc": [2], "names": [["a", "b"]],
            "cfg": "configs/models/yolov8n.yaml", "n_updates": 1}
    odir = tmp_path / "best.ckpt"
    save_checkpoint(odir, params, meta, ema_params=params, opt_momentum=params)
    strip_checkpoint(odir)
    ckpt = load_checkpoint(odir)
    assert ckpt["opt"] is None and ckpt["ema"] is None
    assert ckpt["meta"]["stripped"]
    m, p, meta2 = load_single(str(odir), fuse=True)
    assert meta2["task_ids"] == ["t"]
