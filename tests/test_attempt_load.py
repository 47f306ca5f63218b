import numpy as np
import jax
import jax.numpy as jnp

from cerberusdet_tpu.manager.attempt_load import Ensemble, attempt_load, load_single
from cerberusdet_tpu.manager.checkpoint import save_checkpoint
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx


def _save_ckpt(tmp_path, name, seed):
    model = CerberusModel("configs/models/yolov8n.yaml", ["a"], [2])
    params = model.init(jax.random.PRNGKey(seed))
    meta = {"task_ids": ["a"], "nc": [2], "names": [["x", "y"]],
            "cfg": "configs/models/yolov8n.yaml"}
    p = tmp_path / f"{name}.ckpt.npz"
    save_checkpoint(p, params, meta, ema_params=params, half=False)
    return str(p)


def test_load_single_fused(tmp_path):
    path = _save_ckpt(tmp_path, "m0", 0)
    model, params, meta = load_single(path)
    assert meta["task_ids"] == ["a"]
    # fused: conv leaves have bias, no bn
    assert set(params["b0"].keys()) == {"w", "b"}
    out = model(params, jnp.zeros((1, 64, 64, 3)), Ctx(train=False))
    assert "a" in out


def test_attempt_load_ensemble(tmp_path):
    paths = [_save_ckpt(tmp_path, "m0", 0), _save_ckpt(tmp_path, "m1", 1)]
    ens, params, meta = attempt_load(paths)
    assert isinstance(ens, Ensemble) and params is None
    preds = ens(jnp.zeros((1, 64, 64, 3)))
    # two members: candidate axis doubled (2 * 84 anchors at 64px)
    assert preds["a"].shape == (1, 168, 6)
