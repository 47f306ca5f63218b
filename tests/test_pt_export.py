"""Checkpoint EXPORT to the reference's torch format (manager/pt_export.py).

Two gates:
  * pure round-trip: export -> import reproduces the source tree bit-exactly;
  * GOLDEN: the reference's OWN torch CerberusDet (built and split by its
    real code) loads our exported state dict with strict=True and produces
    matching fp32 outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusdet_tpu.manager.pt_export import export_pt, export_state_dict
from cerberusdet_tpu.manager.pt_import import import_state_dict, load_torch_state_dict
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx


def _tree_leaves_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_leaves_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}")


def test_export_import_roundtrip_bitexact():
    model = CerberusModel("configs/models/yolov8n_2task.yaml", ["a", "b"], [3, 5])
    params = model.init(jax.random.PRNGKey(3))
    sd = export_state_dict(model, params)
    # split layout: clone blocks appear beyond the head slots
    n_neck = len(model.parsed.nodes) - model.n_backbone
    max_idx = max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    assert max_idx > n_neck + 2
    fresh = model.init(jax.random.PRNGKey(99))
    back = import_state_dict(model, fresh, sd)
    _tree_leaves_equal(params, back)


def test_export_pt_file_roundtrip(tmp_path):
    model = CerberusModel("configs/models/yolov8n.yaml", ["t"], [2])
    params = model.init(jax.random.PRNGKey(1))
    p = tmp_path / "exported.pt"
    export_pt(model, params, p)
    sd = load_torch_state_dict(str(p))
    back = import_state_dict(model, model.init(jax.random.PRNGKey(7)), sd)
    _tree_leaves_equal(params, back)


def test_golden_reference_loads_export_strict():
    """The real reference model consumes our export with strict=True and
    computes the same outputs."""
    from tests.ref_torch import load_reference_cerberusdet

    RefCerberusDet = load_reference_cerberusdet()
    if RefCerberusDet is None:
        pytest.skip("reference torch model not importable")
    import torch

    model = CerberusModel("configs/models/yolov8x_2task.yaml", ["a", "b"], [3, 5])
    params = model.init(jax.random.PRNGKey(0))
    sd = export_state_dict(model, params)

    torch.manual_seed(0)
    ref = RefCerberusDet(
        task_ids=["a", "b"], nc=[3, 5],
        cfg="/root/reference/cerberusdet/models/yolov8x_voc_obj365.yaml",
        verbose=False,
    ).float()
    cerber = ref.yaml.get("cerber")
    if cerber:
        ref.sequential_split(cerber, torch.device("cpu"))
    ref = ref.float().eval()

    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected[:10]
    assert not missing, missing[:10]

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = model(params, jnp.asarray(x), Ctx(train=False))
    for t in ("a", "b"):
        r = ref_out[t]
        r = r[0] if isinstance(r, (tuple, list)) else r
        r = r.numpy().transpose(0, 2, 1)
        o = np.asarray(ours[t][0])
        assert o.shape == r.shape
        np.testing.assert_allclose(o[..., :4], r[..., :4], atol=2e-2, rtol=1e-4)
        np.testing.assert_allclose(o[..., 4:], r[..., 4:], atol=2e-4)
