"""GOLDEN 3-task parity vs the reference, including its REAL sequential_split:
the reference model is split with its own deepcopy/rewire machinery
(cerberus.py:704-737), its split-layout state dict (clone blocks appended
after the heads) is imported through our split-chain mapping, and all three
heads must produce matching fp32 outputs. Covers the published 3-task config
(yolov8x_voc_obj365_animals_tableware.yaml: cerber [[2, [[13],[14],[15]]]])."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cerberusdet_tpu.manager.pt_import import import_state_dict
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx

REF_CFG = "/root/reference/cerberusdet/models/yolov8x_voc_obj365_animals_tableware.yaml"


@pytest.mark.slow
def test_golden_3task_split_forward_parity():
    from tests.ref_torch import load_reference_cerberusdet

    RefCerberusDet = load_reference_cerberusdet()
    if RefCerberusDet is None:
        pytest.skip("reference torch model not importable")
    import torch

    torch.manual_seed(0)
    tasks, ncs = ["va", "vb", "vc"], [3, 5, 4]
    ref = RefCerberusDet(task_ids=tasks, nc=ncs, cfg=REF_CFG,
                         verbose=False).float().eval()
    # the reference's own split (models_manager.py:208-215 does exactly this)
    import yaml

    cerber = yaml.safe_load(open(REF_CFG))["cerber"]
    ref.sequential_split(cerber, torch.device("cpu"))
    ref = ref.float().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    # split layout: clone blocks appended beyond the heads' slots
    max_block = max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    assert max_block > 15 + 3, "reference split produced no clone blocks?"

    model = CerberusModel("configs/models/yolov8x_3task.yaml", tasks, ncs)
    params = model.init(jax.random.PRNGKey(0))
    params = import_state_dict(model, params, sd)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = model(params, jnp.asarray(x), Ctx(train=False))
    for t in tasks:
        r = ref_out[t]
        r = r[0] if isinstance(r, (tuple, list)) else r
        r = r.numpy().transpose(0, 2, 1)
        o = np.asarray(ours[t][0])
        assert o.shape == r.shape, (t, o.shape, r.shape)
        np.testing.assert_allclose(o[..., :4], r[..., :4], atol=2e-2, rtol=1e-4,
                                   err_msg=t)
        np.testing.assert_allclose(o[..., 4:], r[..., 4:], atol=2e-4, err_msg=t)


@pytest.mark.slow
def test_3task_branches_diverge_after_split_point():
    """After the split, per-branch weights are independent: perturbing one
    branch's clone changes ONLY that task's output (the sharing boundary is
    at neck layer 2 per the cerber schedule)."""
    tasks, ncs = ["va", "vb", "vc"], [3, 5, 4]
    model = CerberusModel("configs/models/yolov8x_3task.yaml", tasks, ncs)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    base = {t: np.asarray(p) for t, (p, _) in
            model(params, x, Ctx(train=False)).items()}

    # find a block owned exclusively by task vb (a clone past the shared prefix)
    vb_uids = {s.uid for s in model.plan(["vb"]) if s.task is None}
    shared = set(model.shared_uids())
    vb_only = sorted(vb_uids - shared - {s.uid for s in model.plan(["va"])}
                     - {s.uid for s in model.plan(["vc"])})
    assert vb_only, "no vb-exclusive blocks — split did not branch"
    uid = vb_only[0]
    p2 = dict(params)
    p2[uid] = jax.tree_util.tree_map(lambda a: a + 0.05, params[uid])
    out2 = {t: np.asarray(p) for t, (p, _) in
            model(p2, x, Ctx(train=False)).items()}
    assert not np.allclose(out2["vb"], base["vb"])
    np.testing.assert_array_equal(out2["va"], base["va"])
    np.testing.assert_array_equal(out2["vc"], base["vc"])
