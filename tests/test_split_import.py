"""Golden parity for SPLIT reference checkpoints (the released ckpt format):
run the reference's own sequential_split, import the resulting state dict,
and require per-task fp32 output parity — including the nested branch case."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from cerberusdet_tpu.manager.pt_import import import_state_dict, simulate_ref_split_chains
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx


def test_simulated_chains_match_reference_groundtruth():
    """Block-index assignment vs layouts read off the reference's controllers
    (see pt_import.simulate_ref_split_chains docstring)."""
    # 2-task split@2: originals serve task0; clones 15..24 serve task1
    chains = simulate_ref_split_chains([[2, [[13], [14]]]], 12, 2)
    assert chains[0] == list(range(1, 13))
    assert chains[1] == [1, 2] + list(range(15, 25))
    # nested README: c keeps originals; a,b share clones 16-19; b reclones 26-31
    chains = simulate_ref_split_chains([[2, [[15], [13, 14]]], [6, [[13], [14]]]], 12, 3)
    assert chains[2] == list(range(1, 13))
    assert chains[0] == [1, 2, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25]
    assert chains[1] == [1, 2, 16, 17, 18, 19, 26, 27, 28, 29, 30, 31]


@pytest.mark.slow
def test_split_checkpoint_golden_parity():
    from tests.ref_torch import load_reference_cerberusdet

    RefCerberusDet = load_reference_cerberusdet()
    if RefCerberusDet is None:
        pytest.skip("reference not importable")
    import torch

    cerber = [[2, [[15], [13, 14]]], [6, [[13], [14]]]]
    torch.manual_seed(0)
    ref = RefCerberusDet(
        task_ids=["a", "b", "c"], nc=[3, 4, 5],
        cfg="/root/reference/cerberusdet/models/yolov8x_voc_obj365.yaml",
        verbose=False,
    )
    ref.sequential_split(cerber, torch.device("cpu"))
    # randomize all weights so clones differ from originals (split deep-copies)
    with torch.no_grad():
        for i, p in enumerate(ref.parameters()):
            torch.manual_seed(1000 + i)
            p.add_(0.01 * torch.randn_like(p))
    ref = ref.float().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = yaml.safe_load(open("configs/models/yolov8x.yaml"))
    cfg["cerber"] = cerber
    model = CerberusModel(cfg, ["a", "b", "c"], [3, 4, 5])
    params = model.init(jax.random.PRNGKey(0))
    params = import_state_dict(model, params, sd)

    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = model(params, jnp.asarray(x), Ctx(train=False))
    for t in ("a", "b", "c"):
        r = ref_out[t]
        r = (r[0] if isinstance(r, (tuple, list)) else r).numpy().transpose(0, 2, 1)
        o = np.asarray(ours[t][0])
        # boxes: float noise through the DFL softmax-expectation decode can
        # reach ~0.1px on ~500px coords; scores stay tight
        np.testing.assert_allclose(o[..., :4], r[..., :4], atol=0.15, rtol=2e-4)
        np.testing.assert_allclose(o[..., 4:], r[..., 4:], atol=5e-4)
