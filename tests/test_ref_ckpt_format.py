"""End-to-end import of a GENUINE reference-format checkpoint (VERDICT round-1
Missing #3): the reference pickles whole nn.Module objects into its ckpts
(cerberusdet/utils/models_manager.py:296-308, attempt_load relies on it at
experimental.py:112-122). Here we build the actual reference torch model,
take a real optimizer step, save a checkpoint shaped exactly like the
reference's save_model output (module-pickled, fp16, ema included), and
import it through our pipeline WITHOUT the reference's source code — the
shim unpickler must reconstruct the state dict from the pickled object graph.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cerberusdet_tpu.manager.pt_import import import_pt, load_torch_state_dict
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx


def _build_trained_ref_ckpt(tmp_path):
    """Reference model + one real SGD step + module-pickled ckpt file."""
    from tests.ref_torch import load_reference_cerberusdet

    RefCerberusDet = load_reference_cerberusdet()
    if RefCerberusDet is None:
        pytest.skip("reference torch model not importable")
    import copy

    import torch

    torch.manual_seed(0)
    ref = RefCerberusDet(
        task_ids=["a", "b"], nc=[3, 5],
        cfg="/root/reference/cerberusdet/models/yolov8x_voc_obj365.yaml",
        verbose=False,
    ).float()

    # a real training step: BN running stats move, weights move off init
    ref.train()
    opt = torch.optim.SGD(ref.parameters(), lr=1e-3)
    x = torch.rand(2, 3, 64, 64)
    out = ref(x)
    loss = sum(sum(o.float().square().mean() for o in outs) for outs in out.values())
    loss.backward()
    opt.step()
    ref.zero_grad(set_to_none=True)
    # the reference forward caches branch-point activations on the module
    # (cerberus.py rep_tensors) — clear them or deepcopy/pickle chokes on
    # non-leaf tensors
    for attr in ("rep_tensors", "middle_outputs"):
        if hasattr(ref, attr):
            setattr(ref, attr, {})
    ref = ref.float().eval()

    # EMA slightly different from model — import must prefer it
    ema = copy.deepcopy(ref)
    with torch.no_grad():
        for p in ema.parameters():
            p.add_(1e-3 * torch.randn_like(p))

    # the reference's ckpt dict shape (models_manager.py:296-308): whole
    # modules pickled, half precision
    ckpt = {
        "epoch": 0,
        "best_fitness_per_task": {"a": [0.0], "b": [0.0]},
        "best_fitness": [0.0],
        "training_results": "",
        "model": copy.deepcopy(ref).half(),
        "ema": copy.deepcopy(ema).half(),
        "updates": 1,
        "optimizer": opt.state_dict(),
    }
    path = tmp_path / "last.pt"
    torch.save(ckpt, path)
    return path, ema


@pytest.mark.slow
def test_module_pickled_ckpt_imports_without_reference_code(tmp_path):
    import torch

    path, ema = _build_trained_ref_ckpt(tmp_path)

    # 1) the shim path engages (weights_only=True cannot load module pickles)
    with pytest.raises(Exception):
        torch.load(path, map_location="cpu", weights_only=True)

    sd = load_torch_state_dict(path)
    ref_sd = {k: v.float().numpy() for k, v in ema.state_dict().items()}
    assert set(sd) == set(ref_sd)
    # 2) EMA preferred over model, fp16 round trip exact at fp16 resolution
    for k in list(ref_sd)[:50]:
        np.testing.assert_allclose(
            sd[k], ref_sd[k].astype(np.float16).astype(np.float32), atol=0, rtol=0,
            err_msg=k)

    # 3) golden forward parity from the FILE (not an in-process state dict)
    model = CerberusModel("configs/models/yolov8x_2task.yaml", ["a", "b"], [3, 5])
    params = model.init(jax.random.PRNGKey(0))
    params = import_pt(model, params, path)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    ema_f = ema.float().eval()
    with torch.no_grad():
        ref_out = ema_f(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = model(params, jnp.asarray(x), Ctx(train=False))
    for t in ("a", "b"):
        r = ref_out[t]
        r = r[0] if isinstance(r, (tuple, list)) else r
        r = r.numpy().transpose(0, 2, 1)
        o = np.asarray(ours[t][0])
        assert o.shape == r.shape
        # fp16 ckpt quantization loosens the tolerance vs the fp32 golden test
        np.testing.assert_allclose(o[..., :4], r[..., :4], atol=8e-2, rtol=1e-3)
        np.testing.assert_allclose(o[..., 4:], r[..., 4:], atol=2e-3)
