"""Optimizer families vs torch reference semantics on a toy problem."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from cerberusdet_tpu.train.optim import SGDConfig, sgd_init, sgd_update

pytestmark = pytest.mark.smoke  # fast core tier: pytest -m smoke


def _toy_params():
    rng = np.random.default_rng(0)
    return {
        "w": rng.normal(0, 1, (4, 4)).astype(np.float32),   # group 0 (decayed)
        "bn": {"scale": np.ones(4, np.float32),             # group 1
               "bias": np.zeros(4, np.float32),             # group 2
               "mean": np.zeros(4, np.float32),             # group -1 (stats)
               "var": np.ones(4, np.float32)},
    }


def _toy_grads():
    rng = np.random.default_rng(1)
    return {
        "w": rng.normal(0, 0.1, (4, 4)).astype(np.float32),
        "bn": {"scale": rng.normal(0, 0.1, 4).astype(np.float32),
               "bias": rng.normal(0, 0.1, 4).astype(np.float32),
               "mean": np.zeros(4, np.float32),
               "var": np.zeros(4, np.float32)},
    }


def _torch_reference(name, params_np, grads_np, lr, momentum, wd, steps):
    w = torch.nn.Parameter(torch.from_numpy(params_np["w"].copy()))
    scale = torch.nn.Parameter(torch.from_numpy(params_np["bn"]["scale"].copy()))
    bias = torch.nn.Parameter(torch.from_numpy(params_np["bn"]["bias"].copy()))
    groups = [
        {"params": [w], "weight_decay": wd},
        {"params": [scale], "weight_decay": 0.0},
        {"params": [bias], "weight_decay": 0.0},
    ]
    if name == "SGD":
        opt = torch.optim.SGD(groups, lr=lr, momentum=momentum, nesterov=True)
    elif name == "Adam":
        opt = torch.optim.Adam(groups, lr=lr, betas=(momentum, 0.999))
    elif name == "AdamW":
        opt = torch.optim.AdamW(groups, lr=lr, betas=(momentum, 0.999))
    else:
        opt = torch.optim.RMSprop(groups, lr=lr, momentum=momentum)
    for _ in range(steps):
        w.grad = torch.from_numpy(grads_np["w"].copy())
        scale.grad = torch.from_numpy(grads_np["bn"]["scale"].copy())
        bias.grad = torch.from_numpy(grads_np["bn"]["bias"].copy())
        opt.step()
    return w.detach().numpy(), scale.detach().numpy(), bias.detach().numpy()


@pytest.mark.parametrize("name", ["SGD", "Adam", "AdamW", "RMSProp"])
def test_optimizer_matches_torch(name):
    from cerberusdet_tpu.train.optim import build_group_tree

    lr, momentum, wd, steps = 0.01, 0.9, 0.0005, 3
    params_np = _toy_params()
    grads_np = _toy_grads()
    params = {"w": jnp.asarray(params_np["w"]),
              "bn": {k: jnp.asarray(v) for k, v in params_np["bn"].items()}}
    grads = {"w": jnp.asarray(grads_np["w"]),
             "bn": {k: jnp.asarray(v) for k, v in grads_np["bn"].items()}}
    cfg = SGDConfig(weight_decay=wd, name=name)
    groups = build_group_tree(params)
    state = sgd_init(params, cfg)
    lrs = np.full(3, lr, np.float32)
    for _ in range(3):
        params, state = sgd_update(cfg, groups, params, grads, state, lrs, momentum)
    rw, rs, rb = _torch_reference(name, params_np, grads_np, lr, momentum, wd, steps)
    np.testing.assert_allclose(np.asarray(params["w"]), rw, atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["bn"]["scale"]), rs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["bn"]["bias"]), rb, atol=1e-5)
    # running stats untouched
    np.testing.assert_array_equal(np.asarray(params["bn"]["mean"]),
                                  params_np["bn"]["mean"])
