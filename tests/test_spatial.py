"""Spatial (H-axis) sharded inference == single-device inference, bit-exact
(parallel/spatial.py; GSPMD halo exchanges at conv shard boundaries)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx
from cerberusdet_tpu.parallel import (
    check_spatial_shape,
    make_spatial_forward,
    make_spatial_mesh,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = CerberusModel("configs/models/yolov8n_2task.yaml", ["a", "b"], [3, 5])
    return model, model.init(jax.random.PRNGKey(0))


def test_spatial_forward_exact(model_and_params):
    model, params = model_and_params
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 256, 3), jnp.float32)

    def fwd(params, img):
        out = model(params, img, Ctx(train=False, dtype=jnp.float32))
        return {t: pred for t, (pred, _f) in out.items()}

    ref = jax.jit(fwd)(params, img)
    mesh = make_spatial_mesh()
    run = make_spatial_forward(model, mesh, dtype=jnp.float32)
    out = run(params, img)
    assert set(out) == {"a", "b"}
    for t in ref:
        np.testing.assert_array_equal(np.asarray(ref[t]), np.asarray(out[t]))


def test_spatial_forward_task_subset(model_and_params):
    model, params = model_and_params
    img = jnp.zeros((1, 256, 256, 3), jnp.float32)
    run = make_spatial_forward(model, make_spatial_mesh(), tasks=["b"],
                               dtype=jnp.float32)
    out = run(params, img)
    assert list(out) == ["b"]


def test_spatial_shape_check(model_and_params):
    model, params = model_and_params
    check_spatial_shape(512, 8, 32)
    with pytest.raises(ValueError, match="divisible"):
        check_spatial_shape(320, 8, 32)  # 320 % 256 != 0
    run = make_spatial_forward(model, make_spatial_mesh(), dtype=jnp.float32)
    with pytest.raises(ValueError):
        run(params, jnp.zeros((1, 320, 256, 3), jnp.float32))


def test_data_spatial_2d_mesh_exact(model_and_params):
    """Batch (data) and height (sp) sharding compose on a 2-D mesh —
    bit-exact vs single-device."""
    from cerberusdet_tpu.parallel import make_data_spatial_mesh

    model, params = model_and_params
    img = jax.random.uniform(jax.random.PRNGKey(2), (4, 256, 256, 3), jnp.float32)

    def fwd(params, img):
        out = model(params, img, Ctx(train=False, dtype=jnp.float32))
        return {t: pred for t, (pred, _f) in out.items()}

    ref = jax.jit(fwd)(params, img)
    mesh = make_data_spatial_mesh(n_spatial=2)  # 4 x 2 over 8 devices
    run = make_spatial_forward(model, mesh, dtype=jnp.float32)
    out = run(params, img)
    for t in ref:
        np.testing.assert_array_equal(np.asarray(ref[t]), np.asarray(out[t]))
    with pytest.raises(ValueError, match="divisible"):
        run(params, jnp.zeros((3, 256, 256, 3), jnp.float32))  # 3 % 4 != 0
