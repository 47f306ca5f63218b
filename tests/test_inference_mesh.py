"""Multi-chip serving: the one-program inference pipeline under a
data-parallel mesh (CerberusDetInference(mesh=...)).

The reference has no serving-scale-out story at all (its
cerberusdet_inference.py is single-GPU); here GSPMD partitions the whole
forward+NMS+cross-task program over the mesh and the Pallas NMS kernel
carries its own batch-partitioning rule so no chip ever sees another
shard's candidates. Runs on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.infer import CerberusDetInference
from cerberusdet_tpu.ops.nms_pallas import greedy_nms_pallas
from cerberusdet_tpu.parallel.mesh import make_mesh


def test_nms_pallas_partitions_over_mesh():
    """Sharded kernel == unsharded kernel bitwise, with NO all-gather of the
    candidate set in the compiled HLO (the custom_partitioning rule)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    b, k = 8, 256
    xy = rng.uniform(0, 600, (b, k, 2)).astype(np.float32)
    wh = rng.uniform(4, 60, (b, k, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores = jnp.asarray(rng.uniform(0, 1, (b, k)).astype(np.float32))

    ref_idx, ref_val = greedy_nms_pallas(boxes, scores, 0.45, 50,
                                         interpret=True)

    mesh = make_mesh()
    sh = NamedSharding(mesh, P("data"))
    fn = jax.jit(lambda bx, sc: greedy_nms_pallas(bx, sc, 0.45, 50,
                                                  interpret=True))
    out_idx, out_val = fn(jax.device_put(boxes, sh),
                          jax.device_put(scores, sh))
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(out_idx))
    np.testing.assert_array_equal(np.asarray(ref_val), np.asarray(out_val))

    hlo = fn.lower(jax.device_put(boxes, sh),
                   jax.device_put(scores, sh)).compile().as_text()
    assert "all-gather" not in hlo, "NMS candidates were all-gathered"


@pytest.mark.slow
def test_inference_mesh_matches_single_device():
    """predict() over an 8-device mesh returns the same detection dicts as
    the single-device program (params replicated, batch sharded)."""
    model = CerberusModel("configs/models/yolov8n_2task.yaml",
                          ["t1", "t2"], [2, 3])
    params = model.init(jax.random.PRNGKey(0))
    names = {"t1": ["a", "b"], "t2": ["x", "y", "z"]}
    common = dict(model=model, params=params, names=names,
                  conf_thres=0.01, img_size=64, half=False)

    single = CerberusDetInference(**common)
    meshed = CerberusDetInference(**common, mesh=make_mesh())

    batch = np.random.default_rng(1).uniform(
        0, 1, (8, 64, 64, 3)).astype(np.float32)
    shapes = [(96, 128)] * 8
    a = single.predict(batch, original_shape=shapes)
    b = meshed.predict(batch, original_shape=shapes)
    assert len(a) == len(b) == 8
    for da, db in zip(a, b):
        assert len(da) == len(db)
        for ra, rb in zip(da, db):
            assert ra["task"] == rb["task"] and ra["label"] == rb["label"]
            np.testing.assert_allclose(ra["score"], rb["score"], rtol=1e-6)
            np.testing.assert_allclose(ra["box"], rb["box"], rtol=1e-5,
                                       atol=1e-3)
