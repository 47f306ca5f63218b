import numpy as np
import jax.numpy as jnp

from cerberusdet_tpu.ops import bbox2dist, dist2bbox, dfl_expectation, make_anchors
import pytest

pytestmark = pytest.mark.smoke  # fast core tier: pytest -m smoke


def test_make_anchors_shapes_and_values():
    pts, strides = make_anchors([(4, 4), (2, 2)], [8, 16])
    assert pts.shape == (20, 2) and strides.shape == (20, 1)
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(pts[1]), [1.5, 0.5])  # x fastest
    np.testing.assert_allclose(np.asarray(pts[4]), [0.5, 1.5])
    assert float(strides[0, 0]) == 8 and float(strides[16, 0]) == 16


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = jnp.array([[4.0, 4.0], [10.0, 2.0]])
    dist = jnp.array([[1.0, 2.0, 3.0, 2.5], [0.5, 0.5, 0.5, 0.5]])
    xyxy = dist2bbox(dist, anchors, xywh=False)
    np.testing.assert_allclose(np.asarray(xyxy[0]), [3.0, 2.0, 7.0, 6.5])
    back = bbox2dist(anchors, xyxy, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-6)


def test_dist2bbox_xywh():
    anchors = jnp.array([[4.0, 4.0]])
    dist = jnp.array([[2.0, 2.0, 2.0, 2.0]])
    xywh = dist2bbox(dist, anchors, xywh=True)
    np.testing.assert_allclose(np.asarray(xywh[0]), [4.0, 4.0, 4.0, 4.0])


def test_dfl_expectation_peaked():
    # one-hot-ish logits at bin 7 for all four sides -> expectation ~= 7
    logits = np.full((1, 4, 16), -20.0, np.float32)
    logits[..., 7] = 20.0
    out = dfl_expectation(jnp.asarray(logits.reshape(1, 64)))
    np.testing.assert_allclose(np.asarray(out), np.full((1, 4), 7.0), atol=1e-3)


def test_dfl_expectation_uniform():
    out = dfl_expectation(jnp.zeros((2, 64)))
    np.testing.assert_allclose(np.asarray(out), np.full((2, 4), 7.5), atol=1e-5)
