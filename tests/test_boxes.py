import numpy as np
import jax.numpy as jnp

import pytest

from cerberusdet_tpu.ops import (
    bbox_iou,
    box_iou,
    bbox_ioa,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
    xywhn2xyxy,
    xyxy2xywhn,
)

pytestmark = pytest.mark.smoke  # fast core tier: pytest -m smoke


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    xywh = rng.uniform(10, 100, size=(32, 4)).astype(np.float32)
    back = xyxy2xywh(xywh2xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(np.asarray(back), xywh, rtol=1e-5, atol=1e-4)


def test_xywh2xyxy_known():
    out = np.asarray(xywh2xyxy(jnp.array([[10.0, 20.0, 4.0, 6.0]])))
    np.testing.assert_allclose(out, [[8, 17, 12, 23]])


def test_normalized_conversions():
    xywhn = jnp.array([[0.5, 0.5, 0.25, 0.5]])
    xyxy = xywhn2xyxy(xywhn, w=640, h=480)
    np.testing.assert_allclose(np.asarray(xyxy), [[240, 120, 400, 360]])
    back = xyxy2xywhn(xyxy, w=640, h=480)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xywhn), atol=1e-6)


def test_box_iou_identity_and_disjoint():
    a = jnp.array([[0.0, 0, 10, 10], [20, 20, 30, 30]])
    iou = np.asarray(box_iou(a, a))
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-5)
    assert iou[0, 1] == 0.0


def test_box_iou_half_overlap():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 5]])
    np.testing.assert_allclose(np.asarray(box_iou(a, b))[0, 0], 0.5, atol=1e-5)


def test_bbox_iou_ciou_penalty():
    # identical boxes: CIoU == IoU == 1
    a = jnp.array([5.0, 5.0, 4.0, 4.0])
    ciou = float(bbox_iou(a, a, xywh=True, CIoU=True))
    assert abs(ciou - 1.0) < 1e-5
    # shifted boxes: CIoU < IoU
    b = jnp.array([7.0, 5.0, 4.0, 4.0])
    iou = float(bbox_iou(a, b, xywh=True))
    ciou = float(bbox_iou(a, b, xywh=True, CIoU=True))
    assert ciou < iou


def test_bbox_ioa():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[5.0, 0, 15, 10]])
    np.testing.assert_allclose(np.asarray(bbox_ioa(a, b))[0, 0], 0.5, atol=1e-5)


def test_clip_and_scale_boxes():
    boxes = jnp.array([[-5.0, -5.0, 700.0, 500.0]])
    clipped = np.asarray(clip_boxes(boxes, (480, 640)))
    np.testing.assert_allclose(clipped, [[0, 0, 640, 480]])
    # 640-letterboxed image of a native 320x640: gain=1.0 (min(2,1)), pad=(0,160)
    scaled = np.asarray(scale_boxes((640, 640), jnp.array([[0.0, 160.0, 640.0, 480.0]]), (320, 640)))
    np.testing.assert_allclose(scaled, [[0, 0, 640, 320]])
