"""Box geometry in pure jnp (works under jit, on host numpy arrays too via jnp).

Functional parity targets (reference, for behavior only):
  cerberusdet/utils/general.py:262-357 (coordinate conversions, scale/clip)
  cerberusdet/utils/metrics.py:373-470 (IoU family)

All functions take boxes with the coordinate quadruple in the LAST axis and
broadcast over leading axes, which keeps them trivially vectorizable on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(x):
    """(..., 4) center-x, center-y, w, h -> x1, y1, x2, y2."""
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x):
    """(..., 4) x1, y1, x2, y2 -> center-x, center-y, w, h."""
    p1, p2 = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(p1 + p2) * 0.5, p2 - p1], axis=-1)


def xywhn2xyxy(x, w: float = 640.0, h: float = 640.0, padw: float = 0.0, padh: float = 0.0):
    """Normalized xywh -> pixel xyxy (with optional mosaic pad offsets)."""
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    pad = jnp.asarray([padw, padh, padw, padh], dtype=x.dtype)
    return xywh2xyxy(x) * scale + pad


def xyxy2xywhn(x, w: float = 640.0, h: float = 640.0, clip: bool = False, eps: float = 0.0):
    """Pixel xyxy -> normalized xywh."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    return xyxy2xywh(x) / scale


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image bounds. shape = (height, width)."""
    h, w = shape[0], shape[1]
    lim = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(boxes, 0.0, lim)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Rescale xyxy boxes from letterboxed `img1_shape` (h, w) back to native
    `img0_shape` (h, w). Mirrors the reference contract (general.py:313-333)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    off = jnp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=boxes.dtype)
    boxes = (boxes - off) / gain
    return clip_boxes(boxes, img0_shape)


def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU of two xyxy box sets: (N, 4) x (M, 4) -> (N, M)."""
    a1, a2 = box1[..., :, None, :2], box1[..., :, None, 2:4]
    b1, b2 = box2[..., None, :, :2], box2[..., None, :, 2:4]
    inter_wh = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area1 = jnp.prod(box1[..., 2:4] - box1[..., :2], axis=-1)
    area2 = jnp.prod(box2[..., 2:4] - box2[..., :2], axis=-1)
    union = area1[..., :, None] + area2[..., None, :] - inter + eps
    return inter / union


def bbox_iou(box1, box2, xywh: bool = True, GIoU: bool = False, DIoU: bool = False,
             CIoU: bool = False, eps: float = 1e-7):
    """Elementwise IoU / GIoU / DIoU / CIoU of broadcastable box arrays (..., 4).

    Matches reference semantics (metrics.py:373-412) including the CIoU
    aspect-ratio term with a stop-gradient-free alpha (we follow the reference's
    `with torch.no_grad()` on alpha via lax.stop_gradient).
    """
    import jax

    if xywh:
        box1, box2 = xywh2xyxy(box1), xywh2xyxy(box2)
    b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0.0) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0.0
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # convex width
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # convex height
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if CIoU:
            v = (4 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = v / (v - iou + (1 + eps))
            alpha = jax.lax.stop_gradient(alpha)
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def bbox_ioa(box1, box2, eps: float = 1e-7):
    """Intersection over box2 area: (N, 4) x (M, 4) xyxy -> (N, M)."""
    a1, a2 = box1[:, None, :2], box1[:, None, 2:4]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:4]
    inter_wh = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area2 = jnp.prod(box2[:, 2:4] - box2[:, :2], axis=-1) + eps
    return inter / area2[None, :]


def wh_iou(wh1, wh2, eps: float = 1e-7):
    """Pairwise IoU of width-height pairs as if boxes share a corner."""
    wh1 = wh1[:, None]
    wh2 = wh2[None, :]
    inter = jnp.prod(jnp.minimum(wh1, wh2), axis=-1)
    return inter / (jnp.prod(wh1, axis=-1) + jnp.prod(wh2, axis=-1) - inter + eps)
