"""Anchor-free grid machinery for YOLOv8-style heads (pure jnp, static shapes).

Behavioral parity targets: cerberusdet/utils/tal.py:181-211 (make_anchors,
dist2bbox, bbox2dist) and cerberusdet/models/yolo.py:48-60 (DFL decode).

TPU notes: anchor tables are compile-time constants for a fixed image size, so
they fold into the XLA graph; the DFL expectation is expressed as a softmax +
matmul that XLA fuses into the head's epilogue.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def make_anchors(feat_shapes: Sequence[Tuple[int, int]], strides: Sequence[float],
                 grid_cell_offset: float = 0.5, dtype=jnp.float32):
    """Build anchor center points and per-anchor stride tensor.

    Args:
      feat_shapes: [(H_i, W_i)] per FPN level (static).
      strides: stride per level.
    Returns:
      anchor_points: (sum HW, 2) cell-center coordinates in feature units.
      stride_tensor: (sum HW, 1).
    """
    points, stride_out = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = (jnp.arange(w, dtype=dtype) + grid_cell_offset)
        sy = (jnp.arange(h, dtype=dtype) + grid_cell_offset)
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        stride_out.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(points, axis=0), jnp.concatenate(stride_out, axis=0)


def dist2bbox(distance, anchor_points, xywh: bool = True, axis: int = -1):
    """Decode (left, top, right, bottom) distances to boxes around anchors."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points, bbox, reg_max: float):
    """Encode xyxy boxes to (l, t, r, b) distances, clamped to reg_max-ish."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(dist, 0.0, reg_max - 0.01)


def dfl_expectation(distri, reg_max: int = 16):
    """Distribution Focal Loss decode: softmax over reg_max bins -> expectation.

    Args:
      distri: (..., 4 * reg_max) raw logits, bin-major per side
              (i.e. reshapeable to (..., 4, reg_max)).
    Returns: (..., 4) expected distances.
    """
    shape = distri.shape[:-1]
    x = distri.reshape(*shape, 4, reg_max)
    proj = jnp.arange(reg_max, dtype=x.dtype)
    return jnp.einsum("...r,r->...", jax.nn.softmax(x, axis=-1), proj)
