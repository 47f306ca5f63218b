"""Letterbox (aspect-preserving resize + gray padding) — host and device paths.

Behavioral parity target: cerberusdet/data/augmentations.py:59-89 (letterbox)
and cerberusdet/cerberusdet_preprocessor.py:42-74 (the inference preprocessing
contract: BGR HWC uint8 -> letterboxed RGB CHW float /255; ours is NHWC).

Host path uses cv2 (training data pipeline, CPU workers). Device path is pure
jax for the inference hot loop: resize+pad+normalize in one jitted graph that
XLA fuses; the batched version processes a uniform-shape batch on the TPU.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

PAD_VALUE = 114


def letterbox_params(shape: Tuple[int, int], new_shape: Tuple[int, int],
                     auto: bool = False, scale_fill: bool = False,
                     scaleup: bool = True, stride: int = 32):
    """Compute (ratio, unpadded_size, (dw, dh)) for letterboxing.

    shape: source (h, w). new_shape: target (h, w).
    `auto` pads only to stride multiples (minimal rectangle) like the
    reference's rect mode.
    """
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))  # (w, h)
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        r = (new_shape[1] / shape[1], new_shape[0] / shape[0])
        return r, new_unpad, (0.0, 0.0)
    return (r, r), new_unpad, (dw / 2, dh / 2)


def letterbox_host(im: np.ndarray, new_shape=(640, 640), color=(PAD_VALUE,) * 3,
                   auto: bool = False, scale_fill: bool = False, scaleup: bool = True,
                   stride: int = 32):
    """cv2 letterbox for the host data pipeline. im: HWC uint8.

    Returns (image, ratio, (dw, dh)) with the reference's rounding behavior
    (pad split with round(x - 0.1) / round(x + 0.1))."""
    import cv2

    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    shape = im.shape[:2]
    ratio, new_unpad, (dw, dh) = letterbox_params(shape, new_shape, auto, scale_fill, scaleup, stride)
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, ratio, (dw, dh)


def letterbox_device(im, new_shape=(640, 640), scaleup: bool = True):
    """Device letterbox for a single image with STATIC source shape.

    im: (H, W, 3) float or uint8 array (jnp). Returns (out (new_h, new_w, 3)
    float32 in [0, 1], ratio, (dw, dh)). Bilinear resize matches cv2
    INTER_LINEAR closely (half-pixel centers).
    """
    import jax
    import jax.numpy as jnp

    shape = im.shape[:2]
    ratio, new_unpad, (dw, dh) = letterbox_params(shape, new_shape, scaleup=scaleup)
    resized = jax.image.resize(im.astype(jnp.float32), (new_unpad[1], new_unpad[0], 3), "linear")
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    out = jnp.full((new_shape[0], new_shape[1], 3), float(PAD_VALUE), jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (top, left, 0))
    return out / 255.0, ratio, (dw, dh)
