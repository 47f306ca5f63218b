"""Public preprocessing API: BGR ndarrays -> letterboxed NHWC batch.

Behavioral parity target: cerberusdet/cerberusdet_preprocessor.py:12-74
(letterbox each BGR image, BGR->RGB, stack, normalize /255). Output layout is
NHWC float32 in [0, 1] (TPU-native) instead of CHW torch tensors.

Hot path: uniform-shape inputs (video frames, batched serving) route through
ONE jitted device program (resize+pad+normalize fused by XLA, single H2D copy
of the uint8 batch). Ragged inputs fall back to per-image host cv2. The
device resize is bilinear with half-pixel centers — it matches cv2
INTER_LINEAR to ~1/255; golden-parity tests pin the host path.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

from cerberusdet_tpu.ops.letterbox import letterbox_host

# compile a device letterbox for at most this many distinct source shapes;
# beyond that (a folder of arbitrary photos) the host path is cheaper than
# recompiling
MAX_DEVICE_SHAPES = 4


class CerberusPreprocessor:
    def __init__(self, img_size: Union[int, Tuple[int, int]] = 640, stride: int = 32,
                 auto: bool = False, prefer_device: bool = True):
        self.img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        self.stride = stride
        self.auto = auto
        self.prefer_device = prefer_device
        self._device_fns: Dict[Tuple[int, int], object] = {}

    def preprocess(self, images: Sequence[np.ndarray]):
        """images: list of HWC BGR uint8 ndarrays (the cv2 convention).

        Returns (batch (B, H, W, 3) float32 in [0,1] RGB, original_shapes
        [(h, w), ...]). Feed the batch to CerberusDetInference.predict.
        Uniform-shape inputs run on device (one fused jitted program);
        ragged inputs letterbox on host.
        """
        shapes = [im.shape[:2] for im in images]
        if (self.prefer_device and not self.auto and len(set(shapes)) == 1
                and (shapes[0] in self._device_fns
                     or len(self._device_fns) < MAX_DEVICE_SHAPES)):
            return self.preprocess_device(np.stack(images))
        return self.preprocess_host(images)

    def preprocess_host(self, images: Sequence[np.ndarray]):
        """Per-image cv2 letterbox (the reference's exact arithmetic)."""
        out: List[np.ndarray] = []
        shapes: List[Tuple[int, int]] = []
        for im in images:
            shapes.append(im.shape[:2])
            lb, _, _ = letterbox_host(im, self.img_size, auto=self.auto, stride=self.stride)
            out.append(lb[..., ::-1])  # BGR -> RGB
        batch = np.ascontiguousarray(np.stack(out)).astype(np.float32) / 255.0
        return batch, shapes

    def preprocess_device(self, images: np.ndarray):
        """Device-side batched letterbox for UNIFORM-shape inputs (e.g. video
        frames): one jitted resize+pad+normalize on the TPU, fused by XLA —
        the inference-hot-path replacement for per-image host cv2 work.

        images: (B, H, W, 3) uint8 BGR. Returns (batch (B, th, tw, 3) float32
        RGB in [0,1] on device, original_shapes list).
        """
        import jax

        b, h, w, _ = images.shape
        fn = self._device_fn(h, w)
        batch = fn(jax.numpy.asarray(images))
        return batch, [(h, w)] * b

    def _device_fn(self, h: int, w: int):
        """Jitted letterbox compiled once per source shape (cached)."""
        key = (h, w)
        fn = self._device_fns.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        from cerberusdet_tpu.ops.letterbox import PAD_VALUE, letterbox_params

        th, tw = self.img_size
        ratio, new_unpad, (dw, dh) = letterbox_params((h, w), (th, tw))
        top, left = int(round(dh - 0.1)), int(round(dw - 0.1))

        @jax.jit
        def run(imgs):
            x = imgs[..., ::-1].astype(jnp.float32)  # BGR -> RGB
            x = jax.image.resize(x, (imgs.shape[0], new_unpad[1], new_unpad[0], 3),
                                 "linear")
            out = jnp.full((imgs.shape[0], th, tw, 3), float(PAD_VALUE), jnp.float32)
            out = jax.lax.dynamic_update_slice(out, x, (0, top, left, 0))
            return out / 255.0

        self._device_fns[key] = run
        return run
