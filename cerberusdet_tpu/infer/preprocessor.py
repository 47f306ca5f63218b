"""Public preprocessing API: BGR ndarrays -> letterboxed NHWC batch.

Behavioral parity target: cerberusdet/cerberusdet_preprocessor.py:12-74
(letterbox each BGR image, BGR->RGB, stack, normalize /255). Output layout is
NHWC float32 in [0, 1] (TPU-native) instead of CHW torch tensors.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np

from cerberusdet_tpu.ops.letterbox import letterbox_host


class CerberusPreprocessor:
    def __init__(self, img_size: Union[int, Tuple[int, int]] = 640, stride: int = 32,
                 auto: bool = False):
        self.img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        self.stride = stride
        self.auto = auto

    def preprocess(self, images: Sequence[np.ndarray]):
        """images: list of HWC BGR uint8 ndarrays (the cv2 convention).

        Returns (batch (B, H, W, 3) float32 in [0,1] RGB, original_shapes
        [(h, w), ...]). Feed the batch to CerberusDetInference.predict.
        """
        out: List[np.ndarray] = []
        shapes: List[Tuple[int, int]] = []
        for im in images:
            shapes.append(im.shape[:2])
            lb, _, _ = letterbox_host(im, self.img_size, auto=self.auto, stride=self.stride)
            out.append(lb[..., ::-1])  # BGR -> RGB
        batch = np.ascontiguousarray(np.stack(out)).astype(np.float32) / 255.0
        return batch, shapes
