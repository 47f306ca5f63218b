import numpy as np

from cerberusdet_tpu.ops.letterbox import letterbox_device, letterbox_host, letterbox_params
import pytest

pytestmark = pytest.mark.smoke  # fast core tier: pytest -m smoke


def test_params_square_to_square():
    (r, _), unpad, (dw, dh) = letterbox_params((480, 640), (640, 640))
    assert abs(r - 1.0) < 1e-9
    assert unpad == (640, 480)
    assert dw == 0 and dh == 80


def test_params_no_scaleup():
    (r, _), _, _ = letterbox_params((100, 100), (640, 640), scaleup=False)
    assert r == 1.0


def test_params_auto_stride():
    _, _, (dw, dh) = letterbox_params((480, 640), (640, 640), auto=True, stride=32)
    # 160 % 32 == 0 -> no pad in auto mode
    assert dh == 0.0


def test_host_letterbox_shape_and_pad():
    im = np.full((480, 640, 3), 200, np.uint8)
    out, ratio, (dw, dh) = letterbox_host(im, (640, 640))
    assert out.shape == (640, 640, 3)
    assert out[0, 0, 0] == 114  # pad
    assert out[320, 320, 0] == 200  # content


def test_device_matches_host_geometry():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (320, 480, 3), dtype=np.uint8)
    host, _, _ = letterbox_host(im, (640, 640))
    dev, _, _ = letterbox_device(jnp.asarray(im), (640, 640))
    dev = np.asarray(dev * 255.0)
    # same pad layout; interiors close (cv2 vs jax bilinear on upsample)
    assert dev.shape == host.shape
    pad_mask = np.all(host == 114, axis=-1)
    assert np.all(np.abs(dev[pad_mask] - 114) < 1e-3)
    diff = np.abs(dev[~pad_mask] - host[~pad_mask].astype(np.float32))
    assert np.median(diff) < 4.0
