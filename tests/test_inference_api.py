import numpy as np
import jax
import pytest

from cerberusdet_tpu.infer import CerberusDetInference, CerberusPreprocessor, CerberusVisualizer
from cerberusdet_tpu.infer.inference import build_category_map
from cerberusdet_tpu.models.cerberus import CerberusModel


def test_category_map():
    cmap, all_names = build_category_map({"t1": ["a", "b"], "t2": ["x", "y", "z"]})
    assert cmap["t1"] == {0: 0, 1: 1}
    assert cmap["t2"] == {0: 2, 1: 3, 2: 4}
    assert all_names == ["a", "b", "x", "y", "z"]


def test_preprocessor_contract():
    pre = CerberusPreprocessor(img_size=128)
    imgs = [np.full((240, 320, 3), 200, np.uint8), np.full((100, 50, 3), 50, np.uint8)]
    batch, shapes = pre.preprocess(imgs)
    assert batch.shape == (2, 128, 128, 3) and batch.dtype == np.float32
    assert shapes == [(240, 320), (100, 50)]
    assert 0.0 <= batch.min() and batch.max() <= 1.0
    # pad zones are 114/255
    assert abs(batch[0, 0, 0, 0] - 114 / 255) < 1e-6


@pytest.fixture(scope="module")
def tiny_inference():
    model = CerberusModel("configs/models/yolov8n_2task.yaml", ["t1", "t2"], [2, 3])
    params = model.init(jax.random.PRNGKey(0))
    return CerberusDetInference(
        model=model, params=params,
        names={"t1": ["a", "b"], "t2": ["x", "y", "z"]},
        conf_thres=0.01, img_size=64, half=False,
    )


def test_predict_contract(tiny_inference):
    batch = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = tiny_inference.predict(batch, original_shape=[(320, 240), (100, 100)])
    assert isinstance(out, list) and len(out) == 2
    for image_results in out:
        for det in image_results:
            assert set(det) == {"box", "score", "label", "label_name", "task"}
            assert det["task"] in ("t1", "t2")
            assert 0 <= det["label"] < 5
            assert det["label_name"] == ["a", "b", "x", "y", "z"][det["label"]]
            assert len(det["box"]) == 4
            x1, y1, x2, y2 = det["box"]
            h, w = (320, 240) if image_results is out[0] else (100, 100)
            assert 0 <= x1 <= w and 0 <= y2 <= h
        # sorted by score descending
        scores = [d["score"] for d in image_results]
        assert scores == sorted(scores, reverse=True)


def test_predict_threshold_monotonic(tiny_inference):
    batch = np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    lo = tiny_inference.predict(batch, conf_thres=0.001)
    hi = tiny_inference.predict(batch, conf_thres=0.5)
    assert len(hi[0]) <= len(lo[0])


def test_visualizer_draws(tiny_inference):
    vis = CerberusVisualizer()
    im = np.zeros((100, 100, 3), np.uint8)
    dets = [
        {"box": [10, 10, 50, 50], "score": 0.9, "label": 0, "label_name": "a", "task": "t1"},
        {"box": [10, 10, 50, 50], "score": 0.8, "label": 2, "label_name": "x", "task": "t2"},
    ]
    out = vis.draw_detections(im, dets)
    assert out.shape == im.shape
    assert out.sum() > 0  # something drawn
    assert im.sum() == 0  # input untouched


def test_preprocess_device_matches_host():
    pre = CerberusPreprocessor(img_size=128)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8)
    host, shapes_h = pre.preprocess_host(list(imgs))
    dev, shapes_d = pre.preprocess_device(imgs)
    dev = np.asarray(dev)
    assert shapes_h == shapes_d
    assert dev.shape == host.shape
    # identical pad layout, close interiors (cv2 vs jax bilinear)
    pad = np.all(np.isclose(host, 114 / 255), axis=-1)
    assert np.allclose(dev[pad], 114 / 255, atol=1e-6)
    # random-noise images are the worst case for interpolation phase diffs
    assert np.median(np.abs(dev[~pad] - host[~pad])) < 0.05


def test_preprocess_routing():
    """Uniform batches go to the device path; ragged / auto / shape-overflow
    fall back to host cv2."""
    pre = CerberusPreprocessor(img_size=64)
    rng = np.random.default_rng(1)
    uniform = [rng.integers(0, 255, (48, 80, 3), dtype=np.uint8) for _ in range(3)]
    batch, _ = pre.preprocess(uniform)
    assert (48, 80) in pre._device_fns  # device path used
    assert not isinstance(batch, np.ndarray)  # device array

    ragged = [rng.integers(0, 255, (h, 80, 3), dtype=np.uint8) for h in (48, 56)]
    batch2, _ = pre.preprocess(ragged)
    assert isinstance(batch2, np.ndarray)  # host fallback

    # auto (stride-minimal padding) is host-only
    pre_auto = CerberusPreprocessor(img_size=64, auto=True)
    b3, _ = pre_auto.preprocess(uniform)
    assert isinstance(b3, np.ndarray)
    assert not pre_auto._device_fns

    # shape-cache overflow: new shapes beyond the cap run on host
    pre_cap = CerberusPreprocessor(img_size=64)
    for i, h in enumerate((40, 44, 52, 56, 60)):
        im = [rng.integers(0, 255, (h, 64, 3), dtype=np.uint8)]
        pre_cap.preprocess(im)
    assert len(pre_cap._device_fns) == 4  # MAX_DEVICE_SHAPES


def test_warmup_batch_compiles_served_shape():
    """A caller with a known serving batch (serve.py pads every batch to
    max_batch) warms THAT shape in the constructor: exactly one compiled
    program, and predicting at that batch adds no new compilation."""
    model = CerberusModel("configs/models/yolov8n_2task.yaml",
                         ["t1", "t2"], [2, 3])
    params = model.init(jax.random.PRNGKey(0))
    inf = CerberusDetInference(
        model=model, params=params,
        names={"t1": ["a", "b"], "t2": ["x", "y", "z"]},
        conf_thres=0.01, img_size=64, half=False, warmup_batch=3)
    assert inf._device_predict._cache_size() == 1
    batch = np.random.default_rng(0).uniform(
        0, 1, (3, 64, 64, 3)).astype(np.float32)
    inf.predict(batch)
    assert inf._device_predict._cache_size() == 1
