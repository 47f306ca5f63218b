import cv2
import numpy as np
import jax
import pytest

from cerberusdet_tpu.data.loaders import create_dataloader
from cerberusdet_tpu.evaluation.val import run, run_task, scale_boxes_np
from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.train.loss import DetectionLoss


@pytest.fixture(scope="module")
def toy_val(tmp_path_factory):
    root = tmp_path_factory.mktemp("valtoy")
    img_dir = root / "images" / "val"
    lb_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(8):
        im = rng.integers(0, 255, (240, 320, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), im)
        (lb_dir / f"{i}.txt").write_text("0 0.5 0.5 0.3 0.3\n1 0.25 0.25 0.2 0.2")
    return str(img_dir)


def test_scale_boxes_np_roundtrip():
    # native 240x320 letterboxed to 128x128: gain 0.4, pad (0, 16)
    boxes = np.array([[10.0, 30.0, 100.0, 90.0]])
    out = scale_boxes_np((128, 128), boxes.copy(), (240, 320))
    gain = 128 / 320
    np.testing.assert_allclose(out[0, 0], 10 / gain, rtol=1e-5)
    np.testing.assert_allclose(out[0, 1], (30 - (128 - 240 * gain) / 2) / gain, rtol=1e-5)


def test_val_loop_smoke(toy_val):
    model = CerberusModel("configs/models/yolov8n.yaml", ["t1"], [2])
    params = model.init(jax.random.PRNGKey(0))
    _, loader = create_dataloader(toy_val, imgsz=128, batch_size=4, augment=False,
                                  shuffle=False, host_sharded=False, task="t1")
    out = run(
        model, params, {"t1": loader}, {"t1": 2},
        names_per_task={"t1": ["a", "b"]},
        losses={"t1": DetectionLoss(nc=2, strides=model.strides)},
    )
    r = out["t1"]
    mp, mr, map50, mAP, box_l, cls_l, dfl_l = r["results"]
    assert all(np.isfinite([mp, mr, map50, mAP, box_l, cls_l, dfl_l]))
    assert 0 <= mAP <= 1 and 0 <= r["fitness"] <= 1
    assert r["seen"] == 8
    assert r["maps"].shape == (2,)
    assert all(s >= 0 for s in r["speed"])


def test_val_single_cls(toy_val):
    """single_cls: agnostic NMS, predictions classless, 1-class metrics
    (val.py:197,285,318,339 semantics)."""
    model = CerberusModel("configs/models/yolov8n.yaml", ["t1"], [2])
    params = model.init(jax.random.PRNGKey(0))
    _, loader = create_dataloader(toy_val, imgsz=128, batch_size=4,
                                  augment=False, shuffle=False,
                                  host_sharded=False, task="t1_sc",
                                  single_cls=True)
    out = run_task(model, params, "t1", loader, nc=2, names=["a", "b"],
                   single_cls=True)
    m = out["metrics"]
    # metrics collapse to ONE class even though the model predicts two
    assert m.nc == 1
    assert all(c == 0 for c in m.ap_class_index)
    assert out["seen"] == 8
