"""Direct contract test for the single-task wrapper (reference
yolo_wrapper.py:125-260: from_pretrained + predict returning per-image
{box, score, label, label_name} dicts WITHOUT the multi-task 'task' key)."""

import numpy as np
import jax
import pytest

from cerberusdet_tpu.infer.yolo_wrapper import YOLOV8ForObjectDetection
from cerberusdet_tpu.manager.checkpoint import save_checkpoint
from cerberusdet_tpu.models.cerberus import CerberusModel


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wrapper")
    model = CerberusModel("configs/models/yolov8n.yaml", ["detect"], [3])
    params = model.init(jax.random.PRNGKey(0))
    meta = {"cfg": "configs/models/yolov8n.yaml", "task_ids": ["detect"],
            "nc": [3], "names": [["cat", "dog", "bird"]], "epoch": 0}
    p = tmp / "single.ckpt.npz"
    save_checkpoint(p, params, meta)
    return str(p)


def test_from_pretrained_and_predict_contract(ckpt):
    y = YOLOV8ForObjectDetection.from_pretrained(
        ckpt, img_size=64, conf_thres=0.0001, half=False)
    assert y.names == ["cat", "dog", "bird"]
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    out = y.predict(img)
    assert isinstance(out, list) and len(out) == 1
    for det in out[0]:
        assert set(det) == {"box", "score", "label", "label_name"}  # no 'task'
        assert det["label_name"] in y.names
        x1, y1, x2, y2 = det["box"]
        assert 0 <= x1 <= x2 <= 128 and 0 <= y1 <= y2 <= 96

    # list input and per-call threshold override
    out2 = y.predict([img, img], conf_thres=0.9999)
    assert len(out2) == 2 and all(len(o) == 0 for o in out2)


def test_pt_weights_require_nc_or_names(ckpt):
    with pytest.raises(ValueError):
        YOLOV8ForObjectDetection.from_pretrained("weights.pt")
