"""Capstone end-to-end test: the full pipeline (data -> augmentation ->
TAL/loss -> gradient-averaging step -> EMA -> val -> NMS -> mAP) LEARNS a
synthetic detection task from scratch to high fitness."""

import numpy as np
import cv2
import pytest
import yaml

from cerberusdet_tpu.train.trainer import TrainLoop, TrainOptions


@pytest.mark.slow
def test_pipeline_learns_synthetic_detection(tmp_path):
    rng = np.random.default_rng(0)
    for split, n in (("train", 24), ("val", 8)):
        img_dir = tmp_path / "images" / split
        lb_dir = tmp_path / "labels" / split
        img_dir.mkdir(parents=True)
        lb_dir.mkdir(parents=True)
        for i in range(n):
            im = np.full((96, 96, 3), 40, np.uint8)
            cx, cy = rng.uniform(0.35, 0.65, 2)
            w = h = 0.4
            c = int(rng.integers(0, 2))
            x1, y1 = int((cx - w / 2) * 96), int((cy - h / 2) * 96)
            x2, y2 = int((cx + w / 2) * 96), int((cy + h / 2) * 96)
            im[y1:y2, x1:x2] = (200, 30, 30) if c == 0 else (30, 200, 30)
            cv2.imwrite(str(img_dir / f"{i}.jpg"), im)
            (lb_dir / f"{i}.txt").write_text(f"{c} {cx:.4f} {cy:.4f} {w} {h}")

    data = {"train": [str(tmp_path / "images" / "train")],
            "val": [str(tmp_path / "images" / "val")],
            "nc": [2], "names": [["red", "green"]], "task_ids": ["toy"]}
    hyp = yaml.safe_load(open("configs/hyps/hyp.cerber-default.yaml"))
    hyp.update(dict(mosaic=0.0, mixup=0.0, scale=0.0, translate=0.0, fliplr=0.0,
                    warmup_epochs=1.0, lr0=0.02, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0))
    opt = TrainOptions(cfg="configs/models/yolov8n.yaml", epochs=40, batch_size=8,
                       imgsz=64, project=str(tmp_path / "runs"), name="exp",
                       noval=True, patience=200, max_labels=4, plots=False)
    loop = TrainLoop(opt, data, hyp)
    loop.nw = 20  # ~120 total iterations: drop the 1000-iteration warmup floor
    first = None
    for epoch in range(40):
        mloss = loop.train_epoch(epoch)
        if first is None:
            first = mloss["toy"].sum()
    final_loss = mloss["toy"].sum()
    assert final_loss < 0.6 * first, (first, final_loss)
    fi = loop.val_epoch(39)
    # 60 epochs reach ~0.99 fitness; at 40 epochs ~0.47 — the bar asserts
    # unambiguous learning (random init scores 0.0)
    assert fi > 0.25, fi
