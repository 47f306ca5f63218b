"""Rect (aspect-grouped) validation protocol parity (reference val.py:231-246:
rect=True, pad=0.5): batches letterbox to per-batch stride-multiple shapes,
and the box geometry round-trips exactly back to native image space."""

import numpy as np
import cv2

from cerberusdet_tpu.data.loaders import DataLoader, create_dataloader
from cerberusdet_tpu.evaluation.val import scale_boxes_np


def make_mixed_aspect_dataset(tmp_path, n=10):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images" / "val"
    lb_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    shapes = []
    for i in range(n):
        h = int(rng.integers(60, 200))
        w = int(rng.integers(60, 200))
        im = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), im)
        (lb_dir / f"{i}.txt").write_text(f"{i % 2} 0.5 0.5 0.5 0.25")
        shapes.append((h, w))
    return str(img_dir), shapes


def test_rect_batches_have_per_batch_shapes(tmp_path):
    path, _ = make_mixed_aspect_dataset(tmp_path)
    ds, loader = create_dataloader(
        path, imgsz=64, batch_size=4, augment=False, shuffle=False,
        rect=True, pad=0.5, task="t", cache_dir=str(tmp_path),
        host_sharded=False)
    assert ds.batch_shapes is not None
    got = []
    for bi, batch in enumerate(loader):
        h, w = batch["img"].shape[1:3]
        # every image in the batch letterboxed to this batch's shape
        assert (h, w) == tuple(ds.batch_shapes[bi])
        assert h % 32 == 0 and w % 32 == 0
        got.append((h, w))
    # mixed aspects produce more than one batch shape
    assert len(set(got)) > 1


def test_rect_box_geometry_roundtrip(tmp_path):
    """GT xywhn -> rect-letterbox pixels -> scale_boxes back == native boxes
    (the exact transform run_task applies before matching)."""
    path, shapes = make_mixed_aspect_dataset(tmp_path)
    ds, loader = create_dataloader(
        path, imgsz=64, batch_size=4, augment=False, shuffle=False,
        rect=True, pad=0.5, task="t2", cache_dir=str(tmp_path),
        host_sharded=False)
    checked = 0
    for batch in loader:
        h, w = batch["img"].shape[1:3]
        for si in range(len(batch["img"])):
            meta = batch["meta"][si]
            m = batch["mask"][si]
            if not m.any():
                continue
            xywhn = batch["bboxes"][si][m]
            tbox = np.empty((len(xywhn), 4), np.float32)
            tbox[:, 0] = (xywhn[:, 0] - xywhn[:, 2] / 2) * w
            tbox[:, 1] = (xywhn[:, 1] - xywhn[:, 3] / 2) * h
            tbox[:, 2] = (xywhn[:, 0] + xywhn[:, 2] / 2) * w
            tbox[:, 3] = (xywhn[:, 1] + xywhn[:, 3] / 2) * h
            ori = meta["ori_shape"]
            native = scale_boxes_np((h, w), tbox, ori, meta["shapes"][1])
            h0, w0 = ori
            expect = np.array([[0.25 * w0, 0.375 * h0, 0.75 * w0, 0.625 * h0]])
            # y is exact; x carries the single-gain convention's truncation
            # error (scale_boxes uses ratio_pad[0][0] for BOTH axes, exactly
            # like the reference general.py:313-333 + datasets.py:382 —
            # bounded by the load_image int() rounding, ~1px per 30px)
            np.testing.assert_allclose(native[:, [1, 3]], expect[:, [1, 3]],
                                       atol=1.0)
            np.testing.assert_allclose(native[:, [0, 2]], expect[:, [0, 2]],
                                       atol=1.0 + 0.04 * w0)
            checked += 1
    assert checked >= 10


class OracleModel:
    """Reads the ground truth straight out of the synthetic image colors:
    red rectangle -> class 0, green -> class 1. Running it through the real
    val stack (jitted forward -> NMS -> scale-back -> 10-IoU matching) must
    yield mAP50 == 1.0 — any geometry bug in the rect protocol breaks it."""

    strides = (8.0, 16.0, 32.0)

    def __call__(self, params, img, ctx, tasks=None):
        import jax.numpy as jnp

        B, H, W = img.shape[0], img.shape[1], img.shape[2]
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        masks = [
            (r > 0.6) & (g < 0.3) & (b < 0.3),   # red
            (g > 0.6) & (r < 0.3) & (b < 0.3),   # green
        ]
        xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        rows = []
        for m in masks:
            big = jnp.float32(1e9)
            x1 = jnp.min(jnp.where(m, xs, big), axis=(1, 2))
            y1 = jnp.min(jnp.where(m, ys, big), axis=(1, 2))
            x2 = jnp.max(jnp.where(m, xs, -big), axis=(1, 2)) + 1.0
            y2 = jnp.max(jnp.where(m, ys, -big), axis=(1, 2)) + 1.0
            present = m.any(axis=(1, 2))
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            w_, h_ = x2 - x1, y2 - y1
            rows.append(jnp.stack([
                jnp.where(present, cx, 0.0), jnp.where(present, cy, 0.0),
                jnp.where(present, w_, 0.0), jnp.where(present, h_, 0.0),
            ], axis=-1))
        nc = 2
        preds = []
        for ci in range(nc):
            scores = jnp.zeros((B, nc), jnp.float32).at[:, ci].set(
                jnp.where(masks[ci].any(axis=(1, 2)), 0.99, 0.0))
            preds.append(jnp.concatenate([rows[ci], scores], axis=-1))
        pred = jnp.stack(preds, axis=1)  # (B, 2, 4+nc)
        out = {t: (pred, None) for t in (tasks or ["toy"])}
        return out


def test_rect_val_oracle_reaches_full_mAP50(tmp_path):
    """The complete rect-val chain on mixed-aspect images scores a perfect
    detector at mAP50 == 1.0 (catches per-batch-shape / pad / scale-back
    bugs without depending on a trained model)."""
    from cerberusdet_tpu.evaluation.val import run_task

    path, _ = make_mixed_aspect_dataset(tmp_path, n=10)
    # draw actual colored rectangles matching the labels
    import cv2 as _cv2
    for i, f in enumerate(sorted((tmp_path / "images" / "val").glob("*.jpg"))):
        im = _cv2.imread(str(f))
        h, w = im.shape[:2]
        im[:] = 40
        x1, y1 = int(0.25 * w), int(0.375 * h)
        x2, y2 = int(0.75 * w), int(0.625 * h)
        # BGR on disk; dataset converts to RGB
        im[y1:y2, x1:x2] = (30, 30, 200) if i % 2 == 0 else (30, 200, 30)
        _cv2.imwrite(str(f), im)
        lb = tmp_path / "labels" / "val" / f"{f.stem}.txt"
        lb.write_text(f"{i % 2} 0.5 0.5 0.5 0.25")

    _, loader = create_dataloader(
        str(tmp_path / "images" / "val"), imgsz=64, batch_size=4,
        augment=False, shuffle=False, rect=True, pad=0.5, task="oracle",
        cache_dir=str(tmp_path), host_sharded=False, max_labels=4)
    out = run_task(OracleModel(), {}, "toy", loader, nc=2,
                   names=["red", "green"])
    mp, mr, map50, mAP = out["results"][:4]
    assert map50 > 0.99, out["results"]
    assert mr > 0.99, out["results"]
    # strict-IoU tail only loses to 1px rasterization
    assert mAP > 0.5, out["results"]


def test_rect_keeps_every_image(tmp_path):
    path, _ = make_mixed_aspect_dataset(tmp_path)
    _, loader = create_dataloader(
        path, imgsz=64, batch_size=4, augment=False, shuffle=False,
        rect=True, pad=0.5, task="t3", cache_dir=str(tmp_path),
        host_sharded=False)
    n = sum(len(b["img"]) for b in loader)
    assert n == 10  # drop_last must be off for eval
