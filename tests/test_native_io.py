"""Native DCT-scaled JPEG decode (cerberusdet_tpu/native): correctness vs the
cv2 full-decode path, the fallback contract, and the dataset integration."""

import cv2
import numpy as np
import pytest

from cerberusdet_tpu import native


@pytest.fixture(scope="module")
def big_jpeg(tmp_path_factory):
    """1920x1080 smooth-ish JPEG (noise defeats DCT prediction; blur keeps
    the encode realistic)."""
    rng = np.random.default_rng(0)
    im = cv2.GaussianBlur(
        rng.integers(0, 255, (1080, 1920, 3), np.uint8), (0, 0), 3)
    path = tmp_path_factory.mktemp("jpg") / "big.jpg"
    cv2.imwrite(str(path), im, [cv2.IMWRITE_JPEG_QUALITY, 90])
    return str(path)


def test_native_builds():
    assert native.available(), "native jpeg_io failed to build/load"


def test_scaled_decode_matches_cv2(big_jpeg):
    out = native.imread_scaled(big_jpeg, 640)
    assert out is not None
    arr, (h0, w0) = out
    assert (h0, w0) == (1080, 1920)
    # smallest DCT scale with long side >= 640: 3/8 of 1920 = 720
    assert arr.shape == (405, 720, 3)
    full = cv2.cvtColor(cv2.imread(big_jpeg), cv2.COLOR_BGR2RGB)
    ref = cv2.resize(full, (arr.shape[1], arr.shape[0]),
                     interpolation=cv2.INTER_AREA)
    diff = np.abs(arr.astype(np.int16) - ref.astype(np.int16)).mean()
    assert diff < 3.0, diff  # IDCT downscale vs area resize: ~0.7/255 typical


def test_small_source_decodes_full(big_jpeg, tmp_path):
    """Sources already <= target decode at 8/8 (no information loss)."""
    small = cv2.imread(big_jpeg)[:240, :320]
    p = tmp_path / "small.jpg"
    cv2.imwrite(str(p), small, [cv2.IMWRITE_JPEG_QUALITY, 95])
    arr, (h0, w0) = native.imread_scaled(str(p), 640)
    assert arr.shape == (240, 320, 3) and (h0, w0) == (240, 320)


def test_fallback_contract(tmp_path):
    assert native.imread_scaled(str(tmp_path / "missing.jpg"), 640) is None
    png = tmp_path / "x.png"
    cv2.imwrite(str(png), np.zeros((8, 8, 3), np.uint8))
    assert native.imread_scaled(str(png), 640) is None  # not a jpeg
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8garbage-not-a-jpeg")
    assert native.imread_scaled(str(bad), 640) is None
    assert native.decode_jpeg_scaled(b"", 640) is None


def test_dataset_fast_decode_geometry(big_jpeg, tmp_path):
    """load_image emits the SAME target geometry and full-res (h0, w0)
    through the native path as through cv2, so label normalization and
    letterbox ratios are unchanged."""
    import shutil

    from cerberusdet_tpu.data.dataset import DetectionDataset

    img_dir = tmp_path / "images" / "train"
    lb_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    shutil.copy(big_jpeg, img_dir / "0.jpg")
    (lb_dir / "0.txt").write_text("0 0.5 0.5 0.4 0.4")

    fast = DetectionDataset(str(img_dir), imgsz=640, augment=False,
                            task="fd_on", fast_decode=True)
    slow = DetectionDataset(str(img_dir), imgsz=640, augment=False,
                            task="fd_off", fast_decode=False)
    im_f, hw0_f, hw_f = fast.load_image(0)
    im_s, hw0_s, hw_s = slow.load_image(0)
    assert hw0_f == hw0_s == (1080, 1920)
    assert im_f.shape == im_s.shape and hw_f == hw_s
    diff = np.abs(im_f.astype(np.int16) - im_s.astype(np.int16)).mean()
    assert diff < 3.0, diff
    # default policy: on for augmented datasets, off for eval
    assert DetectionDataset(str(img_dir), imgsz=640, augment=True,
                            task="fd_a").fast_decode
    assert not DetectionDataset(str(img_dir), imgsz=640, augment=False,
                                task="fd_e").fast_decode
