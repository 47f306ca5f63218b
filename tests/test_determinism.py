"""Determinism guarantees (VERDICT round-1 Missing #4): the augmentation
pipeline must be bitwise-repeatable and independent of loader threading.
Reference equivalent: init_seeds (cerberusdet/utils/general.py:38); this
framework goes further — per-(seed, epoch, index) RNG derivation means even
a multi-threaded prefetch cannot perturb results."""

import numpy as np
import cv2
import pytest

from cerberusdet_tpu.data.dataset import DetectionDataset
from cerberusdet_tpu.data.loaders import DataLoader, create_dataloader
from cerberusdet_tpu.utils.seeds import init_seeds

AUG_HYP = dict(
    mosaic=1.0, mixup=0.5, degrees=10.0, translate=0.2, scale=0.5, shear=2.0,
    perspective=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, flipud=0.2, fliplr=0.5,
)


@pytest.fixture()
def toy_dir(tmp_path):
    rng = np.random.default_rng(3)
    img_dir = tmp_path / "images" / "train"
    lb_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    for i in range(12):
        im = rng.integers(0, 255, (80, 96, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), im)
        (lb_dir / f"{i}.txt").write_text(f"{i % 3} 0.5 0.5 0.4 0.4")
    return str(img_dir)


def batches_of(loader, n=2):
    out = []
    it = iter(loader)
    for _ in range(n):
        b = next(it)
        out.append({k: v for k, v in b.items() if k != "meta"})
    return out


def assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert sorted(x) == sorted(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k], err_msg=k)


def test_same_seed_same_batches(toy_dir, tmp_path):
    """Two identically-seeded loaders produce bitwise-identical batches."""
    def build():
        ds = DetectionDataset(toy_dir, imgsz=64, augment=True, hyp=AUG_HYP,
                              seed=7, task="t", cache_dir=str(tmp_path))
        return DataLoader(ds, 4, max_labels=16)
    assert_batches_equal(batches_of(build()), batches_of(build()))


def test_threading_does_not_change_batches(toy_dir, tmp_path):
    """1-thread, 8-thread and prefetch-off loaders agree bitwise."""
    def build(threads, prefetch):
        ds = DetectionDataset(toy_dir, imgsz=64, augment=True, hyp=AUG_HYP,
                              seed=7, task="t", cache_dir=str(tmp_path))
        return DataLoader(ds, 4, max_labels=16, num_threads=threads,
                          prefetch=prefetch)
    ref = batches_of(build(1, 0))
    assert_batches_equal(ref, batches_of(build(8, 3)))
    assert_batches_equal(ref, batches_of(build(3, 1)))


def test_epoch_changes_augmentation(toy_dir, tmp_path):
    """set_epoch advances the augmentation stream (same index, new draws)."""
    ds = DetectionDataset(toy_dir, imgsz=64, augment=True, hyp=AUG_HYP,
                          seed=7, task="t", cache_dir=str(tmp_path))
    a = ds[0][0]
    ds.set_epoch(1)
    b = ds[0][0]
    ds.set_epoch(0)
    c = ds[0][0]
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_different_seed_different_batches(toy_dir, tmp_path):
    ds1 = DetectionDataset(toy_dir, imgsz=64, augment=True, hyp=AUG_HYP,
                           seed=1, task="t", cache_dir=str(tmp_path))
    ds2 = DetectionDataset(toy_dir, imgsz=64, augment=True, hyp=AUG_HYP,
                           seed=2, task="t", cache_dir=str(tmp_path))
    assert not np.array_equal(ds1[0][0], ds2[0][0])


def test_create_dataloader_plumbs_seed(toy_dir, tmp_path):
    _, l1 = create_dataloader(toy_dir, 64, 4, hyp=AUG_HYP, augment=True,
                              seed=5, task="t", cache_dir=str(tmp_path),
                              max_labels=16, host_sharded=False)
    _, l2 = create_dataloader(toy_dir, 64, 4, hyp=AUG_HYP, augment=True,
                              seed=5, task="t", cache_dir=str(tmp_path),
                              max_labels=16, host_sharded=False)
    assert_batches_equal(batches_of(l1), batches_of(l2))


def test_init_seeds_repeatable():
    import random
    init_seeds(11)
    a = (random.random(), np.random.rand())
    init_seeds(11)
    b = (random.random(), np.random.rand())
    assert a == b
