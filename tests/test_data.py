import os
from pathlib import Path

import cv2
import numpy as np
import pytest

from cerberusdet_tpu.data.dataset import DetectionDataset, labels_to_class_weights
from cerberusdet_tpu.data.labels import (
    img2label_paths,
    list_images,
    parse_txt_label,
    parse_xml_label,
    verify_image_label,
)
from cerberusdet_tpu.data.loaders import DataLoader, InfiniteLoader, collate, create_dataloader
from cerberusdet_tpu.data.samplers import BalancedSampler, HostShardSampler, ShuffleSampler
from cerberusdet_tpu.utils.hyp import get_hyperparameter, set_hyperparameter, task_hyp_view


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    """16 random images with 1-3 boxes each, classes 0-2 (class 2 rare)."""
    root = tmp_path_factory.mktemp("toy")
    img_dir = root / "images" / "train"
    lb_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(16):
        im = rng.integers(0, 255, (320, 416, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i:03d}.jpg"), im)
        lines = []
        n = rng.integers(1, 4)
        for _ in range(n):
            c = 2 if i == 0 else int(rng.integers(0, 2))
            x, y = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.1, 0.2, 2)
            lines.append(f"{c} {x:.4f} {y:.4f} {w:.4f} {h:.4f}")
        (lb_dir / f"{i:03d}.txt").write_text("\n".join(lines))
    return str(img_dir)


def test_img2label_paths():
    out = img2label_paths(["/data/images/train/x.jpg"])
    assert out == [f"/data{os.sep}labels{os.sep}train/x.txt"]


def test_txt_label_5_and_6_col(tmp_path):
    f5 = tmp_path / "a.txt"
    f5.write_text("0 0.5 0.5 0.2 0.2\n1 0.3 0.3 0.1 0.1")
    lb = parse_txt_label(str(f5))
    assert lb.shape == (2, 6)
    np.testing.assert_allclose(lb[:, 1], 1.0)  # implied prob
    f6 = tmp_path / "b.txt"
    f6.write_text("0 0.7 0.5 0.5 0.2 0.2")
    lb = parse_txt_label(str(f6))
    assert lb[0, 1] == pytest.approx(0.7)


def test_xml_label_soft_multi(tmp_path):
    xml = """<annotation>
      <size><width>100</width><height>200</height></size>
      <object><name>cat</name>
        <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>100</ymax></bndbox>
        <minors><item><name>dog</name><votes>1</votes></item></minors>
      </object>
    </annotation>"""
    f = tmp_path / "a.xml"
    f.write_text(xml)
    names = ["cat", "dog"]
    # multi + soft: cat gets 2/3 votes (1 minor + implied 2... main=sum+1=2), dog 1/3
    lb = parse_xml_label(str(f), names, as_multi_label=True, as_soft_label=True)
    assert lb.shape == (2, 6)
    probs = dict(zip(lb[:, 0].astype(int).tolist(), lb[:, 1].tolist()))
    assert probs[0] == pytest.approx(2 / 3)
    assert probs[1] == pytest.approx(1 / 3)
    # single hard label
    lb = parse_xml_label(str(f), names, as_multi_label=False, as_soft_label=False)
    assert lb.shape == (1, 6) and lb[0, 0] == 0 and lb[0, 1] == 1.0
    # geometry: cx = 30/100, h = 80/200
    np.testing.assert_allclose(lb[0, 2:6], [0.3, 0.3, 0.4, 0.4], atol=1e-6)


def test_verify_rejects_corrupt(tmp_path):
    bad = tmp_path / "images" / "bad.jpg"
    bad.parent.mkdir()
    bad.write_bytes(b"not an image")
    out = verify_image_label(str(bad), "nolabel.txt")
    assert out[0] is None and out[6] == 1


def test_dataset_basic(toy_dataset):
    ds = DetectionDataset(toy_dataset, imgsz=128, augment=False)
    assert len(ds) == 16
    img, labels, meta = ds[0]
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    assert labels.ndim == 2 and labels.shape[1] == 6
    assert (labels[:, 2:] >= 0).all() and (labels[:, 2:] <= 1).all()
    assert meta["ori_shape"] == (320, 416)


def test_dataset_cache_roundtrip(toy_dataset):
    ds1 = DetectionDataset(toy_dataset, imgsz=128)
    cache_file = Path(ds1.label_files[0]).parent / "task.cache.npy"
    assert cache_file.exists()
    ds2 = DetectionDataset(toy_dataset, imgsz=128)  # loads from cache
    assert len(ds2) == len(ds1)
    np.testing.assert_allclose(ds1.labels[3], ds2.labels[3])


def test_dataset_augment_mosaic(toy_dataset):
    hyp = dict(mosaic=1.0, mixup=0.5, scale=0.5, translate=0.1, fliplr=0.5,
               hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    ds = DetectionDataset(toy_dataset, imgsz=128, augment=True, hyp=hyp)
    for i in range(4):
        img, labels, _ = ds[i]
        assert img.shape == (128, 128, 3)
        if len(labels):
            assert (labels[:, 2:] >= 0).all() and (labels[:, 2:] <= 1.0001).all()


def test_collate_padding(toy_dataset):
    ds = DetectionDataset(toy_dataset, imgsz=128)
    batch = collate([ds[i] for i in range(4)], max_labels=10)
    assert batch["img"].shape == (4, 128, 128, 3)
    assert batch["cls"].shape == (4, 10)
    assert batch["bboxes"].shape == (4, 10, 4)
    assert batch["mask"].sum() == sum(len(ds.labels[i]) for i in range(4))
    assert (batch["bboxes"][~batch["mask"]] == 0).all()


def test_loader_and_infinite(toy_dataset):
    ds, loader = create_dataloader(toy_dataset, imgsz=128, batch_size=4, augment=False,
                                   shuffle=False, host_sharded=False)
    batches = list(loader)
    assert len(batches) == 4
    inf = InfiniteLoader(DataLoader(ds, 8, max_labels=20))
    seen = [next(inf) for _ in range(5)]  # cycles past 2 epochs
    assert all(b["img"].shape[0] == 8 for b in seen)


def test_balanced_sampler_prefers_rare(toy_dataset):
    ds = DetectionDataset(toy_dataset, imgsz=128)
    s = BalancedSampler(ds.labels, "least_sampled", seed=0)
    idxs = [i for _ in range(10) for i in s]
    # image 0 holds the only class-2 box; balanced sampling must hit it often
    freq0 = sum(1 for i in idxs if i == 0) / len(idxs)
    assert freq0 > 1.5 / 16


def test_host_shard_sampler():
    base = ShuffleSampler(10, shuffle=False)
    s0 = list(HostShardSampler(base, num_hosts=2, host_id=0))
    s1 = list(HostShardSampler(base, num_hosts=2, host_id=1))
    assert sorted(s0 + s1) == list(range(10))
    assert not (set(s0) & set(s1))


def test_hyp_addressing():
    hyp = {"lr0": 0.01, "box": [7.5, 5.0], "voc_cls": 0.3, "cls": 0.5}
    assert get_hyperparameter(hyp, "lr0") == 0.01
    assert get_hyperparameter(hyp, "box", 1) == 5.0
    assert get_hyperparameter(hyp, "cls", 0, "voc") == 0.3
    set_hyperparameter(hyp, "box", 6.0, 0)
    assert hyp["box"][0] == 6.0
    view = task_hyp_view(hyp, 1, "other")
    assert view["box"] == 5.0 and view["cls"] == 0.5


def test_class_weights(toy_dataset):
    ds = DetectionDataset(toy_dataset, imgsz=128)
    w = labels_to_class_weights(ds.labels, 3)
    assert w.shape == (3,) and abs(w.sum() - 1) < 1e-9
    assert w[2] == w.max()  # rarest class, highest weight


def test_host_shard_sampler_partitions_exactly():
    """Multi-host data sharding (replaces DistributedSamplerWrapper,
    samplers.py:137-184): 4 hosts' shards are disjoint, cover every index,
    and stay aligned with the base sampler's seeded epoch shuffle."""
    from cerberusdet_tpu.data.samplers import HostShardSampler, ShuffleSampler

    n, hosts = 103, 4
    shards = []
    for h in range(hosts):
        base = ShuffleSampler(n, shuffle=True, seed=5)
        s = HostShardSampler(base, num_hosts=hosts, host_id=h)
        s.set_epoch(2)
        shards.append(list(s))
    all_idx = [i for sh in shards for i in sh]
    assert sorted(all_idx) == list(range(n))  # disjoint + complete
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1
    # same epoch => hosts see a consistent global permutation
    base = ShuffleSampler(n, shuffle=True, seed=5)
    base.set_epoch(2)
    perm = list(base)
    assert shards[1] == perm[1::hosts]


def test_dataset_single_cls(toy_dataset):
    """--single-cls collapses every label to class 0 (datasets.py:258-260)."""
    ds = DetectionDataset(toy_dataset, imgsz=128, augment=False,
                          task="sc", single_cls=True)
    assert all((lb[:, 0] == 0).all() for lb in ds.labels if len(lb))
    _, labels, _ = ds[0]
    assert (labels[:, 0] == 0).all()
    # the plain dataset still has its original classes (cache not poisoned)
    ds2 = DetectionDataset(toy_dataset, imgsz=128, augment=False, task="sc")
    assert any((lb[:, 0] != 0).any() for lb in ds2.labels if len(lb))


def test_process_workers_bitwise_equal(toy_dataset):
    """num_workers > 0 (process pool, the reference's worker model) yields
    batches BITWISE identical to the in-process thread path: augmentation
    RNG is a pure function of (seed, epoch, index) that travels with each
    request."""
    hyp = dict(mosaic=1.0, mixup=0.5, degrees=5.0, translate=0.1, scale=0.5,
               hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, fliplr=0.5)

    def batches(num_workers):
        ds = DetectionDataset(toy_dataset, imgsz=128, augment=True, hyp=hyp,
                              task=f"pw{num_workers}", seed=7)
        loader = DataLoader(ds, batch_size=4,
                            sampler=ShuffleSampler(len(ds), True, seed=7),
                            num_workers=num_workers)
        loader.set_epoch(2)
        out = [b for b in loader]
        loader.close()
        return out

    ref = batches(0)
    multi = batches(2)
    assert len(ref) == len(multi) > 0
    for a, b in zip(ref, multi):
        for k in ("img", "cls", "prob", "bboxes", "mask"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_epochs_vary_order_and_augmentation(toy_dataset):
    """Regression: a fresh InfiniteLoader per epoch must carry the REAL epoch
    — epoch 0 and epoch 1 produce different shuffles and augmentations (the
    per-sample RNG is seeded by (seed, epoch, index))."""
    hyp = dict(mosaic=1.0, degrees=10.0, translate=0.2, scale=0.5)

    def first_batch(epoch):
        ds = DetectionDataset(toy_dataset, imgsz=128, augment=True, hyp=hyp,
                              task="ev", seed=3)
        loader = DataLoader(ds, batch_size=4,
                            sampler=ShuffleSampler(len(ds), True, seed=3))
        it = InfiniteLoader(loader, epoch=epoch)
        b = next(it)
        it.loader = None
        return b

    b0, b1 = first_batch(0), first_batch(1)
    assert not np.array_equal(b0["img"], b1["img"])
    # same epoch twice IS identical (determinism preserved)
    b0b = first_batch(0)
    np.testing.assert_array_equal(b0["img"], b0b["img"])


def test_packed_disk_cache_equivalence_and_reuse(tmp_path):
    """VERDICT r2 item 5: cache_images="disk" packs pre-decoded images into
    one memmap; samples are identical to the decode path, and the pack is
    reused (not rebuilt) on re-open with unchanged inputs."""
    import time

    import cv2
    import numpy as np

    from cerberusdet_tpu.data.dataset import DetectionDataset

    rng = np.random.default_rng(0)
    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "labels" / "train").mkdir(parents=True)
    for i in range(6):
        h, w = int(rng.integers(40, 120)), int(rng.integers(40, 120))
        cv2.imwrite(str(tmp_path / "images" / "train" / f"{i}.jpg"),
                    rng.integers(0, 255, (h, w, 3), np.uint8))
        (tmp_path / "labels" / "train" / f"{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.4")
    path = str(tmp_path / "images" / "train")
    hyp = dict(mosaic=1.0, mixup=0.2, translate=0.1, scale=0.5, fliplr=0.5,
               hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)

    plain = DetectionDataset(path, imgsz=64, augment=True, hyp=hyp,
                             task="pk", seed=3)
    packed = DetectionDataset(path, imgsz=64, augment=True, hyp=hyp,
                              task="pk", seed=3, cache_images="disk")
    pack_file = tmp_path / "labels" / "train" / "pk.pack64.npy"
    assert pack_file.exists()
    for ds in (plain, packed):
        ds.set_epoch(1)
    for i in range(6):
        a_img, a_lb, _ = plain[i]
        b_img, b_lb, _ = packed[i]
        np.testing.assert_array_equal(a_img, b_img)
        np.testing.assert_array_equal(a_lb, b_lb)

    # reuse: reopening must NOT rewrite the pack
    mtime = pack_file.stat().st_mtime_ns
    DetectionDataset(path, imgsz=64, augment=True, hyp=hyp, task="pk",
                     seed=3, cache_images="disk")
    assert pack_file.stat().st_mtime_ns == mtime
    # a different imgsz builds its own pack
    DetectionDataset(path, imgsz=96, augment=False, task="pk",
                     cache_images="disk")
    assert (tmp_path / "labels" / "train" / "pk.pack96.npy").exists()


def test_packed_dataset_pickles_without_pixel_payload(tmp_path):
    """Shipping the dataset to a worker process must not serialize the
    packed memmap's pixels (pickling an np.memmap ships the FULL payload);
    the unpickled copy lazily re-opens the pack and reads identical data."""
    import pickle

    import cv2
    import numpy as np

    from cerberusdet_tpu.data.dataset import DetectionDataset

    rng = np.random.default_rng(1)
    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "labels" / "train").mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(tmp_path / "images" / "train" / f"{i}.jpg"),
                    rng.integers(0, 255, (100, 100, 3), np.uint8))
        (tmp_path / "labels" / "train" / f"{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.4")
    ds = DetectionDataset(str(tmp_path / "images" / "train"), imgsz=256,
                          augment=False, task="pp", cache_images="disk")
    pack_bytes = ds._pack[0].nbytes  # 4 * 256*256*3 ≈ 786 KB
    blob = pickle.dumps(ds)
    assert len(blob) < pack_bytes // 4, (
        f"pickle is {len(blob)} bytes — the pack pixels leaked into it")
    ds2 = pickle.loads(blob)
    assert ds2._pack[0] is None  # stripped...
    im2, hw0_2, hw_2 = ds2.load_image(0)  # ...and lazily re-opened
    im1, hw0_1, hw_1 = ds.load_image(0)
    np.testing.assert_array_equal(np.asarray(im1), np.asarray(im2))
    assert hw0_1 == hw0_2 and hw_1 == hw_2
    # the RAM cache is disabled (not just emptied) in the copy
    dsr = DetectionDataset(str(tmp_path / "images" / "train"), imgsz=64,
                           augment=False, task="pp", cache_images="ram")
    assert pickle.loads(pickle.dumps(dsr))._im_cache is None
