"""Device-side augmentation (data/device_augment.py) vs the host cv2 path.

Exactness contract:
  * labels: BIT-IDENTICAL to the host pipeline for every (seed, epoch, index)
    — the planner replays the same rng stream and runs the same numpy label
    code;
  * pixels: integer-translation warps match the host bitwise; general
    bilinear warps / HSV match up to cv2's fixed-point arithmetic (small
    mean absolute difference).
"""

import random

import cv2
import numpy as np
import pytest

from cerberusdet_tpu.data.augment import PixelAugment
from cerberusdet_tpu.data.dataset import DetectionDataset
from cerberusdet_tpu.data.device_augment import (
    collate_device,
    make_augment_fn,
    plan_sample,
)
from cerberusdet_tpu.data.loaders import create_dataloader

HYP_FULL = dict(
    mosaic=1.0, mixup=0.3, degrees=5.0, translate=0.1, scale=0.3, shear=2.0,
    perspective=0.0, scaleup=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
    flipud=0.2, fliplr=0.5,
)
# integer-geometry hyp: no rotation/scale/shear -> the warp is an integer
# translation (translate=0 centers the 2s crop), bilinear weights are exact
HYP_INT = dict(
    mosaic=1.0, mixup=0.0, degrees=0.0, translate=0.0, scale=0.0, shear=0.0,
    perspective=0.0, scaleup=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
    flipud=0.0, fliplr=0.0,
)


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("devaug")
    img_dir = root / "images" / "train"
    lb_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    for i in range(12):
        h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
        im = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i:03d}.jpg"), im)
        lines = []
        for _ in range(int(rng.integers(1, 4))):
            x, y = rng.uniform(0.3, 0.7, 2)
            bw, bh = rng.uniform(0.15, 0.3, 2)
            lines.append(f"{int(rng.integers(0, 3))} {x:.4f} {y:.4f} {bw:.4f} {bh:.4f}")
        (lb_dir / f"{i:03d}.txt").write_text("\n".join(lines))
    return str(img_dir)


def _pair(toy_root, tmp_path, hyp, imgsz=128, seed=3):
    """(host dataset, device dataset) over the same files/hyp/seed.

    Pixel aug (blur/median/gray) is pinned OFF: these tests compare the raw
    batch program (geometry/HSV/flip only) against the host path, and
    blur/median run as loader patch-ups outside that program. The RNG draws
    still happen (p=0 short-circuits after the draw), so streams stay
    aligned with the default-probability datasets. Dedicated pixel-aug tests
    construct their own PixelAugment."""
    def mk():
        ds = DetectionDataset(
            toy_root, imgsz=imgsz, augment=True, hyp=hyp, cache_images="disk",
            cache_dir=str(tmp_path), seed=seed)
        ds._pixel_aug = PixelAugment(p_blur=0.0, p_median=0.0, p_gray=0.0)
        return ds
    return mk(), mk()


def test_labels_bitwise_identical(toy_root, tmp_path):
    host, dev = _pair(toy_root, tmp_path, HYP_FULL)
    for epoch in range(3):
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        for i in range(len(host)):
            _, lb_host, meta_host = host[i]
            plan = plan_sample(dev, i)
            np.testing.assert_array_equal(
                plan.labels, lb_host,
                err_msg=f"labels diverge at epoch={epoch} index={i}")
            assert plan.meta["path"] == meta_host["path"]


def test_integer_geometry_bitwise(toy_root, tmp_path):
    """With zero-degree/scale/shear hyps the mosaic warp is an integer
    translation: device pixels must equal the host cv2 path bitwise."""
    host, dev = _pair(toy_root, tmp_path, HYP_INT)
    aug = make_augment_fn(host.imgsz, 4)
    plans = [plan_sample(dev, i) for i in range(8)]
    batch = collate_device(dev, plans)
    imgs = np.asarray(aug(batch["tiles"], batch["aug"]))
    for i in range(8):
        img_host, _, _ = host[i]
        np.testing.assert_array_equal(imgs[i], img_host, err_msg=f"sample {i}")


def test_full_pipeline_close_to_host(toy_root, tmp_path):
    """General warps + HSV + flips + mixup: small mean |diff| vs cv2 (its
    5-bit fixed-point bilinear and uint8 LUT HSV round differently)."""
    host, dev = _pair(toy_root, tmp_path, HYP_FULL)
    n = len(host)
    plans = [plan_sample(dev, i) for i in range(n)]
    aug = make_augment_fn(host.imgsz, 8)
    batch = collate_device(dev, plans)
    imgs = np.asarray(aug(batch["tiles"], batch["aug"]))
    checked = 0
    for i in range(n):
        if plans[i].blurred:
            continue  # blur/median run as loader patch-ups, not in-batch
        img_host, _, _ = host[i]
        diff = np.abs(imgs[i].astype(np.int32) - img_host.astype(np.int32))
        assert diff.mean() < 3.0, f"sample {i}: mean|diff|={diff.mean():.2f}"
        checked += 1
    assert checked >= n - 2


def test_collate_device_matches_collate_labels(toy_root, tmp_path):
    """The padded label arrays must equal the host collate's for the same
    batch."""
    from cerberusdet_tpu.data.loaders import collate

    host, dev = _pair(toy_root, tmp_path, HYP_FULL)
    idxs = list(range(6))
    host_batch = collate([host[i] for i in idxs], max_labels=20)
    plans = [plan_sample(dev, i) for i in idxs]
    dev_batch = collate_device(dev, plans, max_labels=20)
    for k in ("cls", "prob", "bboxes", "mask"):
        np.testing.assert_array_equal(dev_batch[k], host_batch[k], err_msg=k)


def test_create_dataloader_device_augment(toy_root, tmp_path):
    """End-to-end: the loader yields standard {img, cls, ...} batches with a
    device-resident img and host-identical labels."""
    (tmp_path / "dl").mkdir(exist_ok=True)
    (tmp_path / "dl2").mkdir(exist_ok=True)
    _, loader = create_dataloader(
        toy_root, imgsz=128, batch_size=4, hyp=HYP_FULL, augment=True,
        task="dev", seed=5, cache_dir=str(tmp_path / "dl"),
        augment_device=True, max_labels=20)
    _, ref_loader = create_dataloader(
        toy_root, imgsz=128, batch_size=4, hyp=HYP_FULL, augment=True,
        task="ref", seed=5, cache_dir=str(tmp_path / "dl2"),
        cache_images="disk", max_labels=20)
    loader.set_epoch(1)
    ref_loader.set_epoch(1)
    for b_dev, b_ref in zip(loader, ref_loader):
        assert "img" in b_dev and "tiles" not in b_dev
        img = np.asarray(b_dev["img"])
        assert img.shape == b_ref["img"].shape and img.dtype == np.uint8
        for k in ("cls", "prob", "bboxes", "mask"):
            np.testing.assert_array_equal(b_dev[k], b_ref[k], err_msg=k)
        break


def test_resident_pack_matches_shipped_tiles(toy_root, tmp_path):
    """The device-resident pack path (ship indices, gather from HBM) must be
    BIT-IDENTICAL to the per-batch tile-shipping path."""
    import jax

    host, dev = _pair(toy_root, tmp_path, HYP_FULL)
    plans = [plan_sample(dev, i) for i in range(6)]
    shipped = collate_device(dev, plans, max_labels=20)
    indexed = collate_device(dev, plans, max_labels=20, as_indices=True)
    aug_ship = make_augment_fn(dev.imgsz, 8)
    aug_res = make_augment_fn(dev.imgsz, 8, resident=True)
    pack_dev = jax.device_put(np.asarray(dev._pack[0]))
    out_ship = np.asarray(aug_ship(shipped["tiles"], shipped["aug"]))
    out_res = np.asarray(aug_res(pack_dev, indexed["tile_idx"], indexed["aug"]))
    np.testing.assert_array_equal(out_res, out_ship)
    np.testing.assert_array_equal(indexed["cls"], shipped["cls"])


HYP_AA = dict(HYP_FULL, degrees=0.0, shear=0.0, perspective=0.0)


def test_matmul_warp_matches_gather(toy_root, tmp_path):
    """For axis-aligned warps (the default hyps) the MXU-matmul formulation
    must match the gather formulation to float tolerance — and bitwise for
    integer translations."""
    host, dev = _pair(toy_root, tmp_path, HYP_AA, seed=21)
    plans = [plan_sample(dev, i) for i in range(8)]
    batch = collate_device(dev, plans, max_labels=20)
    g = np.asarray(make_augment_fn(dev.imgsz, 8)(batch["tiles"], batch["aug"]))
    m = np.asarray(make_augment_fn(dev.imgsz, 8, axis_aligned=True)(
        batch["tiles"], batch["aug"]))
    diff = np.abs(m.astype(np.int32) - g.astype(np.int32))
    # identical up to rounding-boundary flips from float-association
    # differences (round/floor boundaries can shift a value by 1 twice)
    assert diff.max() <= 2 and (diff > 0).mean() < 0.01

    # integer geometry: bitwise vs gather AND vs the host cv2 paint
    hosti, devi = _pair(toy_root, tmp_path, HYP_INT, seed=22)
    plans = [plan_sample(devi, i) for i in range(8)]
    batch = collate_device(devi, plans, max_labels=20)
    m = np.asarray(make_augment_fn(devi.imgsz, 4, axis_aligned=True)(
        batch["tiles"], batch["aug"]))
    for i in range(8):
        img_host, _, _ = hosti[i]
        np.testing.assert_array_equal(m[i], img_host, err_msg=f"sample {i}")


def test_matmul_close_to_host_pipeline(toy_root, tmp_path):
    """Axis-aligned full pipeline (scale+translate+mixup+HSV+flips) through
    the matmul warp stays close to the host cv2 path."""
    host, dev = _pair(toy_root, tmp_path, HYP_AA, seed=23)
    plans = [plan_sample(dev, i) for i in range(10)]
    batch = collate_device(dev, plans, max_labels=20)
    m = np.asarray(make_augment_fn(dev.imgsz, 8, axis_aligned=True)(
        batch["tiles"], batch["aug"]))
    for i in range(10):
        if plans[i].blurred:
            continue
        img_host, _, _ = host[i]
        diff = np.abs(m[i].astype(np.int32) - img_host.astype(np.int32))
        assert diff.mean() < 3.0, f"sample {i}: mean|diff|={diff.mean():.2f}"


def test_affine_decomposition_exact():
    """minv == M0 @ Shx @ Shy to float tolerance for random small-angle
    affines (the published-recipe regime)."""
    from cerberusdet_tpu.data.augment import build_perspective_matrix
    from cerberusdet_tpu.data.device_augment import _decompose_affine

    rng = random.Random(0)
    for _ in range(200):
        M, _, _, _ = build_perspective_matrix(
            (256, 256), degrees=5.0, translate=0.1, scale=0.5, shear=3.0,
            perspective=0.0, border=(-64, -64), scaleup=0.0, rng=rng)
        minv = np.linalg.inv(M)
        m0, (h, g) = _decompose_affine(minv)
        shx = np.array([[1, h, 0], [0, 1, 0], [0, 0, 1]], np.float64)
        shy = np.array([[1, 0, 0], [g, 1, 0], [0, 0, 1]], np.float64)
        np.testing.assert_allclose(m0.astype(np.float64) @ shx @ shy, minv,
                                   rtol=1e-5, atol=1e-5)


def test_shear_pad_bound_covers_draws():
    """Safety property: required_shear_pad's K must bound the shear-pass
    shifts (|h|*(H+K) <= K-1 and |g|*W <= K-1) for EVERY draw of the hyp's
    distribution — the hat weights silently go to zero (black pixels)
    beyond the static shift range. Fuzz 2000 draws of the published
    voc_obj365 recipe and a harsher one."""
    from cerberusdet_tpu.data.augment import build_perspective_matrix
    from cerberusdet_tpu.data.device_augment import (
        _decompose_affine,
        required_shear_pad,
    )

    # the published recipe must stay device-eligible (loader gate: K <= S/4)
    assert 0 < required_shear_pad({"degrees": 0.299, "shear": 0.717},
                                  640) <= 160
    for deg, sh, sc, imgsz in [(0.299, 0.717, 0.898, 640),
                               (5.0, 5.0, 0.5, 128), (10.0, 8.0, 0.9, 320)]:
        hyp = {"degrees": deg, "shear": sh}
        K = required_shear_pad(hyp, imgsz)
        assert K > 0, "fuzz hyps must exercise the bound"
        rng = random.Random(99)
        for _ in range(2000):
            M, _, _, _ = build_perspective_matrix(
                (imgsz * 2, imgsz * 2), degrees=deg, translate=0.1, scale=sc,
                shear=sh, perspective=0.0, border=(-imgsz // 2, -imgsz // 2),
                scaleup=0.0, rng=rng)
            _, (h, g) = _decompose_affine(np.linalg.inv(M))
            assert abs(h) * (imgsz + K) <= K - 1 + 1e-6, (deg, sh, h, K)
            assert abs(g) * imgsz <= K - 1 + 1e-6, (deg, sh, g, K)


def test_affine3_zero_shear_matches_axis_aligned(toy_root, tmp_path):
    """With h == g == 0 the shear passes are exact integer slices: the
    3-pass warp must equal the axis-aligned matmul warp bitwise."""
    host, dev = _pair(toy_root, tmp_path, HYP_AA, seed=31)
    plans = [plan_sample(dev, i) for i in range(8)]
    batch = collate_device(dev, plans, max_labels=20)
    aa = np.asarray(make_augment_fn(dev.imgsz, 8, axis_aligned=True)(
        batch["tiles"], batch["aug"]))
    a3 = np.asarray(make_augment_fn(dev.imgsz, 8, shear_pad=6)(
        batch["tiles"], batch["aug"]))
    np.testing.assert_array_equal(a3, aa)


@pytest.fixture(scope="module")
def smooth_root(tmp_path_factory):
    """Smooth (gradient) images: bilinear resampling reproduces linear
    functions exactly, so the cascade of 3 bilinear passes must match cv2's
    single pass to ~1 intensity level anywhere geometry is right — a sharp
    geometric-correctness probe, unlike white noise where each extra
    resample low-passes the signal and the diff measures smoothing, not
    geometry."""
    root = tmp_path_factory.mktemp("devaug_smooth")
    img_dir = root / "images" / "train"
    lb_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    for i in range(12):
        h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        im = np.clip(np.stack([xx / w * 200 + 20, yy / h * 200 + 20,
                               (xx + yy) / (w + h) * 200 + 20], -1),
                     0, 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:03d}.png"), im)
        lines = []
        for _ in range(int(rng.integers(1, 4))):
            x, y = rng.uniform(0.3, 0.7, 2)
            bw, bh = rng.uniform(0.15, 0.3, 2)
            lines.append(
                f"{int(rng.integers(0, 3))} {x:.4f} {y:.4f} {bw:.4f} {bh:.4f}")
        (lb_dir / f"{i:03d}.txt").write_text("\n".join(lines))
    return str(img_dir)


def test_affine3_close_to_host_rotating_hyp(smooth_root, tmp_path):
    """The decomposed 3-pass warp vs the host cv2 single-pass warp with
    rotation + shear enabled (the tuned voc_obj365 regime), on smooth
    images where cascaded bilinear error is ~rounding if and only if the
    geometry is exact (see smooth_root). The residual is edge pixels at
    tile/border-114 discontinuities, where 3 resamples spread the step one
    extra pixel."""
    from cerberusdet_tpu.data.device_augment import required_shear_pad

    hyp = dict(HYP_FULL, degrees=2.0, shear=2.0)
    host, dev = _pair(smooth_root, tmp_path, hyp, seed=33)
    K = required_shear_pad(hyp, dev.imgsz)
    plans = [plan_sample(dev, i) for i in range(10)]
    batch = collate_device(dev, plans, max_labels=20)
    imgs = np.asarray(make_augment_fn(dev.imgsz, 8, shear_pad=K)(
        batch["tiles"], batch["aug"]))
    checked = 0
    for i in range(10):
        if plans[i].blurred:
            continue
        img_host, _, _ = host[i]
        diff = np.abs(imgs[i].astype(np.int32) - img_host.astype(np.int32))
        assert diff.mean() < 2.5, f"sample {i}: mean|diff|={diff.mean():.2f}"
        assert np.percentile(diff, 95) <= 10, f"sample {i}"
        checked += 1
    assert checked >= 8


def test_affine3_voc_recipe_loader_routing(toy_root, tmp_path):
    """The loader must route the rotating-hyp (perspective-free) recipe to
    the device path (shear_pad > 0), and the yielded pixels must match the
    standalone affine3 program."""
    hyp = dict(HYP_FULL, degrees=0.299, shear=0.717, mixup=0.0)
    (tmp_path / "dlrot").mkdir(exist_ok=True)
    _, loader = create_dataloader(
        toy_root, imgsz=128, batch_size=4, hyp=hyp, augment=True,
        task="rot", seed=9, cache_dir=str(tmp_path / "dlrot"),
        augment_device=True, max_labels=20)
    assert loader.device_augment and loader._affine_pad > 0
    batch = next(iter(loader))
    img = np.asarray(batch["img"])
    assert img.shape == (4, 128, 128, 3) and img.dtype == np.uint8


def test_box_blur_matches_cv2():
    import jax.numpy as jnp

    from cerberusdet_tpu.data.device_augment import _box_blur

    rng = np.random.default_rng(3)
    im = rng.integers(0, 255, (64, 96, 3), np.uint8)
    for k in (3, 5, 7):
        ours = np.asarray(jnp.round(_box_blur(jnp.asarray(im, jnp.float32),
                                              k))).astype(np.int32)
        ref = cv2.blur(im, (k, k)).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1, f"k={k}"
        assert (ours != ref).mean() < 0.02, f"k={k}"  # only sum/k^2 rounding


def test_median_blur_matches_cv2():
    import jax.numpy as jnp

    from cerberusdet_tpu.data.device_augment import _median_blur

    rng = np.random.default_rng(4)
    im = rng.integers(0, 255, (64, 96, 3), np.uint8)
    for k in (3, 5, 7):
        ours = np.asarray(_median_blur(jnp.asarray(im, jnp.float32),
                                       k)).astype(np.uint8)
        np.testing.assert_array_equal(ours, cv2.medianBlur(im, k),
                                      err_msg=f"k={k}")


def test_pixel_aug_full_pipeline(toy_root, tmp_path):
    """Forced blur/median through the full device pipeline vs host cv2.
    Integer-geometry hyp makes the warp bitwise, so diffs isolate the pixel
    ops: median-only samples are exact, box-blur samples differ only by
    sum/k^2 rounding (<=1, <=2 when median follows blur)."""
    from cerberusdet_tpu.data.augment import PixelAugment

    host, dev = _pair(toy_root, tmp_path, HYP_INT, seed=41)
    for ds in (host, dev):
        ds._pixel_aug = PixelAugment(p_blur=0.7, p_median=0.7, p_gray=0.2)
    plans = [plan_sample(dev, i) for i in range(10)]
    batch = collate_device(dev, plans, max_labels=20)
    assert "pixel_ops" in batch and len(batch["pixel_ops"]) >= 5
    imgs = np.asarray(make_augment_fn(dev.imgsz, 4, axis_aligned=True)(
        batch["tiles"], batch["aug"])).copy()
    for i, bk, mk in batch["pixel_ops"]:
        fn = make_augment_fn(dev.imgsz, 4, axis_aligned=True,
                             pixel_ops=(bk, mk))
        row = np.asarray(fn(batch["tiles"][i:i + 1],
                            {k: v[i:i + 1] for k, v in batch["aug"].items()}))
        imgs[i] = row[0]
    for i in range(10):
        img_host, _, _ = host[i]
        diff = np.abs(imgs[i].astype(np.int32) - img_host.astype(np.int32))
        if plans[i].median_k and not plans[i].blur_k:
            np.testing.assert_array_equal(imgs[i], img_host,
                                          err_msg=f"sample {i}")
        assert diff.max() <= 2, f"sample {i}: max={diff.max()}"


def test_pixel_ops_loader_patchup(toy_root, tmp_path):
    """pixel_ops flow through create_dataloader: flagged rows compile a
    variant program and get patched in place; the batch stays deterministic
    across two loaders."""
    from cerberusdet_tpu.data.augment import PixelAugment

    (tmp_path / "dlpix").mkdir(exist_ok=True)

    def make():
        ds, loader = create_dataloader(
            toy_root, imgsz=128, batch_size=8, hyp=HYP_INT, augment=True,
            task="pix", seed=5, cache_dir=str(tmp_path / "dlpix"),
            augment_device=True, max_labels=20)
        ds._pixel_aug = PixelAugment(p_blur=1.0, p_median=0.0, p_gray=0.0)
        return loader

    a = np.asarray(next(iter(make()))["img"])
    loader = make()
    b = np.asarray(next(iter(loader))["img"])
    assert loader._pixel_fns, "no pixel-op variant program was compiled"
    assert a.dtype == np.uint8 and a.shape == (8, 128, 128, 3)
    np.testing.assert_array_equal(a, b)


def test_requires_pack(toy_root, tmp_path):
    ds = DetectionDataset(toy_root, imgsz=128, augment=True, hyp=HYP_FULL,
                          cache_dir=str(tmp_path / "nopack"), seed=0)
    with pytest.raises(RuntimeError, match="cache_images"):
        plan_sample(ds, 0)


def test_nonmosaic_branch(toy_root, tmp_path):
    """mosaic=0 samples run the letterbox+perspective single-image branch;
    labels stay bit-identical and pixels close."""
    hyp = dict(HYP_FULL, mosaic=0.0, mixup=0.0)
    host, dev = _pair(toy_root, tmp_path, hyp, seed=11)
    aug = make_augment_fn(host.imgsz, 4)
    plans = [plan_sample(dev, i) for i in range(8)]
    batch = collate_device(dev, plans)
    imgs = np.asarray(aug(batch["tiles"], batch["aug"]))
    for i in range(8):
        img_host, lb_host, _ = host[i]
        np.testing.assert_array_equal(plans[i].labels, lb_host)
        if plans[i].blurred:
            continue
        diff = np.abs(imgs[i].astype(np.int32) - img_host.astype(np.int32))
        assert diff.mean() < 3.0, f"sample {i}: mean|diff|={diff.mean():.2f}"
