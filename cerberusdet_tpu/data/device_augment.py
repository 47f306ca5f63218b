"""Device-side augmentation: the whole image pipeline as ONE jitted XLA
program, fed by raw packed-cache tiles.

Round-2 profiling showed the 1-core host cannot feed the chip: decode was
fixed by the packed memmap cache (PROFILE.md "packed decode cache"), leaving
cv2 warpAffine (3.4 ms/sample) + HSV (2.2 ms) as the augmented-loader floor
(~74 img/s vs ~100+ img/s train-step consumption). Those are exactly the ops
a TPU does for free next to a 12-TFLOP train step — so in `augment_device`
mode the host stops touching pixels entirely:

  host   plan_sample(): replays the dataset's per-(seed, epoch, index) RNG
         stream to draw the SAME mosaic layout / warp matrix / HSV gains /
         flips as the cv2 path and computes the labels with the SAME numpy
         code — labels are bit-identical to the host pipeline by
         construction. Pixel work is *described*, not done: the plan is a
         few hundred bytes.
  host   collate_device(): memcpys the 4 (8 with mixup) source tiles per
         sample out of the packed memmap — the only per-pixel host work.
  device augment_batch() [jit]: mosaic paint + affine/perspective warp as a
         single inverse-warp bilinear gather (each integer canvas corner
         resolves through the 4 disjoint tile regions, reproducing cv2's
         cross-tile boundary blending), mixup blend, grayscale, HSV jitter,
         flips — fused by XLA, overlapped with the train step.

Behavioral parity target: cerberusdet/data/datasets.py:483-542 (mosaic) +
augmentations.py:92-186 (random_perspective) + :43-56 (HSV), re-expressed as
one gather-based resampling program. Exactness contract (tested in
tests/test_device_augment.py):
  * labels: bit-identical to the host path for every (seed, epoch, index);
  * geometry: integer-translation warps are bit-identical; general bilinear
    warps match cv2 up to its 5-bit fixed-point interpolation (<~2 levels);
  * HSV: float-space jitter vs cv2's uint8 LUT (<~few levels);
  * blur/median/grayscale pixel aug: applied on device — box blur matches
    cv2.blur to <=1 level (REFLECT_101 border, separable slice sums),
    median is the exact order statistic (bitwise vs cv2.medianBlur,
    REPLICATE border). The rare (p=0.01 each) blur/median samples run as
    per-(blur_k, median_k) single-sample patch-up programs in the loader so
    the batch program never pays for them.

Requires `cache_images="disk"` (the packed pre-decoded memmap): tiles must
live in static (imgsz, imgsz) slots, and the pack's hw tables let the
planner know every image's size without decoding anything.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any, Dict, List

import numpy as np

from cerberusdet_tpu.data.augment import (
    build_perspective_matrix,
    warp_targets,
)
from cerberusdet_tpu.data.dataset import (
    DetectionDataset,
    mosaic_layout,
    xywhn2xyxy_np,
    xyxy2xywhn_np,
)
from cerberusdet_tpu.ops.letterbox import letterbox_params

PAD = 114.0


# --------------------------------------------------------------------- plan
@dataclass
class SamplePlan:
    """Everything the device program needs for one sample (pixel-free)."""

    tile_idx: np.ndarray   # (n_slots,) int32 pack indices, -1 = unused
    regions: np.ndarray    # (2, 4, 4) f32 canvas rects [x1, y1, x2, y2)
    offs: np.ndarray       # (2, 4, 2) f32 canvas->tile offsets (padw, padh)
    minv: np.ndarray       # (2, 3, 3) f32 output->canvas inverse warps
    minv0: np.ndarray      # (2, 3, 3) f32 axis-aligned part of minv = D.Shx.Shy
    shear: np.ndarray      # (2, 2) f32 (hx, hy) shear coefficients per warp
    mix_r: float           # mixup blend weight (1.0 = no mixup)
    hsv_mult: np.ndarray   # (3,) f32 h/s/v gain multipliers
    hsv_on: bool
    gray: bool
    blur_k: int            # box-blur kernel (0 = off)
    median_k: int          # median-blur kernel (0 = off)
    flipud: bool
    fliplr: bool
    labels: np.ndarray     # (n, 6) final [cls, prob, cx, cy, w, h] normalized
    meta: dict = field(default_factory=dict)

    @property
    def blurred(self) -> bool:
        return bool(self.blur_k or self.median_k)


def _decompose_affine(minv: np.ndarray):
    """Factor an affine inverse warp minv = M0 @ Shx @ Shy where M0 is
    AXIS-ALIGNED (diagonal + translation), Shx = [[1,h],[0,1]] and
    Shy = [[1,0],[g,1]] are unit shears (an LDU factorization of the 2x2
    spatial block). This lets the device run the general rotating warp as
    the existing two-matmul axis-aligned resample followed by two bounded
    per-row / per-column fractional shifts — no gathers anywhere (the XLA
    TPU gather lowering measured ~70x off speed-of-light, PROFILE.md).

    Returns (minv0 (3,3) f32, shear (2,) f32 = (h, g)). Perspective or
    degenerate matrices return (minv, zeros) — callers route those to the
    gather/host path."""
    a, b = float(minv[0, 0]), float(minv[0, 1])
    c, d = float(minv[1, 0]), float(minv[1, 1])
    det = a * d - b * c
    if (abs(minv[2, 0]) > 1e-12 or abs(minv[2, 1]) > 1e-12
            or abs(d) < 1e-8 or abs(det) < 1e-10):
        return minv.astype(np.float32), np.zeros(2, np.float32)
    g = c / d
    d1 = det / d
    h = b / d1
    m0 = np.array([[d1, 0, minv[0, 2]], [0, d, minv[1, 2]], [0, 0, 1]],
                  np.float32)
    return m0, np.array([h, g], np.float32)


def required_shear_pad(hyp: dict, imgsz: int) -> int:
    """Static padding K for the 3-pass affine device warp: a provable bound
    on the shear-pass shift. For minv = (1/s)R(-theta)Sh^-1 (perspective 0)
    the decomposed |h|, |g| are scale-free and bounded by
    b = (tan|theta|max + tan|alpha|max) / (1 - tan^2). The x-shear pass
    runs on the K-padded row grid, so the guarantee needed is
    |h|*(imgsz+K) <= K-1, i.e. K >= (b*imgsz + 1) / (1 - b) — the padding
    itself extends the shift range (pinned by
    test_shear_pad_bound_covers_draws: hat weights silently zero out
    beyond [0, 2K]). Returns 0 for axis-aligned hyps (no shear passes) or
    extreme angles (b >= 0.5: no reasonable K exists — callers fall back
    to the gather/host path)."""
    import math as _m

    deg = float(hyp.get("degrees", 0.0))
    sh = float(hyp.get("shear", 0.0))
    if not (deg or sh):
        return 0
    t = _m.tan(_m.radians(min(abs(deg), 44.0))) + _m.tan(
        _m.radians(min(abs(sh), 44.0)))
    bound = t / max(1.0 - t * t, 0.5)
    if bound >= 0.5:
        return 0
    return int(_m.ceil((bound * imgsz + 1.0) / (1.0 - bound))) + 2


def _plan_mosaic_warp(ds: DetectionDataset, index: int, rng):
    """One mosaic + perspective warp: rng stream identical to
    DetectionDataset.load_mosaic. Returns (labels_px, tile_idx4, regions,
    offs, minv)."""
    s = ds.imgsz
    hyp = ds.hyp
    yc, xc, indices = ds.draw_mosaic_layout(index, rng)
    _, hw0, hw = ds._pack
    dims = [(int(hw[i, 0]), int(hw[i, 1])) for i in indices]
    placements = mosaic_layout(s, yc, xc, dims)
    labels4 = ds.mosaic_labels(indices, placements)
    M, sc, width, height = build_perspective_matrix(
        (2 * s, 2 * s), degrees=hyp["degrees"], translate=hyp["translate"],
        scale=hyp["scale"], shear=hyp["shear"], perspective=hyp["perspective"],
        border=ds.mosaic_border, scaleup=float(hyp.get("scaleup", 0.0)), rng=rng)
    labels = warp_targets(labels4, M, sc, width, height, hyp["perspective"])
    regions = np.zeros((4, 4), np.float32)
    offs = np.zeros((4, 2), np.float32)
    for t, ((x1a, y1a, x2a, y2a), (x1b, y1b, _, _), _) in enumerate(placements):
        regions[t] = (x1a, y1a, x2a, y2a)
        offs[t] = (x1a - x1b, y1a - y1b)
    minv = np.linalg.inv(M).astype(np.float32)
    return labels, np.asarray(indices, np.int32), regions, offs, minv


def _plan_letterbox_warp(ds: DetectionDataset, index: int, rng):
    """Non-mosaic branch: letterbox + random_perspective, expressed as one
    source-space warp. Pack tiles already have longest-side == imgsz, so the
    letterbox ratio is exactly 1 and L is a pure integer translation — the
    device resamples once exactly where the host does."""
    s = ds.imgsz
    hyp = ds.hyp
    _, hw0, hw = ds._pack
    h, w = int(hw[index, 0]), int(hw[index, 1])
    h0, w0 = int(hw0[index, 0]), int(hw0[index, 1])
    ratio, new_unpad, (dw, dh) = letterbox_params(
        (h, w), (s, s), auto=False, scaleup=ds.augment)
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    labels = ds.labels[index].copy()
    if len(labels):
        labels[:, 2:6] = xywhn2xyxy_np(
            labels[:, 2:6], ratio[0] * w, ratio[1] * h, dw, dh)
    M, sc, width, height = build_perspective_matrix(
        (s, s), degrees=hyp["degrees"], translate=hyp["translate"],
        scale=hyp["scale"], shear=hyp["shear"], perspective=hyp["perspective"],
        border=(0, 0), scaleup=float(hyp.get("scaleup", 0.0)), rng=rng)
    labels = warp_targets(labels, M, sc, width, height, hyp["perspective"])
    # canvas == the source tile; fold the letterbox translation into the
    # inverse warp and fold the (rare) ratio != 1 rescale with cv2's
    # pixel-center resize convention src = (dst + 0.5) / r - 0.5
    nw, nh = new_unpad
    rx, ry = w / max(nw, 1), h / max(nh, 1)
    linv = np.array([[rx, 0, (0.5 - left) * rx - 0.5],
                     [0, ry, (0.5 - top) * ry - 0.5],
                     [0, 0, 1]], np.float64)
    minv = (linv @ np.linalg.inv(M)).astype(np.float32)
    regions = np.zeros((4, 4), np.float32)
    offs = np.zeros((4, 2), np.float32)
    regions[0] = (0, 0, w, h)
    tile_idx = np.array([index, -1, -1, -1], np.int32)
    shapes = ((h0, w0), ((h / h0 * ratio[0], w / w0 * ratio[1]), (dw, dh)))
    return labels, tile_idx, regions, offs, minv, (h0, w0), shapes


def plan_sample(ds: DetectionDataset, index: int) -> SamplePlan:
    """Host-side planner: identical rng stream + label math as
    DetectionDataset.__getitem__, zero pixel work."""
    if ds._pack is None:
        raise RuntimeError(
            "augment_device requires cache_images='disk' (the packed memmap)")
    if not ds.augment:
        # the host __getitem__ gates every augmentation behind ds.augment;
        # planning an eval dataset would silently warp/flip its images
        raise RuntimeError("augment_device requires an augment=True dataset")
    index = int(ds.indices[index])
    rng = random.Random(hash((ds.seed, ds.epoch, index)))
    hyp = ds.hyp
    s = ds.imgsz
    n_slots = 8 if hyp["mixup"] > 0 else 4
    tile_idx = np.full(n_slots, -1, np.int32)
    regions = np.zeros((2, 4, 4), np.float32)
    offs = np.zeros((2, 4, 2), np.float32)
    minv = np.stack([np.eye(3, dtype=np.float32)] * 2)
    mix_r = 1.0
    mosaic = ds.augment and rng.random() < hyp["mosaic"]
    if mosaic:
        labels, t4, regions[0], offs[0], minv[0] = _plan_mosaic_warp(ds, index, rng)
        tile_idx[:4] = t4
        meta = {"path": ds.img_files[index], "ori_shape": (s, s), "shapes": None}
        if rng.random() < hyp["mixup"]:
            idx2 = rng.randint(0, ds.n - 1)
            labels2, t4b, regions[1], offs[1], minv[1] = _plan_mosaic_warp(ds, idx2, rng)
            tile_idx[4:8] = t4b
            mix_r = rng.betavariate(32.0, 32.0)
            labels = np.concatenate((labels, labels2), 0)
    else:
        labels, t4, regions[0], offs[0], minv[0], ori, shapes = \
            _plan_letterbox_warp(ds, index, rng)
        tile_idx[: 4] = t4
        meta = {"path": ds.img_files[index], "ori_shape": ori, "shapes": shapes}

    nl = len(labels)
    if nl:
        labels[:, 2:6] = xyxy2xywhn_np(labels[:, 2:6], w=s, h=s, clip=True, eps=1e-3)
    # PixelAugment (dataset._pixel_aug): same rng consumption as the host
    # path; blur/median (p=0.1 each, matching the reference's
    # A.Blur/A.MedianBlur — ~19% of samples draw at least one) run as
    # per-(blur_k, median_k) patch-up programs in the loader rather than in
    # the batch program (throughput at the 0.1 rate measured in PROFILE.md)
    p = ds._pixel_aug
    blur_k = median_k = 0
    if rng.random() < p.p_blur:
        blur_k = rng.choice((3, 5, 7))
    if rng.random() < p.p_median:
        median_k = rng.choice((3, 5, 7))
    gray = rng.random() < p.p_gray
    hsv_on = bool(hyp["hsv_h"] or hyp["hsv_s"] or hyp["hsv_v"])
    hsv_mult = np.ones(3, np.float32)
    if hsv_on:
        u = np.array([rng.uniform(-1, 1) for _ in range(3)])
        hsv_mult = (u * [hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"]] + 1).astype(np.float32)
    flipud = rng.random() < hyp["flipud"]
    if flipud and nl:
        labels[:, 3] = 1 - labels[:, 3]
    fliplr = rng.random() < hyp["fliplr"]
    if fliplr and nl:
        labels[:, 2] = 1 - labels[:, 2]
    minv0 = np.stack([np.eye(3, dtype=np.float32)] * 2)
    shear = np.zeros((2, 2), np.float32)
    needs_3pass = required_shear_pad(hyp, s) > 0
    for k in range(2):
        minv0[k], shear[k] = _decompose_affine(minv[k])
        # If the loader will route this plan to the 3-pass shear warp, the
        # decomposition MUST have succeeded: on failure it returns
        # (minv, zeros) and _warp_affine3 would silently drop the
        # off-diagonal terms, corrupting pixels. Unreachable while
        # required_shear_pad gates bound < 0.5, but fail loudly if a future
        # hyp/gate change breaks that invariant (ADVICE r4).
        if needs_3pass and abs(minv0[k][0, 1]) + abs(minv0[k][1, 0]) > 1e-6:
            raise RuntimeError(
                "affine decomposition failed for a plan on the 3-pass shear "
                f"path (minv={minv[k].tolist()}); this sample would be "
                "silently mis-warped — route it to the gather/host path")
    return SamplePlan(tile_idx=tile_idx, regions=regions, offs=offs,
                      minv=minv, minv0=minv0, shear=shear,
                      mix_r=float(mix_r), hsv_mult=hsv_mult, hsv_on=hsv_on,
                      gray=gray, blur_k=blur_k, median_k=median_k,
                      flipud=flipud,
                      fliplr=fliplr, labels=labels.astype(np.float32),
                      meta=meta)


# ------------------------------------------------------------------ collate
def collate_device(ds: DetectionDataset, plans: List[SamplePlan],
                   max_labels: int = 300, pool=None,
                   as_indices: bool = False) -> Dict[str, Any]:
    """Plans -> batch dict.

    as_indices=False: ship the tiles (the memcpy out of the packed memmap is
    the only per-pixel host work; `pool` spreads it — numpy memcpy releases
    the GIL). as_indices=True: the pack is device-resident, ship only the
    (B, n_slots) int32 tile indices — the host never touches pixels at all."""
    b = len(plans)
    s = ds.imgsz
    n_slots = len(plans[0].tile_idx)
    if as_indices:
        tiles = None
        tile_idx = np.stack([p.tile_idx for p in plans])
    else:
        pack_arr = ds._pack[0]
        tiles = np.zeros((b, n_slots, s, s, 3), np.uint8)

        def fill(i):
            for j, idx in enumerate(plans[i].tile_idx):
                if idx >= 0:
                    tiles[i, j] = pack_arr[idx]

        if pool is not None:
            list(pool.map(fill, range(b)))
        else:
            for i in range(b):
                fill(i)

    from cerberusdet_tpu.data.loaders import pad_labels

    labels = pad_labels([p.labels for p in plans], max_labels)
    aug = {
        "regions": np.stack([p.regions for p in plans]),
        "offs": np.stack([p.offs for p in plans]),
        "minv": np.stack([p.minv for p in plans]),
        "minv0": np.stack([p.minv0 for p in plans]),
        "shear": np.stack([p.shear for p in plans]),
        "mix_r": np.asarray([p.mix_r for p in plans], np.float32),
        "hsv_mult": np.stack([p.hsv_mult for p in plans]),
        "hsv_on": np.asarray([p.hsv_on for p in plans]),
        "gray": np.asarray([p.gray for p in plans]),
        "flipud": np.asarray([p.flipud for p in plans]),
        "fliplr": np.asarray([p.fliplr for p in plans]),
    }
    out = {"aug": aug, "meta": [p.meta for p in plans], **labels}
    ops = [(i, p.blur_k, p.median_k) for i, p in enumerate(plans)
           if p.blur_k or p.median_k]
    if ops:
        # host-side metadata: the loader patches these rare samples through
        # a per-(blur_k, median_k) single-sample program after the batch one
        out["pixel_ops"] = ops
    if as_indices:
        out["tile_idx"] = tile_idx
    else:
        out["tiles"] = tiles
    return out


# ------------------------------------------------------------------- device
def _resolve(src, tile_ids, regions, offs, cx, cy):
    """Value of the mosaic canvas at integer coords (cx, cy): look the point
    up in the 4 disjoint tile regions, else the 114 border.

    src: the tile source — (n, S, S, 3) f32, either this sample's own slots
    or the WHOLE device-resident pack; tile_ids (4,) i32 maps region slot ->
    src row (so the resident path gathers straight from the pack with no
    (B, slots, S, S, 3) intermediate). regions (4,4); offs (4,2);
    cx/cy (H,W) i32."""
    import jax.numpy as jnp

    S = src.shape[1]
    cxf = cx.astype(jnp.float32)
    cyf = cy.astype(jnp.float32)
    inside = ((cxf[None] >= regions[:, 0, None, None])
              & (cxf[None] < regions[:, 2, None, None])
              & (cyf[None] >= regions[:, 1, None, None])
              & (cyf[None] < regions[:, 3, None, None]))  # (4, H, W)
    any_in = inside.any(0)
    tid = jnp.argmax(inside, axis=0)  # first matching region
    off = offs[tid]  # (H, W, 2)
    tx = jnp.clip(cx - off[..., 0].astype(jnp.int32), 0, S - 1)
    ty = jnp.clip(cy - off[..., 1].astype(jnp.int32), 0, S - 1)
    row = jnp.clip(tile_ids, 0, src.shape[0] - 1)[tid]  # (H, W)
    # gather uint8, upcast AFTER: the (N, S, S, 3) source stays u8 in HBM
    val = src[row, ty, tx].astype(jnp.float32)  # (H, W, 3)
    return jnp.where(any_in[..., None], val, PAD)


def _warp(src, tile_ids, regions, offs, minv, out_hw):
    """Inverse-warp bilinear resample: out(x, y) = canvas(minv @ (x, y, 1)),
    cv2.warpAffine/warpPerspective semantics (border 114)."""
    import jax.numpy as jnp
    from jax import lax

    H, W = out_hw
    xs = lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = lax.broadcasted_iota(jnp.float32, (H, W), 0)
    den = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    cx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / den
    cy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / den
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[..., None]
    fy = (cy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    p00 = _resolve(src, tile_ids, regions, offs, x0i, y0i)
    p10 = _resolve(src, tile_ids, regions, offs, x0i + 1, y0i)
    p01 = _resolve(src, tile_ids, regions, offs, x0i, y0i + 1)
    p11 = _resolve(src, tile_ids, regions, offs, x0i + 1, y0i + 1)
    top = p00 + (p10 - p00) * fx
    bot = p01 + (p11 - p01) * fx
    return top + (bot - top) * fy


def _hsv_jitter(g, mult):
    """HSV gain jitter in float (cv2 uint8-HSV scale: H in [0,180), S/V in
    [0,255]); approximates augmentations.py:43-56's integer LUTs."""
    import jax.numpy as jnp

    r, gc, b = g[..., 0], g[..., 1], g[..., 2]
    mx = jnp.maximum(jnp.maximum(r, gc), b)
    mn = jnp.minimum(jnp.minimum(r, gc), b)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    h6 = jnp.where(
        mx == r, ((gc - b) / safe) % 6.0,
        jnp.where(mx == gc, (b - r) / safe + 2.0, (r - gc) / safe + 4.0))
    h = jnp.where(diff > 0, h6 * 30.0, 0.0)  # [0, 180)
    sat = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0) * 255.0, 0.0)
    v = mx
    h = (h * mult[0]) % 180.0
    sat = jnp.clip(sat * mult[1], 0, 255.0)
    v = jnp.clip(v * mult[2], 0, 255.0)
    # back to RGB
    h6 = h / 30.0
    i = jnp.floor(h6)
    f = h6 - i
    sn = sat / 255.0
    p = v * (1 - sn)
    q = v * (1 - sn * f)
    t = v * (1 - sn * (1 - f))
    i = i.astype(jnp.int32) % 6
    rgb = jnp.stack([
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q),
    ], axis=-1)
    return jnp.round(rgb)


def _axis_matrices(minv_row, regions, offs, S_out, S, axis, origin=0):
    """Build the (4, S_out, S) bilinear sampling matrix for one output axis
    of an AXIS-ALIGNED warp (minv has zero off-diagonal spatial terms).

    Each output row y samples canvas coord c = a*y + b; its matrix row has
    <=2 nonzeros — the bilinear weights at floor(c)/floor(c)+1, masked by
    tile t's region interval and shifted by its canvas->tile offset. The
    warp then becomes two MXU matmuls per tile instead of per-element
    gathers (XLA's TPU gather lowering is ~100x off speed-of-light; the
    matmul form measures ~70x faster end-to-end).

    minv_row: (3,) the axis' row of the inverse warp; regions (4, 2) the
    [lo, hi) interval of each tile on this axis; offs (4,) tile offsets;
    axis selects arange coefficient. Returns f32 (4, S_out, S)."""
    import jax.numpy as jnp
    from jax import lax

    # origin > 0: evaluate on the shifted grid y in [-origin, S_out-origin)
    # — subtracted from the (integer-exact) iota rather than folded into the
    # translation, so overlapping coords round bitwise like the unshifted
    # grid's (the 3-pass affine warp's zero-shear case stays exact)
    y = lax.iota(jnp.float32, S_out) - float(origin)
    c = minv_row[axis] * y + minv_row[2]
    c0 = jnp.floor(c)
    w1 = c - c0
    w0 = 1.0 - w1
    c0i = c0.astype(jnp.int32)
    j = lax.iota(jnp.int32, S)
    lo = regions[:, 0, None]   # (4, 1)
    hi = regions[:, 1, None]
    off = offs[:, None].astype(jnp.int32)  # (4, 1)
    M = jnp.zeros((4, S_out, S), jnp.float32)
    for d, w in ((0, w0), (1, w1)):
        v = c0i + d  # (S_out,)
        inb = (v[None].astype(jnp.float32) >= lo) & (v[None].astype(jnp.float32) < hi)
        eq = (v[None, :, None] - off[..., None]) == j[None, None, :]
        M = M + w[None, :, None] * (eq & inb[..., None])
    return M


def _warp_mm(src, tile_ids, regions, offs, minv, out_hw, origin=0):
    """Axis-aligned inverse-warp as MXU matmuls: out = sum_t Y_t @ tile_t
    @ X_t^T + 114*(1 - sum_t ycov_t (x) xcov_t). Bit-compatible with _warp
    for integer translations; same corner/region semantics throughout."""
    import jax.numpy as jnp

    H, W = out_hw
    S = src.shape[1]
    Y = _axis_matrices(minv[1], regions[:, (1, 3)], offs[:, 1], H, S, axis=1,
                       origin=origin)
    X = _axis_matrices(minv[0], regions[:, (0, 2)], offs[:, 0], W, S, axis=0,
                       origin=origin)
    tiles = src[jnp.clip(tile_ids, 0, src.shape[0] - 1)].astype(jnp.float32)
    G = jnp.einsum("tos,tsjc->tojc", Y, tiles)          # contract tile rows
    out = jnp.einsum("tpj,tojc->opc", X, G)             # contract tile cols
    cov = jnp.einsum("to,tp->op", Y.sum(-1), X.sum(-1))
    return out + PAD * (1.0 - cov)[..., None]


def _hat_weights(pos, K):
    """Bilinear hat weights of continuous positions over the static shift
    range [0, 2K]: (L,) -> (L, 2K+1)."""
    import jax.numpy as jnp
    from jax import lax

    d = lax.iota(jnp.float32, 2 * K + 1)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - d))


def _warp_affine3(src, tile_ids, regions, offs, minv0, shear, out_hw, K):
    """General-affine inverse warp as THREE gather-free passes.

    minv = M0 @ Shx @ Shy (see _decompose_affine):
      pass A: I0 = canvas o M0 on a K-padded grid via the axis-aligned
              two-matmul resample (_warp_mm with origin=K: the grid shift
              stays in the integer iota so overlapping coords round
              bitwise like the unpadded grid);
      pass B: x-shear — I1[r, x] = I0[r, x + K + h*(r - K)], a per-row
              fractional shift bounded by K, computed as a static sum of
              2K+1 column slices weighted by bilinear hats (<= 2 nonzero
              per row);
      pass C: y-shear — out[y, x] = I1[y + K + g*x, x], the same with row
              slices and per-column weights.

    Composes three bilinear resamples where cv2 does one, so general warps
    match cv2 up to a few intensity levels (tested); h == g == 0 degenerates
    to exact slices of pass A (bitwise the axis-aligned path). K must
    satisfy |h|*(H+K) <= K-1 and |g|*W <= K-1 — guaranteed by
    required_shear_pad's bound."""
    import jax.numpy as jnp
    from jax import lax

    H, W = out_hw
    Hp, Wp = H + 2 * K, W + 2 * K
    I0 = _warp_mm(src, tile_ids, regions, offs, minv0, (Hp, Wp), origin=K)
    h, g = shear[0], shear[1]
    r = lax.iota(jnp.float32, Hp)
    wB = _hat_weights(K + h * (r - K), K)  # (Hp, 2K+1)
    I1 = jnp.zeros((Hp, W, I0.shape[-1]), I0.dtype)
    for d in range(2 * K + 1):
        I1 = I1 + wB[:, d, None, None] * lax.slice_in_dim(I0, d, d + W, axis=1)
    x = lax.iota(jnp.float32, W)
    wC = _hat_weights(K + g * x, K)  # (W, 2K+1)
    out = jnp.zeros((H, W, I0.shape[-1]), I0.dtype)
    for d in range(2 * K + 1):
        out = out + wC[None, :, d, None] * lax.slice_in_dim(I1, d, d + H, axis=0)
    return out


def _box_blur(g, k):
    """cv2.blur semantics: k x k normalized box filter, BORDER_REFLECT_101
    (cv2's default), separable as row+column slice sums. Input integral
    floats; caller rounds."""
    import jax.numpy as jnp

    r = k // 2
    ph = jnp.pad(g, ((0, 0), (r, r), (0, 0)), mode="reflect")
    gx = sum(ph[:, d:d + g.shape[1]] for d in range(k))
    pv = jnp.pad(gx, ((r, r), (0, 0), (0, 0)), mode="reflect")
    return sum(pv[d:d + g.shape[0]] for d in range(k)) * (1.0 / (k * k))


def _median_blur(g, k):
    """cv2.medianBlur semantics: exact k x k window median (k odd, window
    size odd -> the middle order statistic), BORDER_REPLICATE (cv2's
    median-specific border)."""
    import jax.numpy as jnp

    r = k // 2
    H, W = g.shape[:2]
    p = jnp.pad(g, ((r, r), (r, r), (0, 0)), mode="edge")
    stack = jnp.stack([p[dy:dy + H, dx:dx + W]
                       for dy in range(k) for dx in range(k)], axis=-1)
    return jnp.sort(stack, axis=-1)[..., (k * k) // 2]


def make_augment_fn(imgsz: int, n_slots: int, resident: bool = False,
                    axis_aligned: bool = False, shear_pad: int = 0,
                    pixel_ops=(0, 0)):
    """Build the jitted augmentation program.

    resident=False: (tiles (B, n_slots, S, S, 3) u8, aug) -> (B, S, S, 3) u8
        — tiles shipped per batch (fine over PCIe/DMA on a real TPU host).
    resident=True: (pack (N, S, S, 3) u8, tile_idx (B, n_slots) i32, aug)
        — the WHOLE packed image cache lives in HBM (uploaded once); per
        batch only indices + warp params cross the host link (KBs). The
        corner gathers index the pack directly, so no (B, n_slots, S, S, 3)
        intermediate is ever materialized. This is the default whenever the
        pack fits the budget — data lives where compute is.
    axis_aligned=True: the warps carry no rotation/shear/perspective
        (degrees == shear == perspective == 0 — YOLOv8's defaults and
        hyp.cerber-default), so the bilinear resample is separable and
        runs as MXU matmuls (_warp_mm) instead of element gathers.
    shear_pad=K>0: rotating/shearing hyps with perspective == 0 (e.g. the
        tuned hyp.cerber-voc_obj365 recipes) run the 3-pass decomposed
        affine warp (_warp_affine3) — pass A is the same MXU-matmul
        resample on a K-padded grid, then two bounded gather-free shear
        passes. Use required_shear_pad(hyp, imgsz) for K.
    pixel_ops=(blur_k, median_k): static box-blur / median-blur kernels
        applied between mixup and grayscale (the host PixelAugment point,
        reference augmentations.py:11-40 Blur/MedianBlur p=0.01 each). The
        batch program keeps (0, 0); the loader compiles rare per-sample
        variants on first occurrence and patches those rows.
    """
    import jax
    import jax.numpy as jnp

    if shear_pad > 0:
        def warp(src, tid, reg, off, mv, mv0, sh, hw):
            return _warp_affine3(src, tid, reg, off, mv0, sh, hw, shear_pad)
    elif axis_aligned:
        def warp(src, tid, reg, off, mv, mv0, sh, hw):
            return _warp_mm(src, tid, reg, off, mv, hw)
    else:
        def warp(src, tid, reg, off, mv, mv0, sh, hw):
            return _warp(src, tid, reg, off, mv, hw)

    def one(src, tile_idx, regions, offs, minv, minv0, shear, mix_r,
            hsv_mult, hsv_on, gray, flipud, fliplr):
        # cv2 warps round to uint8 before any later stage does arithmetic
        g = jnp.round(warp(src, tile_idx[0:4], regions[0], offs[0], minv[0],
                           minv0[0], shear[0], (imgsz, imgsz)))
        if n_slots == 8:
            g2 = jnp.round(warp(src, tile_idx[4:8], regions[1], offs[1],
                                minv[1], minv0[1], shear[1], (imgsz, imgsz)))
            # host mixup: (im*r + im2*(1-r)).astype(uint8) — trunc toward 0
            g = jnp.floor(g * mix_r + g2 * (1.0 - mix_r))
        if pixel_ops[0]:
            g = jnp.round(_box_blur(g, pixel_ops[0]))
        if pixel_ops[1]:
            g = _median_blur(g, pixel_ops[1])
        lum = jnp.round(0.299 * g[..., 0] + 0.587 * g[..., 1] + 0.114 * g[..., 2])
        g = jnp.where(gray, jnp.repeat(lum[..., None], 3, -1), g)
        g = jnp.where(hsv_on, _hsv_jitter(g, hsv_mult), g)
        g = jnp.where(flipud, g[::-1], g)
        g = jnp.where(fliplr, g[:, ::-1], g)
        return jnp.clip(g, 0, 255).astype(jnp.uint8)

    # src: per-sample slots (mapped) or the shared pack (broadcast)
    batched = jax.vmap(one, in_axes=(None if resident else 0,) + (0,) * 12)

    if resident:

        @jax.jit
        def augment_batch(pack, tile_idx, aug):
            return batched(pack, tile_idx, aug["regions"], aug["offs"],
                           aug["minv"], aug["minv0"], aug["shear"],
                           aug["mix_r"], aug["hsv_mult"],
                           aug["hsv_on"], aug["gray"], aug["flipud"],
                           aug["fliplr"])

        return augment_batch

    @jax.jit
    def augment_batch(tiles, aug):
        b = tiles.shape[0]
        idx = jnp.tile(jnp.arange(n_slots, dtype=jnp.int32), (b, 1))
        return batched(tiles, idx, aug["regions"],
                       aug["offs"], aug["minv"], aug["minv0"], aug["shear"],
                       aug["mix_r"], aug["hsv_mult"], aug["hsv_on"],
                       aug["gray"], aug["flipud"], aug["fliplr"])

    return augment_batch
