"""640px golden parity gate (VERDICT r2 item 1): fp forward parity and
end-to-end detection-dict parity vs the reference at PRODUCTION resolution,
2-task v8x config after the reference's own sequential_split.

Why fp64 (documented tolerance rationale):
  A BN-calibrated random-init v8x is numerically chaotic at 640 — measured
  here before writing this test: the reference's own fp32 forward differs
  from its fp64 forward by ~0.03, and a 1e-6 input perturbation moves
  outputs by ~0.17 (amplification ~1.7e5 through ~60 conv+BN+SiLU layers).
  Cross-framework fp32 conv summation-order differences are therefore
  amplified to O(0.1-1) regardless of implementation correctness — fp32
  parity at 640 is unprovable even between the reference and itself.
  In fp64 the per-op rounding (~1e-16 rel) amplifies to ~1e-10, far below
  assertable tolerances, so any real semantic divergence (strides, padding,
  anchor grids at 8400 points, decode, BN folding) shows up unmasked.

  Measured fp64 cross-framework error at 640 (box coords up to 640 px):
  box 2.7e-4 abs (~4e-7 rel, dominated by our f32 output cast), score 9e-7.
  Asserted at >4x margin: box atol 2e-3, score atol 1e-5.

Why "briefly-trained" == BN-calibrated + crafted heads:
  Random-init deep nets collapse to ~0 activations in eval mode (BN running
  stats sit at identity), so NMS sees nothing. One train-mode forward with
  BN momentum=1 writes real batch statistics into the running stats (the
  cheap equivalent of a few warmup steps), and the cls-head final convs are
  then rescaled (gain 3, rank-30 logit centered at 0) so ~20-40 detections
  survive with scores spread well clear of the conf threshold — survivor
  sets are stable under fp64 noise by construction.

Parity targets: cerberusdet/models/cerberus.py:704-737 (sequential_split),
cerberusdet_inference.py:85-186 (predict contract),
cerberusdet_preprocessor.py:42-74, models/experimental.py:99-139
(attempt_load fuse path), utils/torch_utils.py:191-217 (fuse arithmetic —
performed in f64 on BOTH sides here so fuse rounding stays below the chaos
floor).
"""

import functools
from pathlib import Path

import numpy as np
import pytest

REF_CFG = "/root/reference/cerberusdet/models/yolov8x_voc_obj365.yaml"
OUR_CFG = "configs/models/yolov8x_2task.yaml"
TASKS = ["a", "b"]
NCS = [3, 5]
NAMES = {"a": ["a0", "a1", "a2"], "b": ["b0", "b1", "b2", "b3", "b4"]}
ORIG_SHAPE = (720, 1280)


def _synthetic_photo():
    """Structured 720x1280 BGR uint8: gradients + rectangles + mild noise
    (deterministic), so conv responses vary spatially."""
    rng = np.random.default_rng(7)
    h, w = ORIG_SHAPE
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h),
                    ((xx + yy) * 255 // (h + w))], -1).astype(np.float32)
    for _ in range(12):
        cx, cy = rng.integers(0, w), rng.integers(0, h)
        bw, bh = rng.integers(40, 300), rng.integers(40, 300)
        img[max(0, cy - bh // 2):cy + bh // 2,
            max(0, cx - bw // 2):cx + bw // 2] = rng.integers(0, 255, 3)
    img += rng.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def crafted(tmp_path_factory):
    """Reference 2-task v8x, split by ITS OWN sequential_split, BN-calibrated
    at 640, cls heads crafted for stable NMS, saved as a reference-format
    module-pickled fp16 ckpt. Returns (ckpt_path, photo)."""
    from tests.ref_torch import load_reference_cerberusdet

    Ref = load_reference_cerberusdet()
    if Ref is None:
        pytest.skip("reference torch model not importable")
    import copy

    import torch
    import yaml

    torch.manual_seed(0)
    ref = Ref(task_ids=TASKS, nc=NCS, cfg=REF_CFG, verbose=False).float()
    cerber = yaml.safe_load(open(REF_CFG))["cerber"]
    ref.sequential_split(cerber, torch.device("cpu"))
    ref = ref.float()

    photo = _synthetic_photo()
    from cerberusdet.data.augmentations import letterbox as ref_letterbox

    def to_tensor(im):
        lb = ref_letterbox(im, 640, stride=32, auto=False)[0]
        lb = np.ascontiguousarray(lb.transpose(2, 0, 1)[::-1])
        return torch.from_numpy(lb).float().unsqueeze(0) / 255.0

    rng = np.random.default_rng(3)
    noise = np.clip(rng.normal(128, 60, photo.shape), 0, 255).astype(np.uint8)
    calib = torch.cat([to_tensor(photo), to_tensor(noise)])

    # BN calibration: one train-mode pass, momentum=1 => running stats become
    # the batch stats, layer by layer in a single forward
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    ref.train()
    with torch.no_grad():
        ref(calib)
    ref.eval()

    # craft cls towers: logit' = G*logit - G*q30 (rank-30 logit -> score 0.5)
    G = 3.0
    with torch.no_grad():
        out = ref(to_tensor(photo))
        for task in TASKS:
            p = out[task]
            p = p[0] if isinstance(p, (tuple, list)) else p
            logit = torch.logit(p[:, 4:, :].clamp(1e-12, 1 - 1e-12)).flatten()
            q30 = torch.sort(logit, descending=True).values[30].item()
            head = ref.get_head(task)
            for seq in head.cv3:
                seq[-1].weight.mul_(G)
                seq[-1].bias.mul_(G).add_(-G * q30)

    ref.names = dict(NAMES)
    for attr in ("rep_tensors", "middle_outputs"):
        if hasattr(ref, attr):
            setattr(ref, attr, {})
    path = tmp_path_factory.mktemp("golden640") / "crafted.pt"
    # the reference ckpt format: module-pickled, fp16 (models_manager.py:296)
    torch.save({"epoch": 0, "model": copy.deepcopy(ref).half(), "ema": None},
               path)
    return str(path), photo


def _ref_letterboxed_input(photo):
    import torch

    from cerberusdet.data.augmentations import letterbox as ref_letterbox

    lb = ref_letterbox(photo, 640, stride=32, auto=False)[0]
    lb = np.ascontiguousarray(lb.transpose(2, 0, 1)[::-1])
    return torch.from_numpy(lb).double().unsqueeze(0) / 255.0


@pytest.mark.slow
def test_golden_640_forward_parity_fp64(crafted):
    """(a) raw forward parity at (1,640,640,3), unfused AND fused."""
    import torch

    import jax
    import jax.numpy as jnp

    from cerberusdet_tpu.manager.pt_import import import_pt
    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.nn.module import Ctx

    path, photo = crafted
    _load = torch.load
    torch.load = functools.partial(_load, weights_only=False)
    try:
        ref = _load(path, map_location="cpu", weights_only=False)["model"]
    finally:
        torch.load = _load
    ref = ref.float().eval().double()

    t = _ref_letterboxed_input(photo)
    with torch.no_grad():
        raw = ref(t)

    model = CerberusModel(OUR_CFG, TASKS, NCS)
    with jax.enable_x64():
        params = model.init(jax.random.PRNGKey(0))
        params = import_pt(model, params, path)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        x = jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
        fwd = jax.jit(lambda p, xx: model(p, xx, Ctx(train=False,
                                                     dtype=jnp.float64)))
        for variant, p in (("unfused", params), ("fused", model.fuse(params))):
            ours = jax.tree_util.tree_map(np.asarray, fwd(p, x))
            for task in TASKS:
                r = raw[task]
                r = (r[0] if isinstance(r, (tuple, list)) else r)
                r = r.numpy().transpose(0, 2, 1)
                o = np.asarray(ours[task][0], np.float64)
                assert o.shape == r.shape, (variant, task, o.shape, r.shape)
                np.testing.assert_allclose(
                    o[..., :4], r[..., :4], atol=2e-3, rtol=1e-6,
                    err_msg=f"{variant}/{task} boxes @640")
                np.testing.assert_allclose(
                    o[..., 4:], r[..., 4:], atol=1e-5,
                    err_msg=f"{variant}/{task} scores @640")


@pytest.mark.slow
def test_golden_640_e2e_detection_parity(crafted):
    """(b) full-pipeline detection-dict parity on a real image through both
    preprocessors: preprocess -> fused forward -> per-task NMS -> global
    class remap -> cross-task NMS -> scale to original shape -> dicts."""
    import torch

    import jax
    import jax.numpy as jnp

    from cerberusdet_tpu.infer.inference import CerberusDetInference as OurInf
    from cerberusdet_tpu.infer.preprocessor import CerberusPreprocessor as OurPre
    from cerberusdet_tpu.manager.pt_import import import_pt
    from cerberusdet_tpu.models.cerberus import CerberusModel

    path, photo = crafted

    # --- reference pipeline (its real attempt_load entry; old-torch
    # weights_only semantics restored around the module-pickled load)
    _load = torch.load
    torch.load = functools.partial(_load, weights_only=False)
    try:
        from cerberusdet.cerberusdet_inference import (
            CerberusDetInference as RefInf,
        )
        from cerberusdet.cerberusdet_preprocessor import (
            CerberusPreprocessor as RefPre,
        )

        inf = RefInf(weights=path, device="cpu", conf_thres=0.25,
                     iou_thres=0.45, iou_thres_between_tasks=0.8)
        # re-fuse in f64: attempt_load fused in f32, whose rounding the
        # chaotic net would amplify past NMS stability (see module docstring)
        raw_model = _load(path, map_location="cpu",
                          weights_only=False)["model"]
    finally:
        torch.load = _load
    # the reference's fuse_conv_and_bn builds fresh nn.Conv2d modules in the
    # DEFAULT dtype — set it to f64 so the fused weights are computed in f64
    torch.set_default_dtype(torch.float64)
    try:
        inf.model = raw_model.float().double().fuse().eval()
    finally:
        torch.set_default_dtype(torch.float32)
    pre = RefPre(img_size=640, stride=inf.stride, auto=False)
    t = pre.preprocess([photo], torch.device("cpu")).double()
    ref_dets = inf.predict(t, original_shape=ORIG_SHAPE)[0]
    assert 5 <= len(ref_dets) <= 100, (
        f"crafting produced {len(ref_dets)} detections — recalibrate")

    # --- our pipeline
    model = CerberusModel(OUR_CFG, TASKS, NCS)
    with jax.enable_x64():
        params = model.init(jax.random.PRNGKey(0))
        params = import_pt(model, params, path)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        ours = OurInf(model=model, params=params, names=NAMES,
                      conf_thres=0.25, iou_thres=0.45,
                      iou_thres_between_tasks=0.8, half=False,
                      dtype=jnp.float64)
        our_pre = OurPre(img_size=640, stride=32, auto=False,
                         prefer_device=False)
        batch, shapes = our_pre.preprocess([photo])
        # the host preprocessors agree exactly (pinned by test_letterbox)
        np.testing.assert_array_equal(batch.transpose(0, 3, 1, 2),
                                      t.float().numpy())
        our_dets = ours.predict(batch.astype(np.float64),
                                original_shape=shapes[0])[0]

    assert len(our_dets) == len(ref_dets), (
        f"survivor count {len(our_dets)} vs reference {len(ref_dets)}")

    def key(d):
        return (d["task"], d["label"], -d["score"])

    for o, r in zip(sorted(our_dets, key=key), sorted(ref_dets, key=key)):
        assert o["task"] == r["task"] and o["label"] == r["label"], (o, r)
        assert o["label_name"] == r["label_name"]
        assert abs(o["score"] - r["score"]) < 1e-4, (o, r)
        assert max(abs(a - b) for a, b in zip(o["box"], r["box"])) <= 1, (o, r)
