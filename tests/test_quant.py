"""int8 PTQ unit tests (quant/ptq.py). Speed/mAP measurements live in
PROFILE.md (real-chip); here we pin the quantization MATH and the plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cerberusdet_tpu.nn.layers import Conv
from cerberusdet_tpu.nn.module import Ctx
from cerberusdet_tpu.quant import calibrate_amax, quantize_params, select_all
from cerberusdet_tpu.quant.ptq import select_deep


def _fused_conv_params(rng, c1, c2, k):
    w = rng.normal(0, 0.1, (k, k, c1, c2)).astype(np.float32)
    b = rng.normal(0, 0.1, (c2,)).astype(np.float32)
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def test_int8_conv_matches_manual_quantized_math():
    """The device int8 path == the numpy reference of the same scheme
    (per-tensor activation scale, per-out-channel weight scale, int32
    accumulation, dequant + bias)."""
    rng = np.random.default_rng(0)
    c1, c2, k, hw = 8, 6, 3, 16
    layer = Conv(c1, c2, k=k, s=1, act=False)
    p = _fused_conv_params(rng, c1, c2, k)
    x = rng.uniform(-2, 2, (1, hw, hw, c1)).astype(np.float32)

    amax = {("conv",): float(np.abs(x).max())}
    q = quantize_params({"conv": p}, amax, select=select_all)["conv"]
    assert q["w_q"].dtype == jnp.int8 and q["s_w"].shape == (c2,)

    y = np.asarray(layer(q, jnp.asarray(x), Ctx(train=False), ("conv",)))

    # numpy reference of the exact same scheme
    s_x = np.abs(x).max() / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127).astype(np.int32)
    w = np.asarray(p["w"], np.float64)
    s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int32)
    xp = np.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((1, hw, hw, c2), np.int64)
    for i in range(hw):
        for j in range(hw):
            patch = xp[0, i:i + k, j:j + k, :]  # (k,k,c1)
            ref[0, i, j] = np.tensordot(patch, w_q, axes=([0, 1, 2], [0, 1, 2]))
    ref_f = ref * (s_x * s_w) + np.asarray(p["b"])
    np.testing.assert_allclose(y, ref_f.astype(np.float32), rtol=1e-5, atol=1e-5)


def test_quantized_forward_tracks_fp32_on_smooth_input():
    """A single real Conv: int8 output within ~1% relative of fp32."""
    rng = np.random.default_rng(1)
    c1, c2 = 16, 32
    layer = Conv(c1, c2, k=3, s=1)
    p = _fused_conv_params(rng, c1, c2, 3)
    x = rng.uniform(-1, 1, (2, 32, 32, c1)).astype(np.float32)
    y_f = np.asarray(layer(p, jnp.asarray(x), Ctx(train=False), ("c",)))
    q = quantize_params({"c": p}, {("c",): float(np.abs(x).max())},
                        select=select_all)["c"]
    y_q = np.asarray(layer(q, jnp.asarray(x), Ctx(train=False), ("c",)))
    scale = np.abs(y_f).max()
    assert np.abs(y_q - y_f).max() / scale < 0.02


def test_calibrate_amax_and_select_deep():
    from cerberusdet_tpu.models.cerberus import CerberusModel

    model = CerberusModel("configs/models/yolov8n_2task.yaml", ["a", "b"], [2, 3])
    fused = model.fuse(model.init(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
    amax = calibrate_amax(model, fused, batches, dtype=jnp.float32)
    assert len(amax) > 50 and all(v >= 0 for v in amax.values())
    # amax is a max over batches: a second, larger batch can only increase it
    amax2 = calibrate_amax(model, fused, batches + [2.0 * batches[0]],
                           dtype=jnp.float32)
    assert all(amax2[k] >= amax[k] for k in amax)

    q_all = quantize_params(fused, amax, select=select_all)
    q_deep = quantize_params(fused, amax, select=select_deep(64))

    def count(d):
        return sum((1 if "w_q" in v else 0) + count(v)
                   for v in d.values() if isinstance(v, dict))

    assert count(q_all) == len(amax)
    assert 0 < count(q_deep) < count(q_all)
    # quantized model still runs end-to-end and returns finite outputs
    x = jnp.asarray(batches[0])
    out = model(q_deep, x, Ctx(train=False))
    for t, (pred, _) in out.items():
        assert bool(jnp.all(jnp.isfinite(pred)))


def test_inference_api_int8_smoke():
    from cerberusdet_tpu.infer.inference import CerberusDetInference

    model_cfg = "configs/models/yolov8n_2task.yaml"
    from cerberusdet_tpu.models.cerberus import CerberusModel

    model = CerberusModel(model_cfg, ["a", "b"], [2, 3])
    params = model.init(jax.random.PRNGKey(0))
    inf = CerberusDetInference(
        model=model, params=params, names={"a": ["x", "y"], "b": ["p", "q", "r"]},
        img_size=64, half=False, int8="all")
    batch = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    res = inf.predict(batch, original_shape=(64, 64))
    assert isinstance(res, list) and isinstance(res[0], list)
