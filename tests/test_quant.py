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


@pytest.mark.smoke
def test_act_quant_propagation_bitwise_and_annotated():
    """propagate_act_quant only moves WHERE quantization happens (into
    producers, across concat/upsample/maxpool — all commute exactly): the
    full 2-task model's eval outputs must be BITWISE identical with and
    without the annotations, and the annotations must actually land on
    neck Concat/Upsample uids."""
    from cerberusdet_tpu.models.cerberus import CerberusModel

    model = CerberusModel("configs/models/yolov8n_2task.yaml",
                          ["a", "b"], [3, 5])
    fused = model.fuse(model.init(jax.random.PRNGKey(0)))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3),
                             jnp.float32)
    amax = calibrate_amax(model, fused, [img], dtype=jnp.float32)
    q_plain = quantize_params(fused, amax, select=select_all)
    q_prop = quantize_params(fused, amax, select=select_all, model=model)

    q_in = [uid for uid, sub in q_prop.items()
            if isinstance(sub, dict) and "q_in" in sub]
    q_out = [uid for uid, sub in q_prop.items()
             if isinstance(sub, dict) and "__q_out__" in sub]
    assert q_in, "no Concat/Upsample q_in annotations were produced"
    assert q_out, "no producer __q_out__ annotations were produced"
    # int8-all on the standard v8 graph: the neck outputs feeding the heads
    # must carry producer-side quantization (identical tower-entry scales)
    assert any(u.startswith("n") for u in q_out), q_out

    def run(p):
        out = model(p, img, Ctx(train=False, dtype=jnp.float32))
        return {t: np.asarray(pred) for t, (pred, _f) in out.items()}

    a, b = run(q_plain), run(q_prop)
    for t in a:
        np.testing.assert_array_equal(a[t], b[t])


@pytest.mark.smoke
def test_int8_maxpool_commutes_with_quantize():
    """max_pool(int8) must equal quantize(max_pool(bf16-ish)) — the SPPF
    reorder's correctness condition (round/clip are monotone)."""
    from cerberusdet_tpu.nn.layers import max_pool
    from cerberusdet_tpu.nn.module import quantize_act

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, (2, 16, 16, 8)).astype(np.float32))
    s = jnp.float32(4.0 / 127.0)
    a = np.asarray(max_pool(quantize_act(x, s), 5))
    b = np.asarray(quantize_act(max_pool(x, 5), s))
    np.testing.assert_array_equal(a, b)
