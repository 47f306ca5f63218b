"""Implicit-GEMM int8 conv kernel (ops/conv_int8_pallas.py) vs the XLA
formulation (nn/module.py:conv2d_int8).

Exactness contract: the int32 accumulation is BITWISE equal (associative
integer sums — pinned via the raw=True hook); the float dequant epilogue
agrees to 1 bf16 ulp (either formulation may FMA-contract the
multiply-add), and the s8 requantized output to 1 integer step at round
boundaries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from cerberusdet_tpu.nn.module import conv2d_int8, quantize_act, silu
from cerberusdet_tpu.ops.conv_int8_pallas import (
    _pick_tr,
    conv3x3_s8,
    eligible,
)

pytestmark = pytest.mark.smoke


def _ptq_params(rng, ci, co):
    w = rng.normal(0, 0.4, (3, 3, ci, co)).astype(np.float32)
    s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    return {
        "w_q": jnp.asarray(w_q),
        "s_w": jnp.asarray(s_w, jnp.float32),
        "s_x": jnp.float32(rng.uniform(0.01, 0.1)),
        "b": jnp.asarray(rng.normal(0, 0.2, co), np.float32),
    }


def _ulps_bf16(a, b):
    """|a - b| measured in bf16 ulps at b's magnitude."""
    a = np.asarray(a).astype(np.float32)
    b = np.asarray(b).astype(np.float32)
    ulp = np.maximum(np.abs(b), 2.0 ** -126) * 2.0 ** -8
    return np.abs(a - b) / ulp


@pytest.mark.parametrize("ci,co,hw", [(160, 160, 16), (80, 80, 24),
                                      (160, 320, 8), (48, 80, 16)])
def test_int32_accumulation_bitwise(ci, co, hw):
    rng = np.random.default_rng(ci + co)
    p = _ptq_params(rng, ci, co)
    x = jnp.asarray(rng.normal(0, 1, (2, hw, hw, ci)), jnp.float32)
    xq = quantize_act(x, p["s_x"])
    ref = lax.conv_general_dilated(
        xq, p["w_q"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    got = conv3x3_s8(x, p, raw=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("ci,co,hw", [(160, 160, 16), (80, 80, 24)])
def test_epilogue_one_ulp(ci, co, hw):
    rng = np.random.default_rng(ci * co)
    p = _ptq_params(rng, ci, co)
    x = jnp.asarray(rng.normal(0, 1, (2, hw, hw, ci)), jnp.float32)
    ref = silu(conv2d_int8(x, p)).astype(jnp.bfloat16)
    got = conv3x3_s8(x, p, act=True, interpret=True)
    u = _ulps_bf16(got, ref)
    assert u.max() <= 2.01, f"max ulp {u.max()}"  # binade-straddling round
    assert (u > 0).mean() < 1e-3  # near-universal bitwise agreement


def test_row_tiling_edges():
    """TR < H exercises the halo top/bottom branches; every tiling must
    agree with the untiled result bitwise (integer path)."""
    rng = np.random.default_rng(0)
    p = _ptq_params(rng, 80, 80)
    x = jnp.asarray(rng.normal(0, 1, (1, 12, 12, 80)), jnp.float32)
    base = np.asarray(conv3x3_s8(x, p, tr=12, raw=True, interpret=True))
    for tr in (1, 2, 3, 4, 6):
        got = np.asarray(conv3x3_s8(x, p, tr=tr, raw=True, interpret=True))
        np.testing.assert_array_equal(got, base, err_msg=f"tr={tr}")


def test_s8_input_and_q_out():
    """Pre-quantized s8 input passes through; q_out_scale requantizes in
    the epilogue like module.quantize_act (<=1 int step at FMA-shifted
    round boundaries)."""
    rng = np.random.default_rng(3)
    p = _ptq_params(rng, 80, 160)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 80)), jnp.float32)
    xq = quantize_act(x, p["s_x"])
    ref = silu(conv2d_int8(xq, p))
    qs = jnp.float32(float(jnp.max(jnp.abs(ref))) / 127.0)

    got_bf16 = conv3x3_s8(xq, p, interpret=True)
    assert _ulps_bf16(got_bf16, ref.astype(jnp.bfloat16)).max() <= 2.01

    got_q = conv3x3_s8(xq, p, q_out_scale=qs, interpret=True)
    dq = np.abs(np.asarray(got_q, np.int32)
                - np.asarray(quantize_act(ref, qs), np.int32))
    assert dq.max() <= 1 and (dq > 0).mean() < 1e-3


def test_no_act():
    rng = np.random.default_rng(5)
    p = _ptq_params(rng, 80, 80)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 80)), jnp.float32)
    ref = conv2d_int8(x, p).astype(jnp.bfloat16)
    got = conv3x3_s8(x, p, act=False, interpret=True)
    assert _ulps_bf16(got, ref).max() <= 2.01


def test_eligibility_and_tr():
    rng = np.random.default_rng(7)
    p = _ptq_params(rng, 160, 160)
    assert eligible(p, 3, 1, 1, 1)
    assert not eligible(p, 3, 2, 1, 1)
    assert not eligible({"w": None}, 3, 1, 1, 1)
    p128 = _ptq_params(rng, 128, 128)
    assert not eligible(p128, 3, 1, 1, 1)  # aligned: XLA wins, stay there
    assert 80 % _pick_tr(80, 80, 160) == 0
