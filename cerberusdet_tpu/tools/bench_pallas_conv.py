"""Micro-benchmark: the implicit-GEMM int8 conv kernel vs XLA's conv
emitter on the v8x misaligned-channel 3x3 shape classes (PROFILE round-4
"int8 roofline" — the one structural lever identified).

Times each variant as a K-iteration jitted dependent chain (bench.py's
honest-loop methodology) at the exact (B, H, W, C) the 2-task v8x @640 b32
graph runs. Also verifies the int32 path bitwise on-device first.

Usage: python -m cerberusdet_tpu.tools.bench_pallas_conv [--iters 30]
       [--batch 32] [--tr 0]
Prints one JSON line per shape class.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# (H, W, Ci, Co, trace ms/iter for the class, count) from PROFILE round-4
SHAPES = [
    (160, 160, 80, 80, "3x3x80x80@160 (stage-2 C2f chunks)"),
    (80, 80, 160, 160, "3x3x160x160@80 (stage-3 C2f chunks)"),
    (40, 40, 320, 320, "3x3x320x320@40 (stage-4/neck chunks)"),
]


def bench(fn, x, p, iters):
    """K-iteration jitted dependent chain (bench.py methodology: one
    dispatch, on-device data dependency between iterations — per-call
    relay round trips measured ~25 ms and would swamp sub-ms convs)."""

    @partial(jax.jit, static_argnames=("k",))
    def loop(x, p, k):
        def body(i, xx):
            y = fn(xx, p)
            sink = (y[0, 0, 0, :].astype(jnp.float32).sum() * 0.0)
            return xx + sink.astype(xx.dtype)

        return jax.lax.fori_loop(0, k, body, x)[0, 0, 0, :]

    np.asarray(loop(x, p, iters))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(x, p, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tr", type=int, default=0)
    args = ap.parse_args()

    from cerberusdet_tpu.nn.module import conv2d_int8, quantize_act, silu
    from cerberusdet_tpu.ops.conv_int8_pallas import conv3x3_s8

    rng = np.random.default_rng(0)
    for h, w, ci, co, label in SHAPES:
        wq = np.clip(rng.normal(0, 40, (3, 3, ci, co)), -127,
                     127).astype(np.int8)
        p = {"w_q": jnp.asarray(wq),
             "s_w": jnp.asarray(rng.uniform(1e-3, 1e-2, co), jnp.float32),
             "s_x": jnp.float32(0.05),
             "b": jnp.asarray(rng.normal(0, 0.2, co), np.float32)}
        x = jnp.asarray(
            rng.integers(-127, 128, (args.batch, h, w, ci)), jnp.int8)

        def xla_fn(x, p):
            return silu(conv2d_int8(x, p)).astype(jnp.bfloat16)

        def pallas_fn(x, p):
            return conv3x3_s8(x, p, act=True, tr=args.tr)

        # on-device bitwise check of the integer path first
        small = x[:1]
        ref = jax.lax.conv_general_dilated(
            small, p["w_q"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        got = conv3x3_s8(small, p, raw=True, tr=args.tr)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        t_xla = bench(xla_fn, x, p, args.iters)
        t_pl = bench(pallas_fn, x, p, args.iters)
        macs = args.batch * h * w * co * 9 * ci
        peak = 394e12
        out = {"shape": label,
               "xla_ms": round(t_xla * 1e3, 3),
               "pallas_ms": round(t_pl * 1e3, 3),
               "speedup": round(t_xla / t_pl, 3),
               "xla_pct_peak": round(2 * macs / peak / t_xla * 100, 1),
               "pallas_pct_peak": round(2 * macs / peak / t_pl * 100, 1)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
