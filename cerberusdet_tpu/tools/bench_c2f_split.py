"""C2f concat-elimination measurement (VERDICT r2 item 4).

The C2f block ends with concat(2+n chunks) -> 1x1 conv (common.py:174-197).
The concat materializes (2+n)*c channels in HBM (4.8 ms/iter in the round-2
trace). Algebraically the 1x1 conv distributes over the concat: slicing
cv2's weights per input chunk and SUMMING the partial convs removes the
concat entirely. The trade: each partial conv has a smaller C_in (worse
128-lane MXU utilization) but no concat traffic. This script measures both
variants on the full fused 2-task v8x @640 forward (honest-loop + DCE guard
+ numeric equality check). Verdict recorded in PROFILE.md.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from cerberusdet_tpu.nn import layers as L
from cerberusdet_tpu.nn.module import conv2d, silu
from cerberusdet_tpu.tools.bench_int8 import bench_variant


def c2f_sumsplit_call(self, p, x, ctx, path=()):
    """C2f forward with the concat->1x1 rewritten as summed per-chunk convs.
    Fused-params inference only ({"w","b"} layout in cv2)."""
    y = self.cv1(p["cv1"], x, ctx, path + ("cv1",))
    ys = [y[..., : self.c], y[..., self.c:]]
    for i, b in enumerate(self.m):
        ys.append(b(p["m"][str(i)], ys[-1], ctx, path + ("m", str(i))))
    pc = p["cv2"]
    assert "b" in pc, "sum-split variant expects fused cv2"
    w = pc["w"]  # (1,1,(2+n)*c,c2)
    acc = None
    off = 0
    for t in ys:
        cw = w[:, :, off:off + t.shape[-1], :]
        part = conv2d(t, cw, self.cv2.s, self.cv2.p, 1, 1, ctx.dtype)
        acc = part if acc is None else acc + part
        off += t.shape[-1]
    return silu(acc + pc["b"]).astype(ctx.dtype)


def c2f_sumsplit_int8_call(self, p, x, ctx, path=()):
    """int8 variant of the sum-split rewrite: per-chunk s8 convs accumulate
    int32 partials — EXACT same math as conv(concat) since every chunk is
    quantized with cv2's single per-tensor scale; the s8 concat (measured
    2.9x worse per byte than bf16 concat: 160-wide chunks misalign the
    (4,1)-packed lane tiling) disappears entirely."""
    from jax import lax

    from cerberusdet_tpu.nn.module import quantize_act

    y = self.cv1(p["cv1"], x, ctx, path + ("cv1",))
    ys = [y[..., : self.c], y[..., self.c:]]
    for i, b in enumerate(self.m):
        ys.append(b(p["m"][str(i)], ys[-1], ctx, path + ("m", str(i))))
    pc = p["cv2"]
    assert "w_q" in pc
    acc = None
    off = 0
    for t in ys:
        tq = t if t.dtype == jnp.int8 else quantize_act(t, pc["s_x"])
        cw = pc["w_q"][:, :, off:off + t.shape[-1], :]
        part = lax.conv_general_dilated(
            tq, cw, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part
        off += t.shape[-1]
    out = acc.astype(jnp.float32) * (pc["s_x"] * pc["s_w"]) + pc["b"]
    return silu(out).astype(ctx.dtype)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="measure the rewrite on the int8-all graph")
    args = ap.parse_args()

    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.nn.module import Ctx

    model = CerberusModel(
        "configs/models/yolov8x_2task.yaml", ["voc", "animals"], [20, 19])
    fused = model.fuse(model.init(jax.random.PRNGKey(0)))
    img = jax.random.uniform(jax.random.PRNGKey(1), (32, 640, 640, 3),
                             jnp.float32)
    if args.int8:
        from cerberusdet_tpu.quant import (calibrate_amax, quantize_params,
                                           select_all)

        amax = calibrate_amax(model, fused, [img[:4]])
        fused = quantize_params(fused, amax, select=select_all, model=model)
    fused = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim == 4 else x, fused)

    if args.int8:
        orig = L.C2f.__call__
        results = {}
        # int32 addition is associative: the split must be BITWISE equal
        small = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3),
                                   jnp.float32)
        base_out = jax.jit(lambda p, x: model(p, x, Ctx(train=False)))(fused, small)
        L.C2f.__call__ = c2f_sumsplit_int8_call
        try:
            sp_out = jax.jit(lambda p, x: model(p, x, Ctx(train=False)))(fused, small)
        finally:
            L.C2f.__call__ = orig
        for t in base_out:
            np.testing.assert_array_equal(np.asarray(sp_out[t][0]),
                                          np.asarray(base_out[t][0]))
        print("bitwise equality OK", flush=True)
        dt = bench_variant(model, fused, img, 20)
        results["baseline_concat_int8"] = {"ms_per_batch": round(dt * 1e3, 2),
                                           "img_per_s": round(32 / dt, 1)}
        print("baseline_concat_int8", results["baseline_concat_int8"],
              flush=True)
        L.C2f.__call__ = c2f_sumsplit_int8_call
        try:
            dt = bench_variant(model, fused, img, 20)
        finally:
            L.C2f.__call__ = orig
        results["c2f_sumsplit_int8"] = {"ms_per_batch": round(dt * 1e3, 2),
                                        "img_per_s": round(32 / dt, 1)}
        print("c2f_sumsplit_int8", results["c2f_sumsplit_int8"], flush=True)
        print(json.dumps(results))
        return

    orig = L.C2f.__call__
    results = {}

    # numeric equality first (small input, f32)
    small = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3),
                               jnp.float32)
    f32 = model.fuse(model.init(jax.random.PRNGKey(0)))
    base_out = jax.jit(lambda p, x: model(p, x, Ctx(train=False)))(f32, small)
    L.C2f.__call__ = c2f_sumsplit_call
    try:
        split_out = jax.jit(lambda p, x: model(p, x, Ctx(train=False)))(f32, small)
        for t in base_out:
            np.testing.assert_allclose(
                np.asarray(split_out[t][0]), np.asarray(base_out[t][0]),
                rtol=1e-4, atol=1e-4)
        print("numeric equality OK", flush=True)
        dt = bench_variant(model, fused, img, 20)
        results["c2f_sumsplit"] = {"ms_per_batch": round(dt * 1e3, 2),
                                   "img_per_s": round(32 / dt, 1)}
        print("c2f_sumsplit", results["c2f_sumsplit"], flush=True)
    finally:
        L.C2f.__call__ = orig
    dt = bench_variant(model, fused, img, 20)
    results["baseline_concat"] = {"ms_per_batch": round(dt * 1e3, 2),
                                  "img_per_s": round(32 / dt, 1)}
    print("baseline_concat", results["baseline_concat"], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
