"""End-to-end int8 PTQ inference measurement (VERDICT r2 item 2).

Times the full 2-task v8x @640 b32 forward on the real chip in three
variants — bf16 (the shipping path), int8-deep (convs with c_in>=256
quantized), int8-all — with bench.py's honest-loop methodology (jitted
fori_loop with a data dependency + all-heads sink + HLO conv-count DCE
guard + fetch fence). Results are recorded in PROFILE.md.

Usage: python -m cerberusdet_tpu.tools.bench_int8 [--iters 20] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


from cerberusdet_tpu.utils.profiling import conv_count  # noqa: E402


def bench_variant(model, params, img, iters: int) -> float:
    from cerberusdet_tpu.nn.module import Ctx

    def forward(p, x):
        out = model(p, x, Ctx(train=False, dtype=jnp.bfloat16))
        return {t: pred for t, (pred, _f) in out.items()}

    @partial(jax.jit, static_argnames=("k",))
    def loop(p, x, k):
        def body(i, xx):
            out = forward(p, xx)
            sink = sum(jnp.mean(out[t]).astype(jnp.float32) for t in out)
            return x + (sink * 0.0).astype(x.dtype)

        y = jax.lax.fori_loop(0, k, body, x)
        return y[0, 0, 0, :].astype(jnp.float32)

    fwd_c = jax.jit(forward).lower(params, img).compile()
    loop_c = loop.lower(params, img, iters).compile()
    assert conv_count(loop_c) >= conv_count(fwd_c), "DCE ate a branch"
    np.asarray(loop(params, img, iters))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(params, img, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--min-cin", type=int, default=256)
    ap.add_argument("--only", default=None,
                    help="run a single variant: bf16 | deep | all")
    ap.add_argument("--cfg", default="configs/models/yolov8x_2task.yaml")
    ap.add_argument("--nc", default="20,19", help="per-task class counts")
    args = ap.parse_args()

    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.quant import calibrate_amax, quantize_params, select_all
    from cerberusdet_tpu.quant.ptq import select_deep

    ncs = [int(x) for x in args.nc.split(",")]
    model = CerberusModel(args.cfg, [f"t{i}" for i in range(len(ncs))], ncs)
    fused = model.fuse(model.init(jax.random.PRNGKey(0)))

    def bf16_weights(p):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim == 4 else x, p)

    img = jax.random.uniform(jax.random.PRNGKey(1),
                             (args.batch, 640, 640, 3), jnp.float32)
    amax = calibrate_amax(model, fused, [img[:4]])

    variants = {
        "bf16": bf16_weights(fused),
        f"int8_deep(cin>={args.min_cin})": bf16_weights(
            quantize_params(fused, amax, select=select_deep(args.min_cin),
                            model=model)),
        "int8_all": bf16_weights(
            quantize_params(fused, amax, select=select_all, model=model)),
    }
    if args.only:
        key = {"bf16": "bf16", "deep": f"int8_deep(cin>={args.min_cin})",
               "all": "int8_all"}[args.only]
        variants = {key: variants[key]}
    results = {}
    for name, p in variants.items():
        dt = bench_variant(model, p, img, args.iters)
        results[name] = {"ms_per_batch": round(dt * 1e3, 2),
                         "img_per_s": round(args.batch / dt, 1)}
        print(name, results[name], flush=True)
    base = results.get("bf16", {}).get("img_per_s")
    for name, r in results.items():
        if base:
            r["speedup_vs_bf16"] = round(r["img_per_s"] / base, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
