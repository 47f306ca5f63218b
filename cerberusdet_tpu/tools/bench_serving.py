"""Staged measurement of the ONE-program serving path (infer/inference.py
`_predict_impl`): forward-only -> + per-task NMS -> full program (+ global
remap + cross-task suppression). Attributes the post-forward glue cost that
detect.py / serve.py pay on every batch.

Behavioral parity target: the reference times forward and NMS separately
(cerberusdet/val.py:253-260 dt[1]/dt[2]); here the whole pipeline is one
XLA program, so stage deltas are measured by compiling ablated programs
with bench.py's honest-loop methodology (jitted fori_loop with a data
dependency + all-heads sink + HLO conv-count DCE guard + fetch fence).

Usage:
  python -m cerberusdet_tpu.tools.bench_serving [--int8 all] [--iters 10]
  python -m cerberusdet_tpu.tools.bench_serving --trace /tmp/serve_trace
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cerberusdet_tpu.utils.profiling import conv_count


def honest_time(fn, params, img, iters: int, check_convs=True) -> float:
    """Best-of-3 per-iteration seconds for `fn(params, img) -> pytree`,
    run as K dependent iterations inside one jitted fori_loop."""

    @partial(jax.jit, static_argnames=("k",))
    def loop(p, x, k):
        def body(i, xx):
            out = fn(p, xx)
            sink = sum(jnp.mean(leaf.astype(jnp.float32))
                       for leaf in jax.tree_util.tree_leaves(out))
            return x + (sink * 0.0).astype(x.dtype)

        y = jax.lax.fori_loop(0, k, body, x)
        return y[0, 0, 0, :].astype(jnp.float32)

    if check_convs:
        one_c = jax.jit(fn).lower(params, img).compile()
        loop_c = loop.lower(params, img, iters).compile()
        assert conv_count(loop_c) >= conv_count(one_c), "DCE ate a branch"
    np.asarray(loop(params, img, iters))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(params, img, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cfg", default="configs/models/yolov8x_2task.yaml")
    ap.add_argument("--nc", default="20,19")
    ap.add_argument("--int8", default="all", choices=["off", "deep", "all"])
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--iou-bt", type=float, default=0.8)
    ap.add_argument("--max-det", type=int, default=300)
    ap.add_argument("--trace", default="",
                    help="write a jax.profiler trace of the FULL program "
                         "to this dir instead of the staged timing")
    args = ap.parse_args()

    from cerberusdet_tpu.infer.inference import CerberusDetInference
    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.nn.module import Ctx
    from cerberusdet_tpu.ops.nms import cross_task_suppress, non_max_suppression

    ncs = [int(x) for x in args.nc.split(",")]
    tasks = [f"t{i}" for i in range(len(ncs))]
    model = CerberusModel(args.cfg, tasks, ncs)
    params = model.init(jax.random.PRNGKey(0))
    names = {t: [f"c{i}" for i in range(nc)] for t, nc in zip(tasks, ncs)}
    inst = CerberusDetInference(model=model, params=params, names=names,
                                conf_thres=args.conf, iou_thres=args.iou,
                                iou_thres_between_tasks=args.iou_bt,
                                img_size=64,  # cheap warmup; we time b32@640
                                max_det=args.max_det, int8=args.int8)

    img = jax.random.uniform(jax.random.PRNGKey(1),
                             (args.batch, 640, 640, 3), jnp.float32)

    def full(p, x):
        return inst._predict_impl(p, x, args.conf, args.iou, args.iou_bt,
                                  False, args.max_det)

    if args.trace:
        np.asarray(jax.tree_util.tree_leaves(
            jax.jit(full)(inst.params, img))[0])  # compile first
        with jax.profiler.trace(args.trace):
            for _ in range(max(3, args.iters // 3)):
                out = jax.jit(full)(inst.params, img)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"trace written to {args.trace}")
        return

    def forward_only(p, x):
        out = model(p, x, Ctx(train=False, dtype=inst.compute_dtype))
        return {t: pred for t, (pred, _f) in out.items()}

    def with_nms(p, x):
        out = model(p, x, Ctx(train=False, dtype=inst.compute_dtype))
        return [non_max_suppression(out[t][0], nc=nc, conf_thres=args.conf,
                                    iou_thres=args.iou, agnostic=False,
                                    max_det=args.max_det)[0]
                for t, nc in zip(tasks, ncs)]

    stages = {"forward": forward_only, "forward+nms": with_nms, "full": full}
    results, prev = {}, None
    for name, fn in stages.items():
        dt = honest_time(fn, inst.params, img, args.iters)
        results[name] = {"ms_per_batch": round(dt * 1e3, 2),
                         "img_per_s": round(args.batch / dt, 1)}
        if prev is not None:
            results[name]["delta_ms"] = round(
                (dt * 1e3) - results[prev]["ms_per_batch"], 2)
        prev = name
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
