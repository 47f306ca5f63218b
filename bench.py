"""Headline benchmark: batched 2-task CerberusDet-v8x inference @640 on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published 2-task speed, 7.2 ms/img on V100 b32 fp16
(/root/reference/README.md:241) = 138.9 img/s.

Serving precision: int8 PTQ over the fused convs (quant/ptq.py) — the TPU
serving analog of the reference baseline's fp16. Accuracy was measured, not
assumed: mAP50 deltas vs bf16 are <=0.004 on the trained quickstart model
(PROFILE.md round-3 int8 section) on top of fp64-proven graph parity at 640.
`--bf16` runs the pure-bf16 path (279 img/s, 2.01x) for comparison;
PROFILE.md records both.

Methodology: the K-step forward loop runs INSIDE one jitted fori_loop with a
data dependency between iterations, and completion is forced by fetching a
scalar slice. This defeats async-dispatch/memoization shortcuts in the runtime
and removes per-call dispatch noise — it measures pure device time.

The loop carry consumes a reduction of EVERY task's output, and the bench
asserts the compiled loop's convolution count is >= the all-heads forward's
(round 1 regression: a carry that touched only one head let XLA dead-code-
eliminate the entire second branch, inflating throughput ~30%).
"""

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


from cerberusdet_tpu.utils.profiling import conv_count  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true",
                    help="pure bf16 (no int8 PTQ) for comparison")
    args = ap.parse_args()

    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.nn.module import Ctx

    batch = 32
    iters = 20
    model = CerberusModel(
        "configs/models/yolov8x_2task.yaml", ["voc", "animals"], [20, 19]
    )
    params = model.fuse(model.init(jax.random.PRNGKey(0)))  # fold BN for inference
    if not args.bf16:
        # int8 PTQ serving path (mAP-delta measured — see module docstring)
        from cerberusdet_tpu.quant import calibrate_amax, quantize_params, select_all

        calib = jax.random.uniform(jax.random.PRNGKey(2), (4, 640, 640, 3),
                                   jnp.float32)
        amax = calibrate_amax(model, params, [calib])
        params = quantize_params(params, amax, select=select_all, model=model)
    # bf16 weights for the unquantized convs: halve HBM traffic, MXU-native
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 and x.ndim == 4 else x,
        params,
    )

    def forward(params, img):
        ctx = Ctx(train=False, dtype=jnp.bfloat16)
        out = model(params, img, ctx)
        return {t: pred for t, (pred, _f) in out.items()}

    @partial(jax.jit, static_argnames=("k",))
    def loop(params, img, k):
        def body(i, x):
            out = forward(params, x)
            # consume EVERY head so no task branch can be dead-code-eliminated
            sink = sum(jnp.mean(out[t]).astype(jnp.float32) for t in out)
            return img + (sink * 0.0).astype(img.dtype)

        x = jax.lax.fori_loop(0, k, body, img)
        return x[0, 0, 0, :].astype(jnp.float32)

    img = jax.random.uniform(jax.random.PRNGKey(1), (batch, 640, 640, 3), jnp.float32)

    # Guard against dead-code elimination of any task branch: the timed loop
    # must contain at least as many convolutions as the all-heads forward.
    fwd_compiled = jax.jit(forward).lower(params, img).compile()
    loop_compiled = loop.lower(params, img, iters).compile()
    n_fwd, n_loop = conv_count(fwd_compiled), conv_count(loop_compiled)
    assert n_loop >= n_fwd, (
        f"bench loop lost convolutions to DCE: loop has {n_loop}, "
        f"all-heads forward has {n_fwd}"
    )

    np.asarray(loop(params, img, iters))  # warm (executable already compiled)
    # best of 3 rounds: the remote relay occasionally penalizes the first
    # timed dispatch after warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(params, img, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    imgs_per_s = batch / best

    baseline_imgs_per_s = 1000.0 / 7.2  # reference: 7.2 ms/img, V100 b32 fp16
    print(json.dumps({
        "metric": ("2task_inference_throughput_640" if args.bf16
                   else "2task_inference_throughput_640_int8ptq"),
        "value": round(imgs_per_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_s / baseline_imgs_per_s, 2),
    }))


if __name__ == "__main__":
    main()
