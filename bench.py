"""Headline benchmark: batched 2-task CerberusDet-v8x inference @640 on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published 2-task speed, 7.2 ms/img on V100 b32 fp16
(/root/reference/README.md:241) = 138.9 img/s.

Serving precision: int8 PTQ over the fused convs (quant/ptq.py) — the TPU
serving analog of the reference baseline's fp16. Accuracy was measured, not
assumed: mAP50 deltas vs bf16 are <=0.002 on the CONVERGED v8x@640 run
(PROFILE.md round-4/5 int8 accuracy tables). Activation scales calibrate on
the committed sample images in assets/calib/ (same distribution the accuracy
tables use — synthetic-dataset frames, not random noise) and the resulting
amax set is asserted against the committed golden in
assets/calib/amax_golden.json (regenerate with --write-golden after an
intentional model/quant change). `--bf16` runs the pure-bf16 path for
comparison; PROFILE.md records both.

Methodology: the K-step forward loop runs INSIDE one jitted fori_loop with a
data dependency between iterations, and completion is forced by fetching a
scalar slice. This defeats async-dispatch/memoization shortcuts in the runtime
and removes per-call dispatch noise — it measures pure device time.

The loop carry consumes a reduction of EVERY task's output, and the bench
asserts the compiled loop's convolution count is >= the all-heads forward's
(round 1 regression: a carry that touched only one head let XLA dead-code-
eliminate the entire second branch, inflating throughput ~30%).

`--batch` / `--cfg` sweep the serving batch size and the model config (e.g.
configs/models/yolov8x_2task_tpu.yaml — the lane-aligned variant, ~680
img/s). The headline default is the reference-width config at batch 128
(the round-5 batch-scaling winner; `--batch 32` reproduces the reference's
own batch protocol at 377 img/s — full study in PROFILE.md).
"""

import argparse
import json
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


from cerberusdet_tpu.utils.profiling import conv_count  # noqa: E402

GOLDEN = Path(__file__).parent / "assets" / "calib" / "amax_golden.json"


def calib_batches(n: int = 1):
    """The committed calibration images (assets/calib/*.jpg), letterboxed to
    640 and normalized exactly like the serving preprocessor."""
    import cv2

    imgs = []
    for p in sorted((Path(__file__).parent / "assets" / "calib").glob("*.jpg")):
        im = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
        im = cv2.resize(im, (640, 640), interpolation=cv2.INTER_LINEAR)
        imgs.append(im.astype(np.float32) / 255.0)
    assert imgs, f"no calibration images in {Path(__file__).parent/'assets/calib'}"
    return [np.stack(imgs)]


def check_golden_amax(amax: dict, cfg: str, write: bool) -> None:
    """Assert the calibrated activation scales match the committed golden set
    (rtol 0.05): guards against the calibration inputs silently drifting from
    the distribution the accuracy tables were measured on."""
    key = Path(cfg).stem
    flat = {"/".join(map(str, k)): v for k, v in amax.items()}
    if write or not GOLDEN.exists():
        data = json.loads(GOLDEN.read_text()) if GOLDEN.exists() else {}
        data[key] = flat
        GOLDEN.write_text(json.dumps(data, indent=0, sort_keys=True))
        return
    data = json.loads(GOLDEN.read_text())
    if key not in data:
        data[key] = flat
        GOLDEN.write_text(json.dumps(data, indent=0, sort_keys=True))
        return
    gold = data[key]
    assert set(gold) == set(flat), "amax key set drifted vs golden"
    bad = {k: (gold[k], flat[k]) for k in gold
           if abs(flat[k] - gold[k]) > 0.05 * max(abs(gold[k]), 1e-6)}
    assert not bad, f"calibrated amax drifted >5% vs committed golden: {bad}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true",
                    help="pure bf16 (no int8 PTQ) for comparison")
    ap.add_argument("--batch", type=int, default=128,
                    help="serving batch size (default 128 — the round-5 "
                         "batch-scaling winner: 514 vs 377 img/s at the "
                         "reference's b32; see PROFILE.md)")
    ap.add_argument("--cfg", default="configs/models/yolov8x_2task.yaml",
                    help="model yaml (reference widths by default; "
                         "yolov8x_2task_tpu.yaml is the lane-aligned variant)")
    ap.add_argument("--write-golden", action="store_true",
                    help="rewrite assets/calib/amax_golden.json for this cfg")
    args = ap.parse_args()

    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.nn.module import Ctx

    batch = args.batch
    iters = 20
    model = CerberusModel(args.cfg, ["voc", "animals"], [20, 19])
    params = model.fuse(model.init(jax.random.PRNGKey(0)))  # fold BN for inference
    if not args.bf16:
        # int8 PTQ serving path (mAP-delta measured — see module docstring)
        from cerberusdet_tpu.quant import calibrate_amax, quantize_params, select_all

        amax = calibrate_amax(model, params, calib_batches())
        check_golden_amax(amax, args.cfg, args.write_golden)
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
