"""Capture a jax.profiler trace of the multi-task train step (or the
inference forward) on the current backend.

Usage:
    python -m cerberusdet_tpu.tools.profile_step --out /tmp/trace \
        [--mode train|infer] [--cfg configs/models/yolov8x_2task.yaml]
        [--imgsz 640] [--batch 8] [--iters 5] [--max-labels 60]

The trace directory opens in TensorBoard's profile plugin (or xprof) and
shows per-fusion device time — the data behind PROFILE.md.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="trace output directory")
    p.add_argument("--mode", default="train", choices=["train", "infer"])
    p.add_argument("--cfg", default="configs/models/yolov8x_2task.yaml")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--max-labels", type=int, default=60)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 train step (matches PROFILE.md's numbers; "
                        "infer mode is always bf16)")
    p.add_argument("--int8", default="off", choices=["off", "deep", "all"],
                   help="infer mode only: trace the int8-PTQ graph (random "
                        "calibration batch; timing-faithful, accuracy-"
                        "irrelevant)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.nn.module import Ctx
    from cerberusdet_tpu.utils.profiling import trace

    tasks, ncs = ["a", "b"], [20, 19]
    model = CerberusModel(args.cfg, tasks, ncs)
    params = model.init(jax.random.PRNGKey(0))

    if args.mode == "infer":
        params = model.fuse(params)
        if args.int8 != "off":
            from cerberusdet_tpu.quant.ptq import (
                calibrate_amax, quantize_params, select_all, select_deep)

            sel = select_all if args.int8 == "all" else select_deep()
            cal = [np.random.default_rng(0).uniform(
                0, 1, (2, args.imgsz, args.imgsz, 3)).astype(np.float32)]
            amax = calibrate_amax(model, params, cal)
            params = quantize_params(params, amax, select=sel, model=model)

        @jax.jit
        def fn(params, img):
            out = model(params, img, Ctx(train=False, dtype=jnp.bfloat16))
            return {t: pred for t, (pred, _f) in out.items()}

        img = jnp.zeros((args.batch, args.imgsz, args.imgsz, 3), jnp.float32)
        trace(args.out, fn, params, img, iters=args.iters)
    else:
        from cerberusdet_tpu.train.loss import DetectionLoss
        from cerberusdet_tpu.train.step import MultiTaskTrainer, init_train_state

        losses = {t: DetectionLoss(nc=nc, strides=model.strides)
                  for t, nc in zip(tasks, ncs)}
        trainer = MultiTaskTrainer(
            model, losses,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
        state = init_train_state(params)

        def batch(nc, seed):
            r = np.random.default_rng(seed)
            b, m = args.batch, args.max_labels
            return {
                "img": jnp.asarray(r.uniform(0, 1, (b, args.imgsz, args.imgsz, 3)),
                                   jnp.float32),
                "cls": jnp.asarray(r.integers(0, nc, (b, m)), jnp.int32),
                "bboxes": jnp.asarray(r.uniform(0.2, 0.6, (b, m, 4)), jnp.float32),
                "mask": jnp.ones((b, m), bool),
                "prob": jnp.ones((b, m), jnp.float32),
            }

        batches = {t: batch(nc, i + 1) for i, (t, nc) in enumerate(zip(tasks, ncs))}
        lrs = np.full((3,), 0.01, np.float32)

        # the jitted step DONATES its input state — thread the returned
        # state through a closure so repeated trace iterations never touch
        # a deleted buffer
        holder = {"state": state}

        def fn():
            holder["state"], _items = trainer.step(
                holder["state"], batches, lrs, 0.937)
            return holder["state"]

        trace(args.out, fn, iters=args.iters)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
