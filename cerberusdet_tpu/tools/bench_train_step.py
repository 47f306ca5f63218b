"""Train-step benchmark: XLA vs Pallas TAL assigner (VERDICT r2 item 3).

Times the full 2-task v8x @640 train step (per-task batch 8, bf16) with K
steps inside ONE jitted lax.scan (PROFILE.md methodology: separate dispatches
get memoized/early-acked by the remote relay) and a forced np.asarray fetch.
Also cross-checks the two assigners' LOSS VALUES on the same batch — the
compiled-kernel counterpart of the interpreter-mode golden tests.

Usage: python -m cerberusdet_tpu.tools.bench_train_step [--iters 10]
       [--max-labels 300] [--imgsz 640] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(tal_impl: str, args):
    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.train.loss import DetectionLoss
    from cerberusdet_tpu.train.step import MultiTaskTrainer, init_train_state

    tasks, ncs = ["a", "b"], [20, 19]
    model = CerberusModel("configs/models/yolov8x_2task.yaml", tasks, ncs)
    params = model.init(jax.random.PRNGKey(0))
    losses = {t: DetectionLoss(nc=nc, strides=model.strides, tal_impl=tal_impl)
              for t, nc in zip(tasks, ncs)}
    trainer = MultiTaskTrainer(model, losses, compute_dtype=jnp.bfloat16)
    state = init_train_state(params)
    return model, trainer, state, tasks, ncs


def make_batches(tasks, ncs, args):
    rng = np.random.default_rng(0)
    batches = {}
    for t, nc in zip(tasks, ncs):
        m = args.max_labels
        n_real = 40
        batches[t] = {
            "img": rng.uniform(0, 1, (args.batch, args.imgsz, args.imgsz, 3)
                               ).astype(np.float32),
            "cls": rng.integers(0, nc, (args.batch, m)).astype(np.int32),
            "bboxes": rng.uniform(0.2, 0.6, (args.batch, m, 4)
                                  ).astype(np.float32),
            "mask": (np.arange(m)[None] < n_real).repeat(args.batch, 0),
            "prob": np.ones((args.batch, m), np.float32),
        }
    return batches


def bench(tal_impl: str, args):
    model, trainer, state, tasks, ncs = build(tal_impl, args)
    batches = make_batches(tasks, ncs, args)
    ts = tuple(tasks)
    raw = trainer.raw_step(ts)
    batch_list = tuple(
        {k: jnp.asarray(v) for k, v in batches[t].items()} for t in ts)
    lrs = jnp.full((3,), 0.01, jnp.float32)
    mom = jnp.float32(0.9)

    @jax.jit
    def k_steps(state, k_dummy):
        def body(s, _):
            s, items = raw(s, batch_list, lrs, mom)
            return s, jnp.stack([items[t].total for t in ts])

        s, tot = jax.lax.scan(body, state, None, length=args.iters)
        return s, tot

    s2, tot = k_steps(state, None)
    first = np.asarray(tot)[0]  # fence + loss values for cross-check
    t0 = time.perf_counter()
    s3, tot = k_steps(s2, None)
    np.asarray(tot)
    dt = (time.perf_counter() - t0) / args.iters
    del s2, s3
    return dt, first


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-labels", type=int, default=300)
    args = ap.parse_args()

    out = {}
    losses = {}
    for impl in ("xla", "pallas"):
        dt, first_losses = bench(impl, args)
        imgs = 2 * args.batch / dt
        out[impl] = {"ms_per_step": round(dt * 1e3, 1),
                     "img_per_s": round(imgs, 1)}
        losses[impl] = first_losses
        print(impl, out[impl], "first-step losses:", first_losses, flush=True)
    # compiled-path loss agreement (both start from the identical state/batch)
    rel = np.abs(losses["xla"] - losses["pallas"]) / np.abs(losses["xla"])
    out["loss_rel_diff"] = float(rel.max())
    out["speedup"] = round(out["xla"]["ms_per_step"]
                           / out["pallas"]["ms_per_step"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
