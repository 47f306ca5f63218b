#!/usr/bin/env python
"""Standalone evaluation CLI (reference parity: cerberusdet/val.py:436-495),
including the `--task speed` benchmark mode."""

import argparse
import json
import time


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True, help="framework .ckpt.npz (or .pt to import)")
    p.add_argument("--data", required=True)
    p.add_argument("--cfg", default="", help="model yaml (needed for .pt weights)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--task", default="val",
                   choices=["train", "val", "test", "speed"])
    p.add_argument("--no-rect", action="store_true",
                   help="disable rect (aspect-grouped) batching; the reference "
                        "evaluates with rect=True pad=0.5 (val.py:231-246)")
    p.add_argument("--bf16", "--half", action="store_true", dest="bf16",
                   help="half precision = bfloat16 on TPU (reference --half)")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--single-cls", action="store_true",
                   help="treat as single-class dataset (val.py:285,318,339)")
    p.add_argument("--labels-from-xml", action="store_true")
    p.add_argument("--use-multi-labels", action="store_true")
    p.add_argument("--use-soft-labels", action="store_true")
    p.add_argument("--workers", type=int, default=None,
                   help="dataloader decode threads (reference --workers)")
    p.add_argument("--project", default="runs/val")
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--mlflow-url", default="",
                   help="upload metrics to MLflow (reference val.py:450-455)")
    p.add_argument("--experiment-name", default="cerberusdet")
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu"],
                   help="debug override of the JAX backend (analog of the "
                        "reference's --device flag)")
    p.add_argument("--compile-cache", default="off", metavar="DIR",
                   help="persistent XLA compile cache dir ('' = "
                        "~/.cache/cerberusdet_tpu/xla); repeated runs on the "
                        "same config skip recompilation")
    p.add_argument("--int8", default="off", choices=["off", "deep", "all"],
                   help="post-training int8 quantization of the fused convs "
                        "(deep: c_in>=256 only); activation scales are "
                        "calibrated on the first val batches (quant/ptq.py)")
    return p.parse_args(argv)


def load_model_for_eval(weights: str, cfg: str, data_dict):
    import jax

    from cerberusdet_tpu.models.cerberus import CerberusModel

    if weights.endswith(".pt"):
        if not cfg:
            raise SystemExit("--cfg required with .pt weights")
        from cerberusdet_tpu.manager.pt_import import import_pt

        model = CerberusModel(cfg, data_dict["task_ids"], data_dict["nc"])
        params = model.init(jax.random.PRNGKey(0))
        params = import_pt(model, params, weights, verbose=True)
    else:
        from cerberusdet_tpu.manager.checkpoint import load_checkpoint

        ckpt = load_checkpoint(weights)
        meta = ckpt["meta"]
        model = CerberusModel(cfg or meta["cfg"], meta["task_ids"], meta["nc"])
        params = ckpt["ema"] if ckpt.get("ema") else ckpt["params"]
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
    # standalone eval runs fused like the reference's attempt_load(.fuse())
    params = model.fuse(params)
    return model, params


def speed_benchmark(model, params, imgsz: int, batch: int, bf16: bool):
    """All-task forward timing (val.py:219,297-308 semantics) with a
    data-dependency chain for honest async timing."""
    import jax
    import jax.numpy as jnp

    from cerberusdet_tpu.nn.module import Ctx

    dtype = jnp.bfloat16 if bf16 else jnp.float32

    @jax.jit
    def fwd(params, img):
        out = model(params, img, Ctx(train=False, dtype=dtype))
        return {t: pred for t, (pred, _f) in out.items()}

    img = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    jax.block_until_ready(fwd(params, img))
    x = img
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
        # consume EVERY head: a carry through one task would let XLA
        # dead-code-eliminate the other branches (see bench.py)
        sink = sum(jnp.mean(o).astype(jnp.float32) for o in out.values())
        x = img + (sink * 0.0).astype(img.dtype)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"ms_per_image": dt / batch * 1e3, "images_per_sec": batch / dt}


def quantize_for_eval(model, params, data_dict, opt, n_calib_batches: int = 2):
    """PTQ the fused params, calibrating activation scales on the first val
    batches of task 0 (quant/ptq.py)."""
    import jax.numpy as jnp

    from cerberusdet_tpu.data.loaders import create_dataloader
    from cerberusdet_tpu.quant import calibrate_amax, quantize_params, select_all
    from cerberusdet_tpu.quant.ptq import select_deep

    _, loader = create_dataloader(
        data_dict["val"][0], imgsz=opt.imgsz, batch_size=min(opt.batch_size, 8),
        augment=False, shuffle=False, classnames=data_dict["names"][0],
        task="int8_calib", num_threads=opt.workers,
        # every process must calibrate on IDENTICAL batches: host-sharded
        # calibration would quantize a different model per process
        host_sharded=False)
    batches = []
    for batch in loader:
        batches.append(batch["img"].astype("float32") / 255.0)
        if len(batches) >= n_calib_batches:
            break
    dtype = jnp.bfloat16 if opt.bf16 else jnp.float32
    amax = calibrate_amax(model, params, batches, dtype=dtype)
    select = select_all if opt.int8 == "all" else select_deep()
    return quantize_params(params, amax, select=select, model=model)


def main(argv=None):
    opt = parse_opt(argv)
    from cerberusdet_tpu.utils.checks import enable_compile_cache, select_platform
    select_platform(opt.platform)
    enable_compile_cache(opt.compile_cache)
    from cerberusdet_tpu.data.loaders import create_dataloader
    from cerberusdet_tpu.evaluation.val import run_task
    from cerberusdet_tpu.manager.run_manager import parse_data_config

    data_dict = parse_data_config(opt.data, check=True)
    model, params = load_model_for_eval(opt.weights, opt.cfg, data_dict)

    from pathlib import Path

    from cerberusdet_tpu.manager.run_manager import increment_path

    save_dir = increment_path(Path(opt.project) / opt.name, opt.exist_ok)
    save_dir.mkdir(parents=True, exist_ok=True)

    if opt.int8 != "off":
        params = quantize_for_eval(model, params, data_dict, opt)

    if opt.task == "speed":
        out = speed_benchmark(model, params, opt.imgsz, opt.batch_size, opt.bf16)
        print(json.dumps(out))
        return out

    results = {}
    for ti, task in enumerate(data_dict["task_ids"]):
        # evaluate on the requested split, falling back to val when the key
        # is missing OR a null placeholder like `test:` (reference val.py:226)
        split = opt.task if opt.task in ("train", "val", "test") else "val"
        paths = data_dict.get(split) or data_dict["val"]
        path = paths[ti] if paths[ti] is not None else data_dict["val"][ti]
        # reference standalone-val protocol: rect=True, pad=0.5
        # (cerberusdet/val.py:231-246) — aspect-grouped batches, one letterbox
        # shape per batch (a bounded set of stride-multiple shapes, each
        # compiled once and cached across tasks/epochs)
        _, loader = create_dataloader(
            path, imgsz=opt.imgsz, batch_size=opt.batch_size, augment=False,
            shuffle=False, rect=not opt.no_rect, pad=0.5,
            classnames=data_dict["names"][ti], task=f"{task}_val",
            use_xml=opt.labels_from_xml, multi_label=opt.use_multi_labels,
            soft_label=opt.use_soft_labels, single_cls=opt.single_cls,
            num_threads=opt.workers,
        )
        import jax

        out = run_task(
            model, params, task, loader, nc=data_dict["nc"][ti],
            names=data_dict["names"][ti], conf_thres=opt.conf_thres,
            iou_thres=opt.iou_thres, max_det=opt.max_det, verbose=True,
            single_cls=opt.single_cls, use_multi_labels=opt.use_multi_labels,
            plots=True, plots_dir=save_dir,
            # multi-process: the loader host-shards the val set and the raw
            # stats are all-gathered — full-set metrics on every process
            # (beyond the reference's rank-0-only standalone val)
            distributed=jax.process_count() > 1,
        )
        results[task] = out
        mp, mr, map50, mAP = out["results"][:4]
        print(f"{task}: P={mp:.4f} R={mr:.4f} mAP50={map50:.4f} mAP={mAP:.4f}")
        # PR curve + confusion matrix artifacts (reference val.py plots)
        from cerberusdet_tpu.utils.plots import (
            plot_confusion_matrix,
            plot_pr_curve,
        )

        names = (["item"] if opt.single_cls else list(data_dict["names"][ti]))
        m = out["metrics"]
        if getattr(m, "_results", None):
            _, _, p, r, f1, ap, classes, p_curve, r_curve, px = m._results
            # curve rows correspond to the PRESENT classes, in `classes`
            # order — label them accordingly, not positionally
            plot_pr_curve(px, p_curve, ap, save_dir / f"{task}_PR_curve.png",
                          [names[int(c)] for c in classes])
        plot_confusion_matrix(out["confusion"].matrix, names,
                              save_dir / f"{task}_confusion_matrix.png")

    if opt.mlflow_url:
        # metric upload (reference val.py:384-418): per-task + per-class APs
        from cerberusdet_tpu.utils.mlflow_logging import MLFlowLogger

        logger = MLFlowLogger(opt.experiment_name, f"val_{opt.name}",
                              tracking_uri=opt.mlflow_url)
        for task, out in results.items():
            mp, mr, map50, mAP = out["results"][:4]
            metrics = {
                f"val/{task}/precision": mp, f"val/{task}/recall": mr,
                f"val/{task}/mAP_0.5": map50, f"val/{task}/mAP_0.5_0.95": mAP,
                f"val/{task}/fitness": out["fitness"],
            }
            m = out["metrics"]
            # under --single-cls the metrics are over ONE merged class
            task_names = (["item"] if opt.single_cls else
                          data_dict["names"][data_dict["task_ids"].index(task)])
            for i, c in enumerate(m.ap_class_index):
                name = task_names[int(c)]
                metrics[f"val/{task}/ap50_{name}".replace(" ", "_")] = (
                    float(m.class_result(i)[2]))
            logger.log_metrics(metrics)
        logger.finish()
    return results


if __name__ == "__main__":
    main()
