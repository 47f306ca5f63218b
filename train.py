#!/usr/bin/env python
"""Training CLI (reference parity: cerberusdet/train.py:279-414).

Example:
    python train.py --data configs/data/voc_obj365.yaml \
        --cfg configs/models/yolov8x_2task.yaml \
        --hyp configs/hyps/hyp.cerber-default.yaml \
        --batch-size 32,32 --epochs 100 --name voc_obj365_v8x
"""

import argparse
import sys
from pathlib import Path

import yaml


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="", help="pretrained .pt or .ckpt.npz")
    p.add_argument("--cfg", default="configs/models/yolov8x.yaml")
    p.add_argument("--data", required=True)
    p.add_argument("--hyp", default="configs/hyps/hyp.cerber-default.yaml")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=str, default="16",
                   help="total batch size, int or per-task list '4,4,40'")
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--project", default="runs/train")
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--optimizer", default="SGD", choices=["SGD", "Adam", "AdamW", "RMSProp"])
    p.add_argument("--linear-lr", action="store_true")
    p.add_argument("--noval", action="store_true")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--patience", type=int, default=30)
    p.add_argument("--freeze-shared-till-epoch", type=int, default=0)
    p.add_argument("--skip-batches", action="store_true")
    p.add_argument("--balanced-sampler", action="store_true")
    p.add_argument("--labels-from-xml", action="store_true")
    p.add_argument("--use-multi-labels", action="store_true")
    p.add_argument("--use-soft-labels", action="store_true")
    p.add_argument("--cache-images", nargs="?", const="ram", default="",
                   choices=["", "ram", "disk"],
                   help="cache decoded images: ram (reference default form) "
                        "or disk (packed pre-decoded memmap, skips per-epoch "
                        "JPEG decode)")
    p.add_argument("--augment-device", action="store_true",
                   help="run mosaic/affine/HSV/flip augmentation as one "
                        "jitted program on the accelerator; the host only "
                        "memcpys packed-cache tiles (implies --cache-images "
                        "disk)")
    p.add_argument("--single-cls", action="store_true",
                   help="train multi-class data as single-class")
    p.add_argument("--workers", type=int, default=None,
                   help="dataloader decode threads (reference --workers)")
    p.add_argument("--proc-workers", type=int, default=0,
                   help="decode/augment in N worker PROCESSES (the "
                        "reference's torch-DataLoader model; use when "
                        "python-level augment work GIL-caps the threads)")
    p.add_argument("--sync-bn", action="store_true",
                   help="accepted for parity; BatchNorm statistics are "
                        "globally synchronized by construction under the "
                        "GSPMD mesh (see parallel/mesh.py)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute (TPU)")
    p.add_argument("--mesh", action="store_true", help="data-parallel over all devices")
    p.add_argument("--resume", nargs="?", const="auto", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--warmup-min-iters", type=int, default=1000,
                   help="LR-warmup iteration floor (reference hardcodes "
                        "1000, averaging.py:57); lower it for tiny datasets "
                        "whose total iterations would never leave warmup")
    p.add_argument("--mlflow-url", type=str, default="",
                   help="MLflow tracking server (reference --mlflow-url)")
    p.add_argument("--experiment-name", type=str, default="cerberusdet")
    p.add_argument("--evolve", type=int, nargs="?", const=300, default=0,
                   help="evolve hyperparameters for N generations")
    p.add_argument("--evolver", type=str, default="yolov5",
                   choices=["yolov5", "random", "ax", "optuna", "bohb", "cfo",
                            "dragonfly", "nevergrad", "skopt", "zoopt"],
                   help="evolution algorithm (train.py:293; non-yolov5 "
                        "choices dispatch to the Ray Tune evolver)")
    p.add_argument("--params-to-evolve", type=str, default=None)
    p.add_argument("--evolve-per-task", action="store_true",
                   help="accepted for parity (train.py:302; the reference "
                        "parses but never consumes this flag — per-task "
                        "evolution is driven by list-valued hyps)")
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu"],
                   help="debug override of the JAX backend (analog of the "
                        "reference's --device flag)")
    p.add_argument("--compile-cache", default="off", metavar="DIR",
                   help="persistent XLA compile cache dir ('' = "
                        "~/.cache/cerberusdet_tpu/xla); repeated runs on the "
                        "same config skip recompilation")
    return p.parse_args(argv)


def main(argv=None):
    opt_ns = parse_opt(argv)
    from cerberusdet_tpu.utils.checks import enable_compile_cache, select_platform
    select_platform(opt_ns.platform)
    enable_compile_cache(opt_ns.compile_cache)
    from cerberusdet_tpu.manager.run_manager import parse_data_config
    from cerberusdet_tpu.train.trainer import TrainLoop, TrainOptions
    from cerberusdet_tpu.utils.seeds import init_seeds

    init_seeds(opt_ns.seed)

    with open(opt_ns.hyp) as f:
        hyp = yaml.safe_load(f)
    data_dict = parse_data_config(opt_ns.data, check=True)

    bs = [int(x) for x in str(opt_ns.batch_size).split(",")]
    batch_size = bs[0] if len(bs) == 1 else bs

    resume = opt_ns.resume
    if resume == "auto":
        # newest by modification time, NOT lexicographic (exp9 > exp10)
        runs = sorted(Path(opt_ns.project).glob("*/weights/last.ckpt.npz"),
                      key=lambda p: p.stat().st_mtime)
        if not runs:
            sys.exit("--resume: no previous run found")
        resume = str(runs[-1])
    if resume:
        # reinstate the interrupted run's OWN settings (train.py:346-356):
        # the saved opt.yaml replaces current CLI flags, and the run resumes
        # IN PLACE (same run dir) rather than incrementing a new one
        run_dir = Path(resume).parent.parent
        opt_yaml = run_dir / "opt.yaml"
        if opt_yaml.exists():
            with open(opt_yaml) as f:
                saved = yaml.safe_load(f) or {}
            for k in ("resume", "project", "name", "exist_ok"):
                saved.pop(k, None)
            for k, v in saved.items():
                if hasattr(opt_ns, k):
                    setattr(opt_ns, k, v)
            opt_ns.bf16 = saved.get("compute_dtype") == "bfloat16"
            opt_ns.mesh = bool(saved.get("use_mesh", opt_ns.mesh))
            opt_ns.project = str(run_dir.parent)
            opt_ns.name = run_dir.name
            opt_ns.exist_ok = True
            with open(opt_ns.hyp) as f:
                hyp = yaml.safe_load(f)
            data_dict = parse_data_config(opt_ns.data, check=True)
            bs = opt_ns.batch_size
            if not isinstance(bs, (int, list)):
                bs = [int(x) for x in str(bs).split(",")]
                bs = bs[0] if len(bs) == 1 else bs
            batch_size = bs

    opt = TrainOptions(
        cfg=opt_ns.cfg, data=opt_ns.data, hyp=opt_ns.hyp, weights=opt_ns.weights,
        epochs=opt_ns.epochs, batch_size=batch_size, imgsz=opt_ns.imgsz,
        project=opt_ns.project, name=opt_ns.name, exist_ok=opt_ns.exist_ok,
        optimizer=opt_ns.optimizer, linear_lr=opt_ns.linear_lr,
        noval=opt_ns.noval, nosave=opt_ns.nosave, patience=opt_ns.patience,
        freeze_shared_till_epoch=opt_ns.freeze_shared_till_epoch,
        skip_batches=opt_ns.skip_batches, balanced_sampler=opt_ns.balanced_sampler,
        labels_from_xml=opt_ns.labels_from_xml,
        use_multi_labels=opt_ns.use_multi_labels,
        use_soft_labels=opt_ns.use_soft_labels, cache_images=opt_ns.cache_images,
        augment_device=opt_ns.augment_device,
        single_cls=opt_ns.single_cls, workers=opt_ns.workers,
        proc_workers=opt_ns.proc_workers,
        warmup_min_iters=opt_ns.warmup_min_iters,
        use_mesh=opt_ns.mesh,
        seed=opt_ns.seed, resume=resume,
        mlflow_url=opt_ns.mlflow_url, experiment_name=opt_ns.experiment_name,
        compute_dtype="bfloat16" if opt_ns.bf16 else "float32",
    )

    if opt_ns.evolve:
        # evolver dispatch + run-name prefix (train.py:363,398-406)
        opt.name = f"{opt_ns.evolver}_{opt.name}"
        params_to_evolve = (opt_ns.params_to_evolve.split(",")
                            if opt_ns.params_to_evolve else None)
        if opt_ns.evolver == "yolov5":
            from cerberusdet_tpu.evolve.yolov5_evolver import Yolov5Evolver

            evolver = Yolov5Evolver(
                opt, hyp, data_dict, generations=opt_ns.evolve,
                params_to_evolve=params_to_evolve,
            )
        else:
            from cerberusdet_tpu.evolve.ray_evolver import RayEvolver

            evolver = RayEvolver(
                opt, hyp, data_dict, generations=opt_ns.evolve,
                params_to_evolve=params_to_evolve, searcher=opt_ns.evolver,
            )
        evolver.run_evolution()
        return

    loop = TrainLoop(opt, data_dict, hyp)  # mesh comes from opt.use_mesh
                                           # (restorable on --resume)
    loop.train()


if __name__ == "__main__":
    main()
