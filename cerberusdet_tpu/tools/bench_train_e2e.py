"""End-to-end training throughput: full epoch loop (loader + step), host
cv2 augmentation vs the device-side pipeline (data/device_augment.py).

Unlike bench_train_step (synthetic device-resident batches, step only) this
measures what training actually sustains: host planning/decode, any
host->device image traffic, the jitted augmentation, and the train step,
all pipelined as TrainLoop runs them. With --augment-device the images are
BORN on the accelerator — zero image bytes cross the host link per step.

Usage: python -m cerberusdet_tpu.tools.bench_train_e2e
         [--cfg configs/models/yolov8x_2task.yaml] [--imgsz 640]
         [--batch 8] [--n 128] [--mode host|device|both]
Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path


def run_mode(device_aug: bool, args, root: Path):
    import yaml

    from cerberusdet_tpu.train.trainer import TrainLoop, TrainOptions

    hyp = yaml.safe_load(open(args.hyp))
    data = {
        "train": [str(root / t / "images" / "train") for t in ("t1", "t2")],
        "val": [str(root / t / "images" / "train") for t in ("t1", "t2")],
        "nc": [20, 19], "names": [[str(i) for i in range(20)],
                                  [str(i) for i in range(19)]],
        "task_ids": ["t1", "t2"],
    }
    opt = TrainOptions(
        cfg=args.cfg, epochs=3, batch_size=args.batch, imgsz=args.imgsz,
        project=str(root / "runs"), name="bench", exist_ok=True,
        noval=True, nosave=True, plots=False, seed=0,
        cache_images="disk", augment_device=device_aug,
        compute_dtype="bfloat16", max_labels=args.max_labels,
    )
    loop = TrainLoop(opt, data, hyp)
    loop.train_epoch(0)  # compile + warm caches
    n_img = sum(len(loop.datasets[t]) // b * b
                for t, b in zip(loop.task_ids, loop.batch_sizes))
    t0 = time.perf_counter()
    loop.train_epoch(1)
    # fence: fetch a loss scalar (train_epoch already fetches mloss at end)
    dt = time.perf_counter() - t0
    out = {"mode": "device" if device_aug else "host",
           "imgs_per_sec": round(n_img / dt, 1),
           "sec_per_epoch": round(dt, 2), "imgs": n_img,
           "imgsz": args.imgsz, "batch": args.batch, "cfg": args.cfg,
           "hyp": args.hyp}
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="configs/models/yolov8x_2task.yaml")
    p.add_argument("--hyp", default="configs/hyps/hyp.cerber-default.yaml",
                   help="rotating hyps (voc_obj365) route through the 3-pass "
                        "decomposed affine device warp")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=128, help="images per task")
    p.add_argument("--max-labels", type=int, default=60)
    p.add_argument("--mode", choices=["host", "device", "both"], default="both")
    args = p.parse_args(argv)

    from cerberusdet_tpu.tools.bench_loader import make_dataset

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        for t in ("t1", "t2"):
            make_dataset(root / t, args.n, args.imgsz)
        if args.mode in ("host", "both"):
            run_mode(False, args, root)
        if args.mode in ("device", "both"):
            run_mode(True, args, root)


if __name__ == "__main__":
    main()
