#!/usr/bin/env python
"""Serving CLI: HTTP detection service with dynamic request batching over
the one-program TPU inference pipeline.

No reference equivalent (cerberusdet ships only offline detect.py); this is
the deployment surface for the serving half of the framework. Example:

    python serve.py --weights runs/train/exp/weights/best.ckpt.npz \
        --port 8000 --max-batch 8 --int8 all

    curl -X POST --data-binary @image.jpg localhost:8000/predict
"""

import argparse


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True, help="framework .ckpt.npz")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--iou-thres-between-tasks", type=float, default=0.8)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--bf16", "--half", action="store_true", dest="bf16")
    p.add_argument("--int8", default="off", choices=["off", "deep", "all"])
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8,
                   help="the ONE compiled serving batch shape; partial "
                        "batches are padded to it (throughput deployments: "
                        "128 — the v5e batch-scaling winner, +36% img/s "
                        "over 32 at ~250 ms/batch; PROFILE.md round-5)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="batch-fill wait after the first request arrives")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel serving over every local chip: params "
                        "replicate, each served batch shards over the mesh "
                        "(max-batch must divide by the device count)")
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu"])
    p.add_argument("--compile-cache", default="", metavar="DIR",
                   help="persistent XLA compile cache dir; restarts of the "
                        "daemon deserialize the serving program instead of "
                        "recompiling it (default ~/.cache/cerberusdet_tpu/"
                        "xla, 'off' disables)")
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_opt(argv)
    from cerberusdet_tpu.utils.checks import enable_compile_cache, select_platform
    select_platform(opt.platform)
    enable_compile_cache(opt.compile_cache)
    from cerberusdet_tpu.infer import CerberusDetInference, CerberusPreprocessor
    from cerberusdet_tpu.serve import BatchingEngine, make_server

    mesh = None
    if opt.mesh:
        import jax
        from cerberusdet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if opt.max_batch % mesh.devices.size:
            raise SystemExit(
                f"--max-batch {opt.max_batch} must divide by the "
                f"{mesh.devices.size}-device mesh")
        print(f"serving over a {mesh.devices.size}-chip data mesh "
              f"({jax.devices()[0].platform})")
    inference = CerberusDetInference(
        weights=opt.weights, conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
        iou_thres_between_tasks=opt.iou_thres_between_tasks,
        img_size=opt.imgsz, half=opt.bf16, max_det=opt.max_det, int8=opt.int8,
        mesh=mesh,
        # every served batch pads to max_batch — warm THAT shape, not b1
        warmup_batch=opt.max_batch)
    pre = CerberusPreprocessor(img_size=opt.imgsz, stride=32)
    engine = BatchingEngine(inference, pre, max_batch=opt.max_batch,
                            max_wait_ms=opt.max_wait_ms)
    tasks = list(inference.names)
    # compile the ONE serving program (a partial batch pads to max_batch, so
    # this dummy request traces the exact shape every future batch uses)
    # BEFORE accepting traffic — otherwise the first clients eat the full
    # XLA compile as request latency and time out
    import numpy as np

    print(f"warming up the batch-{opt.max_batch} serving program ...",
          flush=True)
    engine.submit(np.full((opt.imgsz, opt.imgsz, 3), 114, np.uint8)).result()
    server = make_server(engine, tasks, host=opt.host, port=opt.port)
    print(f"serving {tasks} on {opt.host}:{opt.port} "
          f"(batch {opt.max_batch}, wait {opt.max_wait_ms}ms, int8={opt.int8})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()
        server.server_close()


if __name__ == "__main__":
    main()
