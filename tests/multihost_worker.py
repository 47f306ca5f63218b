"""Worker process for the REAL multi-host (multi-process JAX) train-step test.

Each of the two workers owns 4 virtual CPU devices; together they form one
8-device global mesh (the software shape of a 2-host TPU pod slice). This is
the executable counterpart of the reference's `torch.distributed.launch` DDP
world (train.py:376-384): every host feeds only ITS rows of the global batch
and XLA's collectives (over Gloo here, ICI on real hardware) produce bitwise
one logical training step.

Run via tests/test_multihost.py, or standalone:
    python tests/multihost_worker.py <pid> <port> <out.json>
"""

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def make_global_batch(nc: int, seed: int, batch: int, imgsz: int = 64):
    """Deterministic global batch — workers slice their host's rows from it,
    the single-process reference run consumes it whole."""
    import numpy as np

    r = np.random.default_rng(seed)
    return {
        "img": r.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32),
        "cls": r.integers(0, nc, (batch, 4)).astype(np.int32),
        "bboxes": r.uniform(0.3, 0.5, (batch, 4, 4)).astype(np.float32),
        "mask": np.ones((batch, 4), bool),
        "prob": np.ones((batch, 4), np.float32),
    }


def run_step(mesh, global_batch_rows=None):
    """One 2-task train step on the current mesh. global_batch_rows: slice of
    rows this process feeds (None = full batch, single-process mode)."""
    import jax
    import numpy as np

    from cerberusdet_tpu.models.cerberus import CerberusModel
    from cerberusdet_tpu.parallel import replicate, shard_batch
    from cerberusdet_tpu.train.loss import DetectionLoss
    from cerberusdet_tpu.train.step import MultiTaskTrainer, init_train_state

    model = CerberusModel(
        str(REPO / "configs/models/yolov8n_2task.yaml"), ["a", "b"], [3, 5]
    )
    params = model.init(jax.random.PRNGKey(0))
    losses = {
        "a": DetectionLoss(nc=3, strides=model.strides),
        "b": DetectionLoss(nc=5, strides=model.strides),
    }
    trainer = MultiTaskTrainer(model, losses)

    with mesh:
        state = replicate(init_train_state(params), mesh)
        batches = {}
        for t, nc, seed in (("a", 3, 1), ("b", 5, 2)):
            full = make_global_batch(nc, seed, 8)
            rows = ({k: v[global_batch_rows] for k, v in full.items()}
                    if global_batch_rows is not None else full)
            batches[t] = shard_batch(rows, mesh)
        lrs = np.full((3,), 0.01, np.float32)
        state, items = trainer.step(state, batches, lrs, 0.9)
        out = {t: float(it.total) for t, it in items.items()}
        out["param_checksum"] = param_checksum(state, mesh)
    return out


def param_checksum(state, mesh):
    """Order-independent scalar over the updated state (replicated, so it
    materializes on every host identically)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def ck(s):
        leaves = [x for x in jax.tree_util.tree_leaves(s)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)

    fn = jax.jit(ck, out_shardings=NamedSharding(mesh, P()))
    return float(fn(state))


def run_trainloop(pid: int, out_path: str, device_augment: bool = False):
    """Full TrainLoop for 2 epochs under 2-process JAX: host-sharded train
    loaders, process-0-only val/ckpt/logs, broadcast stop/fitness. Each host
    generates the identical tiny dataset (seeded) in its own tmp dir — the
    file-level twin of every host mounting the same dataset.

    device_augment=True additionally routes each host's shard through the
    device-side augmentation pipeline (plans + resident pack + jitted
    mosaic/warp program) — the multi-process composition of
    data/device_augment.py."""
    import tempfile

    import cv2
    import jax
    import numpy as np
    import yaml

    from cerberusdet_tpu.train.trainer import TrainLoop, TrainOptions

    tmp = Path(tempfile.mkdtemp(prefix=f"mh{pid}_"))
    rng = np.random.default_rng(7)
    for split in ("train", "val"):
        (tmp / "images" / split).mkdir(parents=True)
        (tmp / "labels" / split).mkdir(parents=True)
        for i in range(8):
            cv2.imwrite(str(tmp / "images" / split / f"{i}.jpg"),
                        rng.integers(0, 255, (96, 96, 3), np.uint8))
            (tmp / "labels" / split / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4")
    data = {
        "train": [str(tmp / "images" / "train")],
        "val": [str(tmp / "images" / "val")],
        "nc": [2], "names": [["a", "b"]], "task_ids": ["t1"],
    }
    (tmp / "data.yaml").write_text(yaml.safe_dump(data))

    opt = TrainOptions(
        cfg=str(REPO / "configs/models/yolov8n.yaml"),
        data=str(tmp / "data.yaml"), epochs=2, batch_size=4, imgsz=64,
        project=str(tmp / "runs"), name="mh", patience=5, plots=False,
        augment_device=device_augment,
    )
    import cerberusdet_tpu.manager.run_manager as rm

    with open(REPO / "configs/hyps/hyp.cerber-default.yaml") as f:
        hyp = yaml.safe_load(f)
    if device_augment:
        hyp.update(dict(mosaic=1.0, fliplr=0.5))
    loop = TrainLoop(opt, rm.parse_data_config(opt.data), hyp, use_mesh=True)
    fi = loop.train()

    ckpt = Path(opt.project) / "mh" / "weights" / "last.ckpt.npz"
    from cerberusdet_tpu.parallel import make_mesh

    out = {
        "process_index": pid,
        "fitness": float(fi),
        "ckpt_written": ckpt.exists(),
        "param_checksum": param_checksum(loop.state, make_mesh()),
        "train_batches_per_epoch": loop.nb,
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"trainloop worker {pid} OK: {out}", flush=True)


def make_val_dataset(root: Path, n: int = 16, nc: int = 2, size: int = 96):
    """Deterministic tiny val set (same files on every host)."""
    import cv2
    import numpy as np
    import yaml

    rng = np.random.default_rng(11)
    (root / "images" / "val").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "val").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        cv2.imwrite(str(root / "images" / "val" / f"{i}.jpg"),
                    rng.integers(0, 255, (size, size, 3), np.uint8))
        c = int(rng.integers(0, nc))
        (root / "labels" / "val" / f"{i}.txt").write_text(
            f"{c} 0.5 0.5 0.4 0.4")
    data = {"val": [str(root / "images" / "val")], "nc": [nc],
            "names": [["a", "b"]], "task_ids": ["t1"]}
    (root / "data.yaml").write_text(yaml.safe_dump(data))
    return data


def run_val(distributed: bool, data_root: Path):
    """Standalone-val path: host-sharded loader + all-gathered stats.
    Returns the quantities the test compares."""
    import jax
    import numpy as np

    from cerberusdet_tpu.data.loaders import create_dataloader
    from cerberusdet_tpu.evaluation.val import run_task
    from cerberusdet_tpu.models.cerberus import CerberusModel

    model = CerberusModel(str(REPO / "configs/models/yolov8n.yaml"), ["t1"], [2])
    params = model.fuse(model.init(jax.random.PRNGKey(3)))
    _, loader = create_dataloader(
        str(data_root / "images" / "val"), imgsz=64, batch_size=4,
        augment=False, shuffle=False, classnames=["a", "b"], task="t1_val",
        host_sharded=distributed)
    out = run_task(model, params, "t1", loader, nc=2, names=["a", "b"],
                   conf_thres=0.001, iou_thres=0.6, plots=True,
                   distributed=distributed)
    m = out["metrics"]
    n_pred = int(sum(len(s[0]) for s in m.stats))
    n_gt = int(sum(len(s[3]) for s in m.stats))
    return {
        "seen": out["seen"],
        "results": [float(x) for x in out["results"]],
        "fitness": out["fitness"],
        "n_pred_stats": n_pred,
        "n_gt_stats": n_gt,
        "confusion_sum": float(np.sum(out["confusion"].matrix)),
    }


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platform_name", "cpu")
    # authoritative platform restriction: the axon sitecustomize imports jax
    # BEFORE this process's env override, so JAX_PLATFORMS=cpu from os.environ
    # can be read too late — without this line backends() still creates the
    # remote-TPU client in every worker, which BLOCKS when the tunnel has no
    # free client slots (observed: both workers hung in make_c_api_client)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # share the persistent compile cache with conftest: the two workers
    # compile identical programs (same 8-device topology), and repeat CI
    # runs start warm — on this 1-core host that is most of the wall time
    cache = str(REPO / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    sys.path.insert(0, str(REPO))
    if mode == "trainloop":
        run_trainloop(pid, out_path)
        return
    if mode == "trainloop-devaug":
        run_trainloop(pid, out_path, device_augment=True)
        return
    if mode == "val":
        # sharded standalone val: data dir passed by the test (argv[5])
        data_root = Path(sys.argv[5])
        out = run_val(distributed=True, data_root=data_root)
        out["process_index"] = pid
        with open(out_path, "w") as f:
            json.dump(out, f)
        print(f"val worker {pid} OK: {out}", flush=True)
        return
    import numpy as np

    from cerberusdet_tpu.data.samplers import HostShardSampler, ShuffleSampler
    from cerberusdet_tpu.parallel import make_mesh

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    # HostShardSampler picks up the REAL process topology: the two hosts'
    # index streams partition the dataset disjointly (samplers.py:137-184
    # parity, here under genuine multi-process JAX)
    sampler = HostShardSampler(ShuffleSampler(16, shuffle=False))
    local_idx = list(sampler)
    assert len(local_idx) == 8 and all(i % 2 == pid for i in local_idx), (
        pid, local_idx)

    mesh = make_mesh()  # all 8 global devices
    rows = slice(pid * 4, (pid + 1) * 4)
    out = run_step(mesh, global_batch_rows=rows)
    out["process_index"] = pid
    out["local_indices"] = local_idx
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"worker {pid} OK: {out}", flush=True)


if __name__ == "__main__":
    main()
