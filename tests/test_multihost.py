"""REAL multi-host execution: two JAX processes (4 virtual devices each) run
one multi-task train step over a global 8-device mesh and must agree with
each other AND with the single-process 8-device run of the same step.

This closes the reference's DDP capability end-to-end (train.py:376-384,
samplers.py:137-184): until now the multi-process path was only unit-tested
with faked host ids — here jax.distributed + Gloo collectives actually run.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests/multihost_worker.py"),
             str(i), str(port), str(outs[i])],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
    for rc, out, err in logs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-3000:]}"

    w0, w1 = (json.loads(o.read_text()) for o in outs)

    # the two hosts saw DISJOINT, interleaved dataset shards
    assert set(w0["local_indices"]) | set(w1["local_indices"]) == set(range(16))
    assert not set(w0["local_indices"]) & set(w1["local_indices"])

    # both hosts report the identical global step (losses + updated state)
    for k in ("a", "b", "param_checksum"):
        assert np.isfinite(w0[k])
        assert w0[k] == pytest.approx(w1[k], rel=1e-6), k

    # and it matches the single-process 8-device run of the same global batch
    # (this pytest process IS that run: conftest provisions 8 CPU devices)
    from cerberusdet_tpu.parallel import make_mesh
    from tests.multihost_worker import run_step

    ref = run_step(make_mesh())
    for k in ("a", "b"):
        assert ref[k] == pytest.approx(w0[k], rel=2e-4), (k, ref[k], w0[k])
    assert ref["param_checksum"] == pytest.approx(w0["param_checksum"], rel=2e-4)


@pytest.mark.slow
def test_two_process_full_trainloop(tmp_path):
    """The FULL TrainLoop across 2 processes: host-sharded train loaders,
    process-0-only val/checkpoints, broadcast stop/fitness; final params
    identical on both hosts."""
    port = _free_port()
    outs = [tmp_path / f"t{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests/multihost_worker.py"),
             str(i), str(port), str(outs[i]), "trainloop"],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
    for rc, out, err in logs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-3000:]}"

    w0, w1 = (json.loads(o.read_text()) for o in outs)
    # each host's loader sees its half: 8 imgs / bs 4 = 2 global batches,
    # 1 per host -> nb is the HOST-LOCAL batch count
    assert w0["train_batches_per_epoch"] == w1["train_batches_per_epoch"]
    # only process 0 wrote checkpoints
    assert w0["ckpt_written"] and not w1["ckpt_written"]
    # broadcast fitness agrees; final replicated params identical
    assert w0["fitness"] == pytest.approx(w1["fitness"], abs=1e-6)
    assert np.isfinite(w0["param_checksum"])
    assert w0["param_checksum"] == pytest.approx(w1["param_checksum"], rel=1e-6)


@pytest.mark.slow
def test_two_process_trainloop_device_augment(tmp_path):
    """Multi-process composition of the device-side augmentation pipeline:
    each host plans its own shard, holds its own resident pack, and the two
    hosts' replicated params stay identical through 2 epochs."""
    port = _free_port()
    outs = [tmp_path / f"d{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests/multihost_worker.py"),
             str(i), str(port), str(outs[i]), "trainloop-devaug"],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
    for rc, out, err in logs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-3000:]}"

    w0, w1 = (json.loads(o.read_text()) for o in outs)
    assert w0["ckpt_written"] and not w1["ckpt_written"]
    assert w0["fitness"] == pytest.approx(w1["fitness"], abs=1e-6)
    assert np.isfinite(w0["param_checksum"])
    assert w0["param_checksum"] == pytest.approx(w1["param_checksum"], rel=1e-6)


@pytest.mark.slow
def test_two_process_sharded_val_equals_full_val(tmp_path):
    """VERDICT r2 item 7: standalone val sharded across 2 processes (host-
    sharded loader + all-gathered stats) must equal the single-process
    full-set val — on BOTH processes (beyond the reference's rank-0-only
    val, cerberusdet/val.py:132-433)."""
    from tests.multihost_worker import make_val_dataset, run_val

    data_root = tmp_path / "ds"
    make_val_dataset(data_root)

    port = _free_port()
    outs = [tmp_path / f"v{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests/multihost_worker.py"),
             str(i), str(port), str(outs[i]), "val", str(data_root)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
    for rc, out, err in logs:
        assert rc == 0, f"val worker failed (rc={rc}):\n{out}\n{err[-3000:]}"

    w0, w1 = (json.loads(o.read_text()) for o in outs)
    ref = run_val(distributed=False, data_root=data_root)

    # the merged stats must be non-trivial for this test to discriminate
    assert ref["n_gt_stats"] == 16
    # both processes report the FULL set
    for w in (w0, w1):
        assert w["seen"] == ref["seen"] == 16
        assert w["n_pred_stats"] == ref["n_pred_stats"]
        assert w["n_gt_stats"] == ref["n_gt_stats"]
        assert w["confusion_sum"] == pytest.approx(ref["confusion_sum"])
        for a, b in zip(w["results"], ref["results"]):
            assert a == pytest.approx(b, abs=1e-9)
        assert w["fitness"] == pytest.approx(ref["fitness"], abs=1e-9)
