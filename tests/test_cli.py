"""CLI-surface smoke tests: train.py / val.py / detect.py argument paths run
end-to-end on a tiny synthetic dataset (reference CLI parity)."""

import sys
from pathlib import Path

import cv2
import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root for CLIs


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        img_dir = root / "images" / split
        lb_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lb_dir.mkdir(parents=True)
        for i in range(4):
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        rng.integers(0, 255, (96, 96, 3), np.uint8))
            (lb_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4")
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "train": [str(root / "images" / "train")],
        "val": [str(root / "images" / "val")],
        "nc": [2], "names": [["a", "b"]], "task_ids": ["t1"],
    }))
    return root, str(data_yaml)


@pytest.fixture(scope="module")
def trained_run(cli_data, tmp_path_factory):
    root, data_yaml = cli_data
    project = str(tmp_path_factory.mktemp("runs"))
    import train as train_cli

    train_cli.main([
        "--data", data_yaml, "--cfg", "configs/models/yolov8n.yaml",
        "--epochs", "1", "--batch-size", "2", "--imgsz", "64",
        "--project", project, "--name", "exp", "--patience", "5",
    ])
    ckpt = Path(project) / "exp" / "weights" / "last.ckpt.npz"
    assert ckpt.exists()
    return str(ckpt)


@pytest.mark.slow
def test_val_cli(trained_run, cli_data):
    _, data_yaml = cli_data
    import val as val_cli

    results = val_cli.main(["--weights", trained_run, "--data", data_yaml,
                            "--imgsz", "64", "--batch-size", "2"])
    assert "t1" in results
    assert np.isfinite(results["t1"]["results"][3])


@pytest.mark.slow
def test_val_cli_speed_mode(trained_run, cli_data):
    _, data_yaml = cli_data
    import val as val_cli

    out = val_cli.main(["--weights", trained_run, "--data", data_yaml,
                        "--imgsz", "64", "--batch-size", "2", "--task", "speed"])
    assert out["images_per_sec"] > 0


@pytest.mark.slow
def test_detect_cli(trained_run, cli_data, tmp_path):
    root, _ = cli_data
    import detect as detect_cli

    out_dir = detect_cli.main([
        "--weights", trained_run, "--source", str(root / "images" / "val"),
        "--imgsz", "64", "--conf-thres", "0.01", "--save-crop",
        "--project", str(tmp_path / "det"), "--name", "exp",
    ])
    outs = list(Path(out_dir).glob("*.jpg"))
    assert len(outs) == 4


@pytest.mark.slow
def test_detect_cli_int8(trained_run, cli_data, tmp_path):
    """--int8 detect: activation scales calibrated on the REAL source
    images, and the annotated outputs are still produced."""
    root, _ = cli_data
    import detect as detect_cli

    out_dir = detect_cli.main([
        "--weights", trained_run, "--source", str(root / "images" / "val"),
        "--imgsz", "64", "--conf-thres", "0.01", "--int8", "deep",
        "--project", str(tmp_path / "det8"), "--name", "exp",
    ])
    outs = list(Path(out_dir).glob("*.jpg"))
    assert len(outs) == 4


@pytest.mark.slow
def test_strip_weights_cli(trained_run):
    from cerberusdet_tpu.manager.checkpoint import load_checkpoint
    from cerberusdet_tpu.tools import strip_weights

    strip_weights.main(["--weights", trained_run])
    ckpt = load_checkpoint(trained_run)
    assert ckpt["opt"] is None and ckpt["meta"].get("stripped")


@pytest.mark.slow
def test_train_cli_single_cls(cli_data, tmp_path_factory):
    """--single-cls builds a 1-class model and trains (train.py:321,
    models_manager.py:84-87)."""
    _, data_yaml = cli_data
    project = str(tmp_path_factory.mktemp("runs_sc"))
    import train as train_cli

    train_cli.main([
        "--data", data_yaml, "--cfg", "configs/models/yolov8n.yaml",
        "--epochs", "1", "--batch-size", "2", "--imgsz", "64",
        "--project", project, "--name", "exp", "--single-cls",
        "--workers", "1", "--sync-bn",
    ])
    from cerberusdet_tpu.manager.checkpoint import load_checkpoint

    ckpt = load_checkpoint(str(Path(project) / "exp" / "weights" / "last.ckpt.npz"))
    assert ckpt["meta"]["nc"] == [1]
    assert ckpt["meta"]["names"] == [["item"]]


def test_train_cli_evolver_flag_dispatch(cli_data, monkeypatch):
    """--evolver yolov5|<ray searcher> picks the evolver class and prefixes
    the run name (train.py:363,398-406)."""
    _, data_yaml = cli_data
    import train as train_cli

    seen = {}

    class FakeEvolver:
        def __init__(self, opt, hyp, data_dict, generations=0,
                     params_to_evolve=None, **kw):
            seen["cls"] = type(self).__name__
            seen["name"] = opt.name
            seen["kw"] = kw

        def run_evolution(self):
            seen["ran"] = True

    import cerberusdet_tpu.evolve.yolov5_evolver as y5
    import cerberusdet_tpu.evolve.ray_evolver as ray_ev

    monkeypatch.setattr(y5, "Yolov5Evolver",
                        type("Yolov5Evolver", (FakeEvolver,), {}))
    monkeypatch.setattr(ray_ev, "RayEvolver",
                        type("RayEvolver", (FakeEvolver,), {}))

    train_cli.main(["--data", data_yaml, "--evolve", "2",
                    "--evolver", "yolov5", "--name", "e1"])
    assert seen.pop("cls") == "Yolov5Evolver" and seen.pop("ran")
    assert seen.pop("name") == "yolov5_e1"

    train_cli.main(["--data", data_yaml, "--evolve", "2",
                    "--evolver", "optuna", "--name", "e2",
                    "--evolve-per-task"])
    assert seen.pop("cls") == "RayEvolver" and seen.pop("ran")
    assert seen.pop("name") == "optuna_e2"
    assert seen.pop("kw")["searcher"] == "optuna"


@pytest.mark.slow
def test_train_cli_resume_reinstates_opt(cli_data, tmp_path_factory):
    """--resume replaces current CLI flags with the run's saved opt.yaml and
    resumes IN PLACE (train.py:346-356 semantics)."""
    _, data_yaml = cli_data
    project = str(tmp_path_factory.mktemp("runs_resume"))
    import train as train_cli

    train_cli.main([
        "--data", data_yaml, "--cfg", "configs/models/yolov8n.yaml",
        "--epochs", "1", "--batch-size", "2", "--imgsz", "64",
        "--project", project, "--name", "exp",
    ])
    ckpt = Path(project) / "exp" / "weights" / "last.ckpt.npz"
    assert ckpt.exists()

    # conflicting flags on the resume command line must be overridden by the
    # saved opt.yaml (imgsz 96 -> 64), and no new run dir may appear
    train_cli.main([
        "--data", data_yaml, "--imgsz", "96", "--batch-size", "4",
        "--project", project, "--resume", str(ckpt),
    ])
    import yaml as _yaml

    saved = _yaml.safe_load((Path(project) / "exp" / "opt.yaml").read_text())
    assert saved["imgsz"] == 64 and saved["batch_size"] == 2
    runs = sorted(p.name for p in Path(project).iterdir() if p.is_dir())
    assert runs == ["exp"], runs


def test_resume_auto_picks_newest_by_mtime(cli_data, tmp_path, monkeypatch):
    """--resume auto must pick the most recently written run, not the
    lexicographically last one (exp9 vs exp10)."""
    import os
    import time as _time

    _, data_yaml = cli_data
    import train as train_cli

    project = tmp_path / "runs"
    for name, age in (("exp10", 100), ("exp9", 0)):  # exp9 is NEWER
        w = project / name / "weights"
        w.mkdir(parents=True)
        (w / "last.ckpt.npz").write_bytes(b"x")
        t = _time.time() - age
        os.utime(w / "last.ckpt.npz", (t, t))

    captured = {}

    class Stop(Exception):
        pass

    class FakeLoop:
        def __init__(self, opt, *a, **kw):
            captured["resume"] = opt.resume
            raise Stop

    import cerberusdet_tpu.train.trainer as tr

    monkeypatch.setattr(tr, "TrainLoop", FakeLoop)
    with pytest.raises(Stop):
        train_cli.main(["--data", data_yaml, "--project", str(project),
                        "--resume"])
    assert "exp9" in captured["resume"], captured


def test_platform_flag_parses_and_applies(monkeypatch):
    """--platform (VERDICT r2 item 10): accepted by all three CLIs; the
    override sets the jax backend config (debug analog of the reference's
    --device flag)."""
    import detect as detect_cli
    import train as train_cli
    import val as val_cli

    assert train_cli.parse_opt(["--data", "d", "--platform", "cpu"]).platform == "cpu"
    assert val_cli.parse_opt(["--weights", "w", "--data", "d",
                              "--platform", "cpu"]).platform == "cpu"
    assert detect_cli.parse_opt(["--weights", "w", "--source", "s",
                                 "--platform", "cpu"]).platform == "cpu"

    import os

    import jax

    from cerberusdet_tpu.utils.checks import select_platform

    before = jax.config.jax_platforms
    try:
        select_platform("cpu")
        assert os.environ["JAX_PLATFORMS"] == "cpu"
        assert jax.config.jax_platforms == "cpu"
        select_platform("")  # no-op: keeps the current setting
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", before)
