"""Auto-download machinery (VERDICT r2 item 6): check_dataset/download parity
with cerberusdet/utils/general.py:130-203, exercised OFFLINE through file://
URLs and local scripts — no egress needed."""

import zipfile
from pathlib import Path

import pytest
import yaml

from cerberusdet_tpu.manager.run_manager import parse_data_config
from cerberusdet_tpu.utils.checks import check_dataset, download


def _make_zip(tmp_path: Path, name="ds.zip") -> Path:
    """A dataset archive: images/val/0.jpg + labels/val/0.txt."""
    src = tmp_path / f"zsrc_{name}"
    (src / "images" / "val").mkdir(parents=True)
    (src / "labels" / "val").mkdir(parents=True)
    (src / "images" / "val" / "0.jpg").write_bytes(b"\xff\xd8fakejpg")
    (src / "labels" / "val" / "0.txt").write_text("0 0.5 0.5 0.4 0.4")
    zpath = tmp_path / name
    with zipfile.ZipFile(zpath, "w") as z:
        for f in src.rglob("*"):
            if f.is_file():
                z.write(f, f.relative_to(src))
    return zpath


def test_download_file_url_zip_extract_and_delete(tmp_path):
    zpath = _make_zip(tmp_path)
    dst = tmp_path / "out"
    download(f"file://{zpath}", dir=dst)
    assert (dst / "images" / "val" / "0.jpg").exists()
    assert not (dst / "ds.zip").exists()  # delete=True default


def test_download_keep_archive_and_threads(tmp_path):
    z1 = _make_zip(tmp_path, "a.zip")
    z2 = _make_zip(tmp_path, "b.zip")
    dst = tmp_path / "out"
    download([f"file://{z1}", f"file://{z2}"], dir=dst, delete=False, threads=2)
    assert (dst / "a.zip").exists() and (dst / "b.zip").exists()
    # existing archives are not re-downloaded (general.py:177-179 semantics)
    mtime = (dst / "a.zip").stat().st_mtime
    download(f"file://{z1}", dir=dst, delete=False)
    assert (dst / "a.zip").stat().st_mtime == mtime


def test_check_dataset_zip_stanza_roundtrip(tmp_path):
    """A data yaml whose val paths are missing + a file:// zip download
    stanza: check_dataset fetches, extracts to the path's parent, and the
    paths then exist (general.py:151-166)."""
    zpath = _make_zip(tmp_path)
    root = tmp_path / "datasets" / "mini"
    data = {
        "path": str(root),
        "train": ["images/val"],
        "val": ["images/val"],
        "nc": [2],
        "names": [["a", "b"]],
        "task_ids": ["t1"],
        "download": f"file://{zpath}",
    }
    # the archive holds images/... so it must land inside `path` itself for
    # path-relative entries; the reference extracts to path.parent with
    # archives that carry the dataset dir — emulate that layout
    with zipfile.ZipFile(zpath) as z:
        names = z.namelist()
    assert all(not n.startswith("mini/") for n in names)
    # re-pack with the dataset-dir prefix the reference layout expects
    zpath2 = tmp_path / "mini.zip"
    with zipfile.ZipFile(zpath) as zin, zipfile.ZipFile(zpath2, "w") as zout:
        for n in zin.namelist():
            zout.writestr("mini/" + n, zin.read(n))
    data["download"] = f"file://{zpath2}"

    out = check_dataset(dict(data))
    val = Path(out["val"][0])
    assert val.exists() and val == root / "images" / "val"


def test_check_dataset_python_stanza(tmp_path):
    """Inline-python stanza exec'd with the data dict bound as `yaml`
    (general.py:164-165)."""
    root = tmp_path / "pyds"
    data = {
        "path": str(root),
        "val": ["images/val"],
        "nc": [1],
        "names": [["x"]],
        "download": ("from pathlib import Path\n"
                     "Path(yaml['val'][0]).mkdir(parents=True)\n"),
    }
    out = check_dataset(dict(data))
    assert Path(out["val"][0]).exists()


def test_check_dataset_bash_stanza(tmp_path):
    root = tmp_path / "bds"
    script = tmp_path / "get.sh"
    script.write_text(f"mkdir -p {root}/images/val\n")
    data = {
        "path": str(root),
        "val": ["images/val"],
        "nc": [1],
        "names": [["x"]],
        "download": f"bash {script}",
    }
    out = check_dataset(dict(data))
    assert Path(out["val"][0]).exists()


def test_check_dataset_missing_without_stanza_raises(tmp_path):
    data = {"val": [str(tmp_path / "nope")], "nc": [1], "names": [["x"]]}
    with pytest.raises(FileNotFoundError):
        check_dataset(dict(data))
    # autodownload=False ignores the stanza (general.py autodownload flag)
    data["download"] = "echo hi"
    with pytest.raises(FileNotFoundError):
        check_dataset(dict(data), autodownload=False)


def test_check_dataset_names_default_and_idempotent_prepend(tmp_path):
    (tmp_path / "images" / "val").mkdir(parents=True)
    data = {"path": str(tmp_path), "val": ["images/val"], "nc": [3]}
    out = check_dataset(dict(data))
    assert out["names"] == [["0", "1", "2"]]
    # second pass: paths already absolute — no double-prepend
    again = check_dataset(dict(out))
    assert again["val"] == out["val"]


def test_parse_data_config_check_flag(tmp_path):
    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "images" / "val").mkdir(parents=True)
    y = tmp_path / "d.yaml"
    y.write_text(yaml.safe_dump({
        "path": str(tmp_path),
        "train": ["images/train"], "val": ["images/val"],
        "nc": [1], "names": [["x"]], "task_ids": ["t"],
    }))
    d = parse_data_config(str(y), check=True)
    assert d["val"] == [str(tmp_path / "images" / "val")]
    # without check, the path prefix is still applied (config semantics)
    d2 = parse_data_config(str(y))
    assert d2["val"] == [str(tmp_path / "images" / "val")]


def test_check_dataset_warns_on_missing_train(tmp_path, capsys):
    """val-only data on disk stays valid (reference checks only val,
    general.py:141-152) but a train-path typo is surfaced HERE as a
    warning instead of a late 'no images found' inside the dataset."""
    from cerberusdet_tpu.utils.checks import check_dataset

    val_dir = tmp_path / "images" / "val"
    val_dir.mkdir(parents=True)
    data = {"train": [str(tmp_path / "images" / "trian")],  # typo
            "val": [str(val_dir)], "nc": [1]}
    out = check_dataset(dict(data))
    assert "WARNING" in capsys.readouterr().out
    assert out["val"] == data["val"]  # still returns the config

    data_ok = {"train": [str(val_dir)], "val": [str(val_dir)], "nc": [1]}
    check_dataset(dict(data_ok))
    assert "WARNING" not in capsys.readouterr().out
