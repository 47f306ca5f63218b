"""Environment / input validation helpers.

Behavioral parity target: cerberusdet/utils/checks.py (check_python,
check_version, check_file, check_img_size via general.py:122-127,
check_dataset + download via general.py:130-203 — auto-download included,
offline-testable through file:// URLs).
"""

from __future__ import annotations

import glob
import math
import platform
from pathlib import Path
from typing import List, Optional, Union


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def check_img_size(imgsz: Union[int, List[int]], s: int = 32, floor: int = 0):
    """Round image size up to a stride multiple (general.py:122-127)."""
    if isinstance(imgsz, int):
        new = max(make_divisible(imgsz, s), floor)
    else:
        new = [max(make_divisible(x, s), floor) for x in imgsz]
    if new != imgsz:
        print(f"WARNING: --img-size {imgsz} must be a multiple of {s}, using {new}")
    return new


def check_python(minimum: str = "3.10.0") -> bool:
    return check_version(platform.python_version(), minimum, name="Python")


def check_version(current: str, minimum: str, name: str = "version",
                  hard: bool = False) -> bool:
    def to_tuple(v):
        return tuple(int(x) for x in v.split("+")[0].split(".")[:3] if x.isdigit())

    ok = to_tuple(current) >= to_tuple(minimum)
    if not ok and hard:
        raise AssertionError(f"{name} {minimum} required, found {current}")
    return ok


def check_file(file: str, search_dirs: Optional[List[str]] = None) -> str:
    """Return the file path, searching configured dirs (checks.py:156-172;
    no network download in this environment)."""
    file = str(file)
    if Path(file).is_file() or not file:
        return file
    for d in search_dirs or ["configs", "configs/models", "configs/data", "configs/hyps"]:
        hits = glob.glob(f"{d}/**/{Path(file).name}", recursive=True)
        if hits:
            return hits[0]
    raise FileNotFoundError(f"file not found: {file}")


def check_online(host: str = "1.1.1.1", port: int = 443,
                 timeout: float = 2.0) -> bool:
    """Connectivity probe (checks.py:59-67). TPU training hosts commonly run
    with no egress — callers must treat False as normal."""
    import socket

    try:
        socket.setdefaulttimeout(timeout)
        socket.socket(socket.AF_INET, socket.SOCK_STREAM).connect((host, port))
        return True
    except OSError:
        return False


def check_git_status(repo_dir: str = ".") -> Optional[str]:
    """Report if the working tree is behind its remote (checks.py:70-91).
    Returns a human message or None when up to date / not applicable.
    Never raises: git may be absent, the dir may not be a repo, and there
    may be no egress to fetch."""
    import subprocess

    def git(*args):
        return subprocess.run(["git", "-C", repo_dir, *args],
                              capture_output=True, text=True, timeout=10)

    try:
        if git("rev-parse", "--git-dir").returncode != 0:
            return None
        if not check_online():
            return None
        git("fetch")
        r = git("rev-list", "HEAD..@{u}", "--count")
        if r.returncode != 0:
            return None
        n = int(r.stdout.strip() or 0)
        if n:
            return (f"WARNING: local repository is {n} commit(s) behind its "
                    f"remote — consider `git pull`")
        return None
    except Exception:
        return None


def check_requirements(requirements: List[str], install: bool = False) -> List[str]:
    """Verify importable packages; returns the missing ones
    (checks.py:106-138). Auto-pip is intentionally NOT performed on TPU
    hosts (hermetic images); `install` is accepted for signature parity and
    ignored with a warning."""
    import importlib.util

    missing = [r for r in requirements
               if importlib.util.find_spec(r.split(">=")[0].split("==")[0]
                                           .replace("-", "_")) is None]
    if missing and install:
        print(f"WARNING: auto-install disabled in this environment; "
              f"missing: {missing}")
    return missing


def check_font(font: str = "Arial.ttf") -> Optional[str]:
    """Resolve a usable TTF for PIL annotation (checks.py:18-29). Searches
    common system font dirs instead of downloading; returns a path or None
    (plotting falls back to cv2/PIL default fonts)."""
    candidates = [Path(font)]
    for d in ("/usr/share/fonts", "/usr/local/share/fonts",
              str(Path.home() / ".fonts")):
        candidates += [Path(p) for p in glob.glob(f"{d}/**/*.ttf", recursive=True)[:5]]
    for c in candidates:
        if c.is_file():
            return str(c)
    return None


def check_imshow() -> bool:
    """Whether a GUI display is available for cv2.imshow (checks.py:141-153).
    Headless TPU hosts: False."""
    import os

    return bool(os.environ.get("DISPLAY")) and platform.system() != "Windows"


def select_platform(name: str = "") -> None:
    """Debug override of the JAX backend (the TPU-native analog of the
    reference's `--device` flag, torch_utils.py select_device): "" keeps the
    environment default (TPU when present), "cpu"/"tpu" force a backend.

    Must run before any jax computation; works both before and after
    `import jax` (jax.config wins over the env var once jax is loaded).
    """
    if not name:
        return
    import os
    import sys

    os.environ["JAX_PLATFORMS"] = name
    if "jax" in sys.modules:
        import jax

        jax.config.update("jax_platforms", name)


def enable_compile_cache(cache_dir: str = "") -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir` (default
    ~/.cache/cerberusdet_tpu/xla). Compiled XLA executables are serialized
    keyed by HLO hash, so a process restart (serving daemon redeploy, repeated
    CLI runs on the same config) skips the 20-40s compile and deserializes in
    ~1-2s instead. Pass "off" to disable. Returns the directory used, or None.

    TPU-native analog of nothing in the reference (torch has no AOT artifact
    for its eager path); this is what makes rolling restarts of serve.py
    cheap. Safe under concurrent processes (the cache writes via atomic
    renames) and harmless on cache miss.
    """
    if cache_dir == "off":
        return None
    if not cache_dir:
        cache_dir = str(Path.home() / ".cache" / "cerberusdet_tpu" / "xla")
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compilation (the default skips sub-second compiles; a
    # serving restart wants ALL of them warm)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def download(url, dir=".", unzip: bool = True, delete: bool = True,
             threads: int = 1) -> None:
    """Download (and optionally extract) one or more archives
    (general.py:173-203 parity). urllib instead of torch.hub (handles
    file:// URLs, so the machinery is testable without egress); zipfile /
    tarfile instead of shelling out to unzip/tar.
    """
    import shutil
    import tarfile
    import threading
    import urllib.request
    import zipfile
    from concurrent.futures import ThreadPoolExecutor

    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    # zipfile._extract_member races on os.makedirs (exists-check then create)
    # when two threads extract archives sharing a directory tree — serialize
    # extraction; the downloads themselves still overlap.
    extract_lock = threading.Lock()

    def download_one(u: str) -> None:
        f = dir / Path(urllib.parse.urlparse(u).path or u).name
        if not f.exists():
            with urllib.request.urlopen(u) as r, open(f, "wb") as out:
                shutil.copyfileobj(r, out)
        if unzip and f.suffix in (".zip", ".gz"):
            with extract_lock:
                if f.suffix == ".zip":
                    with zipfile.ZipFile(f) as z:
                        z.extractall(dir)
                else:
                    with tarfile.open(f, "r:gz") as t:
                        t.extractall(f.parent)
            if delete:
                f.unlink()

    urls = [url] if isinstance(url, str) else list(url)
    if threads > 1:
        with ThreadPoolExecutor(threads) as pool:
            list(pool.map(download_one, urls))
    else:
        for u in urls:
            download_one(u)


def apply_path_prefix(data: dict) -> dict:
    """Resolve the optional `path` key onto train/val/test entries
    (general.py:131-137). Path(prefix) / absolute-path == absolute-path, so
    repeated application never double-prepends."""
    path = Path(data.get("path", ""))
    if str(path) not in ("", "."):
        for k in ("train", "val", "test"):
            if data.get(k):
                data[k] = (str(path / data[k]) if isinstance(data[k], str)
                           else [str(path / x) for x in data[k]])
    return data


def check_dataset(data: dict, autodownload: bool = True) -> dict:
    """Resolve the optional `path` prefix, default `names`, verify val paths
    exist, and run the yaml's `download` stanza when they don't
    (general.py:130-170 parity). The stanza forms match the reference:
    an archive URL (http/https/file, .zip), a `bash ...` command, or inline
    python exec'd with the data dict bound as `yaml`."""
    import os

    path = Path(data.get("path", ""))
    data = apply_path_prefix(data)
    assert "nc" in data, "Dataset 'nc' key missing."
    if "names" not in data:
        nc = data["nc"]
        data["names"] = ([[str(i) for i in range(n)] for n in nc]
                         if isinstance(nc, list)
                         else [str(i) for i in range(nc)])
    train, val, s = (data.get(x) for x in ("train", "val", "download"))
    if isinstance(train, list) and isinstance(val, list):
        assert len(train) == len(val)

    def warn_missing_train():
        # the reference verifies only val (general.py:141-152) — standalone
        # val must work with no train data on disk — but a train-path typo
        # should not surface as a late "no images found" deep inside the
        # dataset: warn here, where the dataset CONFIG is being checked
        # (after any download stanza has had its chance to create the dirs)
        if train:
            bad = [str(p)
                   for p in (train if isinstance(train, list) else [train])
                   if not Path(p).resolve().exists()]
            if bad:
                print(f"WARNING: train paths do not exist: {bad}")
        return data

    if not val:
        return warn_missing_train()
    val_paths = [Path(x).resolve()
                 for x in (val if isinstance(val, list) else [val])]
    missing = [str(x) for x in val_paths if not x.exists()]
    if not missing:
        return warn_missing_train()
    if not (s and autodownload):
        raise FileNotFoundError(f"Dataset not found, nonexistent paths: {missing}")
    if (s.startswith(("http://", "https://", "file://"))
            and s.endswith(".zip")):
        root = path.parent if "path" in data else ".."
        download(s, dir=root)
    elif s.startswith("bash "):
        r = os.system(s)
        if r != 0:
            raise RuntimeError(f"dataset download script failed (rc={r}): {s}")
    else:
        exec(s, {"yaml": data})
    still = [str(x) for x in val_paths if not x.exists()]
    if still:
        raise FileNotFoundError(f"dataset download did not produce: {still}")
    return warn_missing_train()
