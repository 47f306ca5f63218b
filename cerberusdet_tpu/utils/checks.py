"""Environment / input validation helpers.

Behavioral parity target: cerberusdet/utils/checks.py (check_python,
check_version, check_file, check_img_size via general.py:122-127,
check_dataset via general.py:130-170 minus auto-download).
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


def check_dataset(data_dict: dict) -> dict:
    """Verify every train/val path exists (general.py:130-170 without
    auto-download: this environment has no egress)."""
    missing = []
    for key in ("train", "val"):
        for p in data_dict.get(key, []):
            if not Path(p).exists():
                missing.append(p)
    if missing:
        raise FileNotFoundError(f"dataset paths missing: {missing}")
    return data_dict
