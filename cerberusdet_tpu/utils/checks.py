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
