"""Native (C++) host-IO: DCT-scaled JPEG decode via libjpeg(-turbo).

Build-on-first-use: the shared library compiles from jpeg_io.cpp into the
package directory (falls back to a per-user cache dir if the tree is
read-only). Every entry point degrades gracefully — `decode_jpeg_scaled`
returns None whenever the native path can't help (no compiler, no libjpeg,
not a JPEG, corrupt file) and callers fall back to cv2.

Why this exists: the reference delegates host decode to OpenCV at FULL
resolution and resizes after (cerberusdet/data/datasets.py:463-480). For
sources larger than imgsz, libjpeg's scale_num/8 decode does the downscale
inside the inverse DCT — typically 2-4x faster on >1080p inputs — and the
exact final resize still happens in the caller, so target geometry is
identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _candidate_so_paths():
    yield _HERE / "libcerberus_io.so"
    cache = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    yield cache / "cerberusdet_tpu" / "libcerberus_io.so"


def _build(so_path: Path) -> bool:
    src = _HERE / "jpeg_io.cpp"
    so_path.parent.mkdir(parents=True, exist_ok=True)
    # compile to a unique temp name and rename atomically: concurrent
    # first-use builds (e.g. several worker processes) must never dlopen a
    # half-written .so
    tmp = so_path.with_name(f".{so_path.name}.{os.getpid()}.tmp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(tmp), "-ljpeg"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        sys.stderr.write(f"cerberusdet_tpu.native: build failed:\n{proc.stderr[-1000:]}\n")
        tmp.unlink(missing_ok=True)
        return False
    os.replace(tmp, so_path)
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = _HERE / "jpeg_io.cpp"
        for so in _candidate_so_paths():
            try:
                if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                    if not _build(so):
                        continue
                lib = ctypes.CDLL(str(so))
            except OSError:
                continue
            lib.cdet_jpeg_scaled_dims.restype = ctypes.c_int
            lib.cdet_jpeg_scaled_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.cdet_decode_jpeg_scaled.restype = ctypes.c_int
            lib.cdet_decode_jpeg_scaled.argtypes = [
                ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ]
            _LIB = lib
            return _LIB
        return None


def available() -> bool:
    return _load() is not None


def decode_jpeg_scaled(
    data: bytes, max_long_side: int
) -> Optional[Tuple[np.ndarray, Tuple[int, int]]]:
    """Decode a JPEG at the smallest DCT scale whose long side is still
    >= max_long_side. Returns (RGB uint8 HWC array, (full_h, full_w)) or
    None when the native path is unavailable / the data isn't a clean JPEG.
    The returned array is >= the target size; the caller does the exact
    final resize (so output geometry matches the cv2 full-decode path)."""
    lib = _load()
    if lib is None or len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    oh, ow = ctypes.c_int(), ctypes.c_int()
    fh, fw = ctypes.c_int(), ctypes.c_int()
    rc = lib.cdet_jpeg_scaled_dims(
        data, len(data), max_long_side,
        ctypes.byref(oh), ctypes.byref(ow), ctypes.byref(fh), ctypes.byref(fw),
    )
    if rc != 0 or oh.value <= 0 or ow.value <= 0:
        return None
    out = np.empty((oh.value, ow.value, 3), np.uint8)
    rc = lib.cdet_decode_jpeg_scaled(
        data, len(data), max_long_side,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        oh.value, ow.value,
    )
    if rc != 0:
        return None
    return out, (fh.value, fw.value)


def imread_scaled(
    path: str, max_long_side: int
) -> Optional[Tuple[np.ndarray, Tuple[int, int]]]:
    """File variant of decode_jpeg_scaled; None on any failure."""
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_jpeg_scaled(data, max_long_side)
