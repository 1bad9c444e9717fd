"""Lazy ctypes build/load of the native CSV reader."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csv_reader.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> str:
    d = os.environ.get(
        "MMC_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "motionmixerconv_tpu", "native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_csv_reader() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native reader; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            with open(_SRC, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            so_path = os.path.join(_cache_dir(), f"csv_reader_{digest}.so")
            if not os.path.exists(so_path):
                tmp = so_path + ".tmp"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
            lib.mmc_read_csv.restype = ctypes.POINTER(ctypes.c_float)
            lib.mmc_read_csv.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.mmc_read_csv_many.restype = ctypes.c_int
            lib.mmc_read_csv_many.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.mmc_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            lib.mmc_free.restype = None
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def read_csv_many_native(paths: list[str]) -> Optional[list[Optional[np.ndarray]]]:
    """Parse many CSV files concurrently on a native thread pool.

    Returns a list aligned with ``paths`` (None per failed file), or None if
    the native library is unavailable.
    """
    lib = load_csv_reader()
    if lib is None or not paths:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rows = (ctypes.c_long * n)()
    cols = (ctypes.c_long * n)()
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)()
    lib.mmc_read_csv_many(c_paths, n, rows, cols, ptrs)
    out: list[Optional[np.ndarray]] = []
    for i in range(n):
        if not ptrs[i]:
            out.append(None)
            continue
        try:
            size = rows[i] * cols[i]
            arr = np.ctypeslib.as_array(ptrs[i], shape=(size,)).astype(
                np.float32, copy=True
            )
            out.append(arr.reshape(rows[i], cols[i]))
        finally:
            lib.mmc_free(ptrs[i])
    return out


def read_csv_native(path: str) -> Optional[np.ndarray]:
    """Parse a CSV float matrix with the native reader; None on any failure."""
    lib = load_csv_reader()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    ptr = lib.mmc_read_csv(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if not ptr:
        return None
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(np.float32, copy=True)
        return arr.reshape(rows.value, cols.value)
    finally:
        lib.mmc_free(ptr)
