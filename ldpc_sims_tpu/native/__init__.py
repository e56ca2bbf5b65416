"""Native (C++) components, loaded via ctypes with pure-Python fallback.

The shared library is built on demand with g++ (no pip/pybind11 needed —
ctypes over a C ABI). If no compiler is available the Python fallbacks in
codes/ are used transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["peg_construct_native", "native_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpeg.so")
_SRC = os.path.join(_DIR, "peg.cc")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.peg_construct.argtypes = [
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.peg_construct.restype = ctypes.c_int32
            _lib = lib
        except (subprocess.CalledProcessError, OSError):
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def peg_construct_native(
    n: int, m: int, col_deg: int, seed: int = 0
) -> np.ndarray:
    """(m, n) uint8 parity-check matrix from the C++ PEG builder."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native PEG library unavailable (no g++?)")
    out = np.zeros(n * col_deg, dtype=np.int32)
    rc = lib.peg_construct(
        n, m, col_deg, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"peg_construct failed with code {rc}")
    H = np.zeros((m, n), dtype=np.uint8)
    checks = out.reshape(n, col_deg)
    for v in range(n):
        H[checks[v], v] = 1
    return H
