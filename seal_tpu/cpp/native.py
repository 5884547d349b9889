"""ctypes loader/builder for the native C++ helpers.

pybind11/SWIG are unavailable in this environment; the C ABI + ctypes keeps
the binding layer dependency-free (the reference used SWIG,
``/root/reference/seal/cpp_modules/fm_index.i``).  The shared object is built
on first use with g++ and cached under ``seal_tpu/cpp/_build``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LOCK = threading.Lock()
_LIB = None


class Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        self._lib.sais_i32.restype = ctypes.c_int
        self._lib.sais_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]

    def suffix_array(self, text: np.ndarray) -> np.ndarray:
        t = np.ascontiguousarray(text, dtype=np.int32)
        n = t.size
        sa = np.empty(n, dtype=np.int64)
        k = int(t.max()) if n else 0
        rc = self._lib.sais_i32(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(n),
            ctypes.c_int64(k),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if rc != 0:
            raise RuntimeError(f"sais_i32 failed with code {rc}")
        return sa


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.join(_HERE, "sais.cpp")
    out = os.path.join(_BUILD_DIR, "libsealtpu_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", out, src]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load() -> Native:
    """Build (if needed) and load the native library; raises on failure."""
    global _LIB
    with _LOCK:
        if _LIB is None:
            _LIB = Native(ctypes.CDLL(_build()))
        return _LIB
