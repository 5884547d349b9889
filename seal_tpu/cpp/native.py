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
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        self._lib.sais_i32.restype = ctypes.c_int
        self._lib.sais_i32.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i64p]
        self._lib.stage1_claim.restype = ctypes.c_int
        self._lib.stage1_claim.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_int64, u8p]
        self._lib.ac_match.restype = ctypes.c_int64
        self._lib.ac_match.argtypes = [
            i32p, i64p, ctypes.c_int64, i32p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
        ]

    def stage1_claim(self, covered: np.ndarray, tok_ends: np.ndarray, length: int) -> np.ndarray:
        """First-come coverage claiming; mutates ``covered`` (uint8)."""
        tok_ends = np.ascontiguousarray(tok_ends, dtype=np.int64)
        flags = np.empty(tok_ends.size, np.uint8)
        self._lib.stage1_claim(
            covered.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            tok_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(tok_ends.size),
            ctypes.c_int64(length),
            flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return flags.astype(bool)

    def ac_match(self, patterns, docs) -> np.ndarray:
        """All (doc, pattern, start) occurrences of the patterns in the docs."""
        pat_data = np.ascontiguousarray(
            np.concatenate([np.asarray(p, np.int32) for p in patterns])
            if patterns else np.zeros(0, np.int32)
        )
        pat_off = np.zeros(len(patterns) + 1, np.int64)
        np.cumsum([len(p) for p in patterns], out=pat_off[1:])
        doc_data = np.ascontiguousarray(
            np.concatenate([np.asarray(d, np.int32) for d in docs])
            if docs else np.zeros(0, np.int32)
        )
        doc_off = np.zeros(len(docs) + 1, np.int64)
        np.cumsum([len(d) for d in docs], out=doc_off[1:])

        cap = max(1024, 4 * len(docs))
        while True:
            out = np.empty((cap, 3), np.int64)
            n = self._lib.ac_match(
                pat_data.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                pat_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(len(patterns)),
                doc_data.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                doc_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(len(docs)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(cap),
            )
            if n <= cap:
                return out[:n]
            cap = int(n)

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
    srcs = [os.path.join(_HERE, f) for f in ("sais.cpp", "agg.cpp")]
    out = os.path.join(_BUILD_DIR, "libsealtpu_native.so")
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", out, *srcs]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load() -> Native:
    """Build (if needed) and load the native library; raises on failure."""
    global _LIB
    with _LOCK:
        if _LIB is None:
            _LIB = Native(ctypes.CDLL(_build()))
        return _LIB
