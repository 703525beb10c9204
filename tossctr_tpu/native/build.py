"""Build + ctypes bindings for the native fastgather library.

Compiled lazily on first use with g++ (cached as libfastgather.so next
to the source); every consumer must tolerate absence (no compiler /
failed build) and fall back to NumPy — the native path is a throughput
optimization, never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastgather.cpp")
_LIB = os.path.join(_DIR, "libfastgather.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_fastgather() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.gather_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.gather_rows.restype = None
        lib.gather_rows_multi.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int,
        ]
        lib.gather_rows_multi.restype = None
        _lib = lib
        return _lib


def have_fastgather() -> bool:
    return get_fastgather() is not None


def gather_rows_native(
    src: np.ndarray, idx: np.ndarray, out: Optional[np.ndarray] = None,
    n_threads: int = 8,
) -> Optional[np.ndarray]:
    """dst[i] = src[idx[i]] via the native library; None if unavailable.
    ``src`` must be C-contiguous rows (mmap'd .npy qualifies)."""
    lib = get_fastgather()
    if lib is None:
        return None
    src2 = src.reshape(src.shape[0], -1) if src.ndim > 1 else src.reshape(-1, 1)
    row_bytes = src2.shape[1] * src2.dtype.itemsize
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    n = idx.shape[0]
    if out is None:
        out = np.empty((n,) + src.shape[1:], dtype=src.dtype)
    out2 = out.reshape(n, -1)
    assert out2.flags.c_contiguous
    src_ptr = ctypes.c_char_p(
        src2.ctypes.data if src2.flags.c_contiguous else np.ascontiguousarray(src2).ctypes.data
    )
    lib.gather_rows(
        src_ptr,
        ctypes.c_char_p(out2.ctypes.data),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        ctypes.c_int64(row_bytes),
        ctypes.c_int(n_threads),
    )
    return out


def gather_rows_multi_native(srcs, idx: np.ndarray, outs, n_threads: int = 8) -> bool:
    """Gather the same rows from several arrays at once. Returns False if
    the native library is unavailable (caller falls back to NumPy)."""
    lib = get_fastgather()
    if lib is None:
        return False
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    n = idx.shape[0]
    n_arrays = len(srcs)
    src_ptrs = (ctypes.c_char_p * n_arrays)()
    dst_ptrs = (ctypes.c_char_p * n_arrays)()
    row_bytes = (ctypes.c_int64 * n_arrays)()
    keepalive = []
    for a, (src, out) in enumerate(zip(srcs, outs)):
        s2 = src.reshape(src.shape[0], -1) if src.ndim > 1 else src.reshape(-1, 1)
        if not s2.flags.c_contiguous:
            s2 = np.ascontiguousarray(s2)
        keepalive.append(s2)
        o2 = out.reshape(n, -1)
        assert o2.flags.c_contiguous and o2.dtype == src.dtype
        src_ptrs[a] = ctypes.c_char_p(s2.ctypes.data)
        dst_ptrs[a] = ctypes.c_char_p(o2.ctypes.data)
        row_bytes[a] = s2.shape[1] * s2.dtype.itemsize
    lib.gather_rows_multi(
        src_ptrs, dst_ptrs, row_bytes, ctypes.c_int(n_arrays),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n), ctypes.c_int(n_threads),
    )
    return True
