"""ctypes bindings for the native setup kernels (``native/aggmg_native.cpp``).

The reference leans on native LAPACK/UMFPACK through Julia for its setup
factorizations (SURVEY §2.9); our host-side setup equivalents (batched tiny
inverses, block-tridiagonal products) get the same treatment: a small C++
library loaded via ctypes, with transparent NumPy fallbacks when the library
has not been built.  Build with ``make -C native`` (or it is built lazily on
first use if a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libaggmg_native.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "aggmg_native.cpp")


def _try_build() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC_PATH, "-o", _SO_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if os.environ.get("AGGMG_NO_NATIVE"):
            _LIB = False
            return _LIB
        if not os.path.exists(_SO_PATH) and not _try_build():
            _LIB = False
            return _LIB
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.aggmg_batched_inv.restype = ctypes.c_int64
            lib.aggmg_batched_inv.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ]
            lib.aggmg_batched_matmul.restype = None
            lib.aggmg_batched_matmul.argtypes = [ctypes.POINTER(ctypes.c_double)] * 3 + [
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.aggmg_bt_mul_bt.restype = None
            lib.aggmg_bt_mul_bt.argtypes = [ctypes.POINTER(ctypes.c_double)] * 9 + [
                ctypes.c_int64, ctypes.c_int64,
            ]
            _LIB = lib
        except OSError:
            _LIB = False
    return _LIB


def have_native() -> bool:
    return bool(_load())


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def batched_inv(blocks: np.ndarray) -> np.ndarray:
    """Inverse of every ``(bs, bs)`` block in a ``(n, bs, bs)`` f64 stack."""
    blocks = np.ascontiguousarray(blocks, dtype=np.float64)
    lib = _load()
    if not lib:
        return np.linalg.inv(blocks)
    out = blocks.copy()
    n, bs, _ = out.shape
    failures = lib.aggmg_batched_inv(_dptr(out), n, bs)
    if failures:
        raise np.linalg.LinAlgError(f"{failures} singular blocks in batched_inv")
    return out


def batched_matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    lib = _load()
    if not lib:
        return a @ b
    out = np.empty_like(a)
    n, bs, _ = a.shape
    lib.aggmg_batched_matmul(_dptr(a), _dptr(b), _dptr(out), n, bs)
    return out
