"""Native (C++/OpenMP) runtime components, loaded via ctypes.

The reference's runtime-critical scalar cores are Fortran compiled with
vendor compilers (DLAED4 secular solves inside FS_PDLAED3.F90); this
package holds their C++ equivalents for the host-orchestrated parts of the
TPU pipeline, built on demand with the system toolchain and loaded through
ctypes (no pybind11 dependency).  Falls back to the numpy twins in
solvers/dc_host.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "secular.cpp")
_LIB = os.path.join(_HERE, "libeigenexa_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """Compile the native library if missing or stale.  Returns success."""
    try:
        if os.path.exists(_LIB) and (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        ):
            return True
        cmd = [
            "g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
            "-march=native", _SRC, "-o", _LIB + ".tmp",
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if the
    toolchain is unavailable (callers must fall back to numpy)."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("EIGENEXA_NO_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.eigenexa_secular_merge_batch.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.eigenexa_secular_merge_batch.restype = None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def merge_batch_native(d, z, rho, n_iter: int = 16):
    """Batched rank-1 merge through the C++ core (contract identical to
    dc_host.merge_batch_np).  Returns (lam (B,m), c_unsorted (B,m,m)) or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(d, np.float64)
    z = np.ascontiguousarray(z, np.float64)
    rho = np.ascontiguousarray(rho, np.float64)
    bsz, m = d.shape
    lam = np.empty((bsz, m), np.float64)
    c = np.empty((bsz, m, m), np.float64)
    lib.eigenexa_secular_merge_batch(
        _as_c(d), _as_c(z), _as_c(rho),
        ctypes.c_int64(bsz), ctypes.c_int64(m), ctypes.c_int(n_iter),
        _as_c(lam), _as_c(c),
    )
    return lam, c
