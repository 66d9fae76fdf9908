"""ctypes binding for the C++ MAS host kernel (`arttts_tpu/native/mas.cc`).

Replaces the reference's Cython/OpenMP extension
(`model/monotonic_align/setup.py`) with a build-on-first-use shared library:
`g++ -O3 -fopenmp` compiled into the package's native/ directory, loaded via
ctypes (no pybind11). Used as the CPU parity oracle against the JAX/Pallas
implementations and as a host fallback.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_SRC = _NATIVE_DIR / "mas.cc"
_LIB = _NATIVE_DIR / "libmas.so"

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    lib.mas_forward_backtrace.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
    ]
    lib.mas_forward_backtrace.restype = None
    _lib = lib
    return lib


def mas_cpp(
    value: np.ndarray,
    t_xs: np.ndarray,
    t_ys: np.ndarray,
    max_neg_val: float = -1e9,
) -> np.ndarray:
    """Batched MAS on host. value: (B, T_x, T_y) float32 (masked log-prior);
    returns int32 paths of the same shape."""
    lib = _load()
    value = np.ascontiguousarray(value, dtype=np.float32).copy()
    B, T_x, T_y = value.shape
    paths = np.zeros((B, T_x, T_y), dtype=np.int32)
    t_xs = np.ascontiguousarray(t_xs, dtype=np.int32)
    t_ys = np.ascontiguousarray(t_ys, dtype=np.int32)
    lib.mas_forward_backtrace(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B,
        T_x,
        T_y,
        max_neg_val,
    )
    return paths
