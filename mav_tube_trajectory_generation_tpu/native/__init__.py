"""Native (C++) components: compile-on-demand ctypes bindings.

``parity_oracle``: an independent C++ implementation of the closed-form
linear min-derivative solve, serving as the "C++ reference" side of the
coefficient-parity gate (BASELINE.json metric).  Compiled with the system
g++ into a per-checkout cache on first use; every call crosses the ctypes
boundary with plain double buffers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "parity_oracle.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_libparity_oracle.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Compile (if needed) and load the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.mtg_solve_linear.restype = ctypes.c_int
    lib.mtg_solve_linear.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def solve_linear_cpp(fixed_mask: np.ndarray, values: np.ndarray,
                     times: np.ndarray, derivative: int,
                     n_coefficients: int = 10) -> np.ndarray:
    """Closed-form linear solve in C++ (double precision).

    Args:
      fixed_mask: (V, N/2) bool.
      values: (V, N/2, D) float64 (free entries ignored).
      times: (K,) float64.
      derivative: cost derivative order.

    Returns:
      (K, N, D) monomial coefficients.
    """
    lib = load()
    fixed_mask = np.ascontiguousarray(fixed_mask, dtype=np.uint8)
    values = np.ascontiguousarray(values, dtype=np.float64)
    times = np.ascontiguousarray(times, dtype=np.float64)
    v, h = fixed_mask.shape
    dim = values.shape[-1]
    n = n_coefficients
    if n > 64:
        raise ValueError("n_coefficients > 64 unsupported by the oracle.")
    out = np.zeros(((v - 1) * n * dim,), dtype=np.float64)
    status = lib.mtg_solve_linear(n, dim, v, derivative, fixed_mask.ravel(),
                                  values.ravel(), times, out)
    if status != 0:
        raise RuntimeError(f"mtg_solve_linear failed with status {status}")
    return out.reshape(v - 1, n, dim)


# ---------------------------------------------------------------------------
# Exact O(n) EDT (Felzenszwalb lower envelope), edt.cpp -- the big-map ESDF
# builder (models/esdf.esdf_from_occupancy dispatches here for host arrays).
# ---------------------------------------------------------------------------

_EDT_SRC = os.path.join(os.path.dirname(__file__), "edt.cpp")
_EDT_LIB = os.path.join(os.path.dirname(__file__), "_libedt.so")

_edt_lib: Optional[ctypes.CDLL] = None


def load_edt() -> ctypes.CDLL:
    """Compile (if needed) and load the EDT library."""
    global _edt_lib
    if _edt_lib is not None:
        return _edt_lib
    if (not os.path.exists(_EDT_LIB)
            or os.path.getmtime(_EDT_LIB) < os.path.getmtime(_EDT_SRC)):
        base = ["g++", "-O3", "-shared", "-fPIC", "-o", _EDT_LIB, _EDT_SRC]
        try:
            subprocess.run(base[:1] + ["-fopenmp"] + base[1:],
                           check=True, capture_output=True)
        except subprocess.CalledProcessError:
            subprocess.run(base, check=True, capture_output=True)
    lib = ctypes.CDLL(_EDT_LIB)
    lib.mtg_edt_sq.restype = ctypes.c_int
    lib.mtg_edt_sq.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    _edt_lib = lib
    return lib


def edt_available() -> bool:
    try:
        load_edt()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def edt_squared_cpp(mask: np.ndarray) -> np.ndarray:
    """Exact squared EDT (voxel units) to the nearest True voxel of a 3-D
    mask; rows/planes with no feature voxel at all come back +inf."""
    lib = load_edt()
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    if mask.ndim != 3:
        raise ValueError("edt_squared_cpp expects a 3-D mask")
    out = np.empty(mask.shape, dtype=np.float32)
    status = lib.mtg_edt_sq(mask.shape[0], mask.shape[1], mask.shape[2],
                            mask.ravel(), out.ravel())
    if status != 0:
        raise RuntimeError(f"mtg_edt_sq failed with status {status}")
    return out
