"""ctypes wrapper around the fma-faithful oracle update
(simplex_tpu/native/fma_update.cpp).

The reference GPU's rank-1 pivot update rounds each element ONCE
(hardware fma, src/solver.cu:43,55); NumPy/BLAS host updates round the
product and the subtraction separately. A rank-1 update has no
accumulation order, so that single rounding is the only arithmetic gap
between the GPU and a host replay — these routines close it, extending
exact pivot-count parity beyond the 2048-class boundary (see
tests/test_parity.py). Compiled on first use with the system C++
compiler and cached next to the source (the utils/curand.py pattern);
``available()`` gates callers so compiler-less environments skip the
fma replay rather than failing.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import tempfile

import numpy as np

_SRC = (pathlib.Path(__file__).resolve().parents[1] / "native"
        / "fma_update.cpp")
_LIB_CACHE: ctypes.CDLL | None = None
_BUILD_FAILED = False

_F64P = ctypes.POINTER(ctypes.c_double)


def _build_library() -> ctypes.CDLL | None:
    global _BUILD_FAILED
    if _BUILD_FAILED:
        return None
    lib_path = _SRC.parent / "_fma.so"
    try:
        if (not lib_path.exists()
                or lib_path.stat().st_mtime < _SRC.stat().st_mtime):
            # Build inside the destination's own directory: os.replace
            # from a TemporaryDirectory (usually tmpfs) into the repo
            # tree raises EXDEV on cross-filesystem setups, which would
            # be swallowed below and permanently disable the fma path.
            with tempfile.TemporaryDirectory(dir=_SRC.parent) as td:
                tmp = os.path.join(td, "fma.so")
                # -march=native lowers std::fma to the hardware vfmadd;
                # without FMA hardware the libm call is bit-identical,
                # just slower, so fall back to plain -O3 if -march=native
                # is rejected (exotic/virtualized hosts).
                base = ["g++", "-O3", "-shared", "-fPIC", str(_SRC),
                        "-o", tmp]
                try:
                    subprocess.run(base[:2] + ["-march=native"] + base[2:],
                                   check=True, capture_output=True)
                except subprocess.CalledProcessError:
                    subprocess.run(base, check=True, capture_output=True)
                os.replace(tmp, lib_path)
        lib = ctypes.CDLL(str(lib_path))
    except (OSError, subprocess.CalledProcessError):
        _BUILD_FAILED = True
        return None
    lib.pivot_update_fma.argtypes = [_F64P, _F64P, _F64P, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_double]
    lib.axpy_fma.argtypes = [_F64P, _F64P, ctypes.c_double,
                             ctypes.c_int64]
    lib.fma_scalar.argtypes = [ctypes.c_double] * 3
    lib.fma_scalar.restype = ctypes.c_double
    return lib


def _library() -> ctypes.CDLL | None:
    global _LIB_CACHE
    if _LIB_CACHE is None:
        _LIB_CACHE = _build_library()
    return _LIB_CACHE


def available() -> bool:
    return _library() is not None


def _ptr(a: np.ndarray) -> "ctypes.POINTER":
    return a.ctypes.data_as(_F64P)


def pivot_update_fma(T: np.ndarray, colk: np.ndarray, factor: np.ndarray,
                     k: int, p: float) -> None:
    """In place: T[i, j] = fma(-factor[j], colk[i], T[i, j]) for j != k;
    T[:, k] = colk / p. T must be C-contiguous float64."""
    assert T.flags.c_contiguous and T.dtype == np.float64
    rows, cols = T.shape
    _library().pivot_update_fma(_ptr(T), _ptr(np.ascontiguousarray(colk)),
                                _ptr(np.ascontiguousarray(factor)),
                                rows, cols, int(k), float(p))


def axpy_fma(x: np.ndarray, v: np.ndarray, a: float) -> None:
    """In place: x[i] = fma(a, v[i], x[i])."""
    assert x.flags.c_contiguous and x.dtype == np.float64
    _library().axpy_fma(_ptr(x), _ptr(np.ascontiguousarray(v)), float(a),
                        x.size)


def fma_scalar(a: float, b: float, c: float) -> float:
    """Correctly rounded a*b + c (math.fma needs Python >= 3.13)."""
    return float(_library().fma_scalar(float(a), float(b), float(c)))
