"""ctypes binding for the native C++ sparse LDL^T solver.

The native tier of the framework (role of SuiteSparse/UMFPACK behind
russell_sparse in the reference, pose_graph_optimization.rs:124-144).
The shared library is built on demand with g++ from native/ldl_solver.cpp
and cached next to the source; set RUSTROBOTICS_NO_NATIVE=1 to disable.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "ldl_solver.cpp"
_LIB = _REPO_ROOT / "native" / "libldl.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("RUSTROBOTICS_NO_NATIVE"):
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.ldl_solve_coo.restype = ctypes.c_int
    lib.ldl_solve_coo.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def solve_coo_native(n: int, rows, cols, vals, b) -> np.ndarray:
    """Solve the SPD system given as COO triplets (duplicates summed).

    Input contract: triplets must cover the FULL symmetric pattern (both
    triangles), as the PGO assembly emits — the solver keeps the upper
    triangle of the fill-reducing permutation of A.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native LDL solver unavailable (no g++?)")
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    x = np.zeros(n, dtype=np.float64)
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    c_f64 = ctypes.POINTER(ctypes.c_double)
    status = lib.ldl_solve_coo(
        ctypes.c_int64(n), ctypes.c_int64(len(vals)),
        rows.ctypes.data_as(c_i32), cols.ctypes.data_as(c_i32),
        vals.ctypes.data_as(c_f64), b.ctypes.data_as(c_f64),
        x.ctypes.data_as(c_f64),
    )
    if status != 0:
        raise RuntimeError(f"native LDL solve failed with status {status}")
    return x
