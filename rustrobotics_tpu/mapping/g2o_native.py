"""ctypes binding for the native C++ g2o parser.

The reference's data loader is native (Rust, g2o.rs:35-143); this is the
framework's native equivalent — a single-pass mmap-free buffer parser with
locale-independent ``std::from_chars`` conversion, bit-identical to the
Python parser's ``float()`` results (both produce correctly-rounded IEEE
doubles). Built on demand with g++ like the native LDL solver; any
failure (no g++, parse error, unknown record) returns ``None`` and the
caller falls back to the pure-Python parser, which owns error semantics.

Set ``RUSTROBOTICS_NO_NATIVE=1`` to disable.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "g2o_parser.cpp"
_LIB = _REPO_ROOT / "native" / "libg2o.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-march=native", "-shared",
             "-fPIC", str(_SRC), "-o", str(_LIB)],
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
    # a pre-built lib with no source alongside (artifact-only deploy) is
    # used as-is; staleness can only be judged when the source exists
    if not _LIB.exists() or (_SRC.exists()
                             and _LIB.stat().st_mtime < _SRC.stat().st_mtime):
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.g2o_parse.restype = ctypes.c_void_p
    lib.g2o_parse.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_int64)]
    lib.g2o_fill.restype = None
    lib.g2o_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 21
    lib.g2o_free.restype = None
    lib.g2o_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def parse_native(path: str):
    """Parse ``path`` with the C++ parser.

    Returns the same plain-numpy dict as the Python tokenizer
    (``g2o._parse_python``), or ``None`` if the native parser is
    unavailable or rejects the file (caller falls back to Python).
    """
    lib = _load()
    if lib is None:
        return None
    counts = (ctypes.c_int64 * 10)()
    handle = lib.g2o_parse(os.fsencode(path), counts)
    if not handle or counts[9] != 0:
        if handle:
            lib.g2o_free(handle)
        return None
    n2, l2, n3, e_pp, e_pl, e_qq = (int(counts[i]) for i in range(6))
    out = {
        "poses2": np.empty((n2, 3), np.float64),
        "landmarks2": np.empty((l2, 2), np.float64),
        "poses3": np.empty((n3, 7), np.float64),
        "pp_from": np.empty(e_pp, np.int32),
        "pp_to": np.empty(e_pp, np.int32),
        "pp_z": np.empty((e_pp, 3), np.float64),
        "pp_omega": np.empty((e_pp, 3, 3), np.float64),
        "pl_pose": np.empty(e_pl, np.int32),
        "pl_lm": np.empty(e_pl, np.int32),
        "pl_z": np.empty((e_pl, 2), np.float64),
        "pl_omega": np.empty((e_pl, 2, 2), np.float64),
        "qq_from": np.empty(e_qq, np.int32),
        "qq_to": np.empty(e_qq, np.int32),
        "qq_z": np.empty((e_qq, 7), np.float64),
        "qq_omega": np.empty((e_qq, 6, 6), np.float64),
        "pose2_offsets": np.empty(n2, np.int32),
        "lm2_offsets": np.empty(l2, np.int32),
        "pose3_offsets": np.empty(n3, np.int32),
        "pp_file_index": np.empty(e_pp, np.int64),
        "pl_file_index": np.empty(e_pl, np.int64),
        "qq_file_index": np.empty(e_qq, np.int64),
    }
    order = (
        "poses2", "landmarks2", "poses3", "pp_from", "pp_to", "pp_z",
        "pp_omega", "pl_pose", "pl_lm", "pl_z", "pl_omega", "qq_from",
        "qq_to", "qq_z", "qq_omega", "pose2_offsets", "lm2_offsets",
        "pose3_offsets", "pp_file_index", "pl_file_index",
        "qq_file_index",
    )
    lib.g2o_fill(handle, *(out[k].ctypes.data_as(ctypes.c_void_p)
                           for k in order))
    lib.g2o_free(handle)
    out["total_dof"] = int(counts[6])
    out["prior2"] = int(counts[7])
    out["prior3"] = int(counts[8])
    return out
