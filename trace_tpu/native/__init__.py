"""Native (C++) runtime components, bound via ctypes.

The reference is pure Julia with no native tier (SURVEY.md §2); here the
host-side runtime pieces that gate large scenes — currently the SAH BVH
builder — are C++, compiled on first use with g++ and loaded with ctypes
(pybind11 is not available in this environment). Every native component
keeps a NumPy fallback that doubles as its correctness oracle in tests.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtrace_native.so")
_SOURCES = [os.path.join(_DIR, "bvh_builder.cpp")]


def _build_library() -> str | None:
    newest_src = max(os.path.getmtime(s) for s in _SOURCES)
    if (
        os.path.exists(_LIB_PATH)
        and os.path.getmtime(_LIB_PATH) >= newest_src
    ):
        return _LIB_PATH
    cmd = [
        # -ffp-contract=off: cluster_pack's double-precision constants
        # must round exactly like the numpy oracle's (no FMA fusion).
        "g++", "-O3", "-march=native", "-ffp-contract=off",
        "-shared", "-fPIC", "-o", _LIB_PATH, *_SOURCES,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None


_lib = None
_load_attempted = False


def load() -> ctypes.CDLL | None:
    """Compile (if needed) and load the native library; None on failure."""
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    path = _build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        _bind_signatures(lib)
    except (OSError, AttributeError):
        # AttributeError: a stale .so missing newer symbols (e.g. a
        # preserved-mtime restore of sources over an old build artifact)
        # must fall back to NumPy like any other load failure.
        return None
    _lib = lib
    return _lib


def _bind_signatures(lib) -> None:
    lib.bvh_build.restype = ctypes.c_int64
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bvh_cluster_cut.restype = ctypes.c_int64
    lib.bvh_cluster_cut.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.cluster_pack.restype = None
    lib.cluster_pack.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.bvh_refit.restype = None
    lib.bvh_refit.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
