"""ctypes wrapper for the native BVH builder (bvh_build.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_build.cpp")
_LIB = os.path.join(_DIR, "libbvh_build.so")

_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, text=True,
        )
    lib = ctypes.CDLL(_LIB)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.bvh_build.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_int,
        f32p, f32p, i32p, i32p, i64p, i32p,
    ]
    lib.bvh_build.restype = ctypes.c_int
    _lib = lib
    return lib


def build_bvh_native(
    lo: np.ndarray, hi: np.ndarray, max_leaf: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Returns (bb_min, bb_max, left, count, prims, max_depth) trimmed to
    node count; max_depth is the deepest node's depth (root = 0)."""
    lib = _load()
    n = len(lo)
    cap = 2 * n
    bb_min = np.empty((cap, 3), np.float32)
    bb_max = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    prims = np.empty(n, np.int64)
    max_depth = np.zeros(1, np.int32)
    n_nodes = lib.bvh_build(
        np.ascontiguousarray(lo, np.float32),
        np.ascontiguousarray(hi, np.float32),
        n, max_leaf, bb_min, bb_max, left, count, prims, max_depth,
    )
    return (bb_min[:n_nodes], bb_max[:n_nodes], left[:n_nodes],
            count[:n_nodes], prims, int(max_depth[0]))
