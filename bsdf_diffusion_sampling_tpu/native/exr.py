"""ctypes wrapper + on-demand build of the native EXR IO library.

Builds `libexr_io.so` from exr_io.cpp with the system g++ / OpenEXR 3.1 the
first time it's needed (cached next to the source; rebuild when the source
is newer). Python-side API: read_exr(path) -> (H, W, 3) float32,
write_exr(path, img).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "exr_io.cpp")
_LIB = os.path.join(_DIR, "libexr_io.so")

_BUILD_CMD = [
    "g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB,
    "-I/usr/include/OpenEXR", "-I/usr/include/Imath",
    "-lOpenEXR-3_1", "-lIlmThread-3_1", "-lIex-3_1", "-lImath-3_1",
]

_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(_BUILD_CMD, check=True, capture_output=True, text=True)
    lib = ctypes.CDLL(_LIB)
    lib.exr_read_rgb.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.exr_read_rgb.restype = ctypes.c_int
    lib.exr_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.exr_write_rgb.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.exr_write_rgb.restype = ctypes.c_int
    _lib = lib
    return lib


def read_exr(path: str) -> np.ndarray:
    """(H, W, 3) float32, top-down row-major."""
    lib = _load()
    buf = ctypes.POINTER(ctypes.c_float)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    rc = lib.exr_read_rgb(path.encode(), ctypes.byref(buf), ctypes.byref(w),
                          ctypes.byref(h), err, len(err))
    if rc != 0:
        raise IOError(f"exr_read_rgb({path}): {err.value.decode()}")
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.exr_free(buf)
    return arr


def write_exr(path: str, img: np.ndarray) -> None:
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {img.shape}")
    err = ctypes.create_string_buffer(256)
    rc = lib.exr_write_rgb(
        path.encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[1],
        img.shape[0],
        err,
        len(err),
    )
    if rc != 0:
        raise IOError(f"exr_write_rgb({path}): {err.value.decode()}")
