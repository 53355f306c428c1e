"""ctypes wrapper for the native inverse-CDF sampler (samplewi.cpp).

The host-side twin of `data/tabulated.py` — see samplewi.cpp for the
provenance (the reference's absent ``samplewi`` pybind module, inventory
row N3)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "samplewi.cpp")
_LIB = os.path.join(_DIR, "libsamplewi.so")

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
    lib.samplewi.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
        ctypes.c_uint64, f32p,
    ]
    lib.samplewi.restype = ctypes.c_int
    _lib = lib
    return lib


def samplewi_native(
    pdf: np.ndarray, n_samples: int, seed: int = 0
) -> np.ndarray:
    """pdf: (B, res*res) or (B, res, res) non-negative grids. Returns
    (B, n_samples, 2) samples in [-1, 1]^2 (the reference callers rescale
    to their angular domains, `utils_sampling_torch_brdf.py:194-196`)."""
    pdf = np.ascontiguousarray(pdf, np.float32)
    if pdf.ndim == 3:
        b, r, r2 = pdf.shape
        assert r == r2, pdf.shape
        pdf = pdf.reshape(b, r * r)
    else:
        b, g = pdf.shape
        r = int(round(g**0.5))
        assert r * r == g, f"not a square grid: {g}"
    out = np.empty((b, n_samples, 2), np.float32)
    rc = _load().samplewi(pdf, b, r, n_samples, seed, out.reshape(b, -1))
    if rc == -2:
        raise ValueError("samplewi: a pdf row sums to zero")
    if rc != 0:
        raise ValueError(f"samplewi failed with code {rc}")
    return out
