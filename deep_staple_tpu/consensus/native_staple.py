"""ctypes binding to the C++ STAPLE EM (native/deepstaple_native.cpp).

CPU cross-check for the JAX implementation — the same role SimpleITK's C++
filter played for the reference.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None
_SEARCHED = False


def _lib():
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    cand = Path(__file__).resolve().parent.parent.parent / "native" / "libdeepstaple_io.so"
    if cand.is_file():
        lib = ctypes.CDLL(str(cand))
        lib.ds_staple_em.restype = ctypes.c_int
        lib.ds_staple_em.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    return _LIB


def native_staple_available() -> bool:
    return _lib() is not None


def staple_consensus_native(
    label_list,
    max_iterations: int = 200,
    epsilon: float = 1e-7,
    confidence_weight: float = 1.0,
    threshold: float = 0.5,
):
    """Returns (consensus int32 array, sensitivities, specificities, iters)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native STAPLE library not built (run native/build.sh)")
    stack = np.stack([np.asarray(l) for l in label_list]).astype(np.float32)
    spatial = stack.shape[1:]
    R = stack.shape[0]
    d = np.ascontiguousarray(stack.reshape(R, -1))
    V = d.shape[1]
    w = np.zeros(V, np.float32)
    p = np.zeros(R, np.float32)
    q = np.zeros(R, np.float32)
    iters = lib.ds_staple_em(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        R,
        V,
        confidence_weight,
        max_iterations,
        epsilon,
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if iters < 0:
        raise RuntimeError(f"native STAPLE failed with code {iters}")
    consensus = (w > threshold).astype(np.int32).reshape(spatial)
    return consensus, p, q, iters
