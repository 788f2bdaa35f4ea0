"""Build + load the native DTW shared library (ctypes, no pybind11).

Compiled lazily on first use with g++ -O3; cached next to the source.
"""
import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dtw.cpp")
_LIB = os.path.join(_HERE, "libdtw_native.so")

_lib = None


def _compile():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native_dtw():
    """Returns a callable dtw(a, b, la, lb) -> (B,) float64, or None when
    no native toolchain is available."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        try:
            _compile()
        except (OSError, subprocess.CalledProcessError):
            return None
    cdll = ctypes.CDLL(_LIB)
    cdll.dtw_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    cdll.dtw_batch.restype = None

    def dtw_batch_native(a, b, la, lb):
        a = np.ascontiguousarray(a, np.float32)
        b = np.ascontiguousarray(b, np.float32)
        la = np.ascontiguousarray(la, np.int32)
        lb = np.ascontiguousarray(lb, np.int32)
        bsz, n = a.shape
        out = np.zeros(bsz, np.float64)
        cdll.dtw_batch(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            la.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            bsz,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out

    _lib = dtw_batch_native
    return _lib
