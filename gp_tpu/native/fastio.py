"""ctypes loader for the native text-matrix parser (fastio.cpp).

Builds ``libgpfastio.so`` on first use if g++ is available; falls back to
returning None (callers then use np.loadtxt).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastio.cpp")
_SO = os.path.join(_HERE, "libgpfastio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++11", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.gp_read_matrix.restype = ctypes.POINTER(ctypes.c_double)
            lib.gp_read_matrix.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.gp_free.restype = None
            lib.gp_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
            lib.gp_write_matrix.restype = ctypes.c_int
            lib.gp_write_matrix.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def read_matrix(path: str):
    """Parse a text matrix natively. Returns ndarray or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_long(0)
    cols = ctypes.c_long(0)
    ptr = lib.gp_read_matrix(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if not ptr:
        return None
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
        return arr.reshape(rows.value, cols.value)
    finally:
        lib.gp_free(ptr)


def write_matrix(path: str, m, digits: int = 17) -> bool:
    """Write a text matrix natively. Returns False if unavailable/failed."""
    lib = _load()
    if lib is None or not hasattr(lib, "gp_write_matrix"):
        return False
    m = np.ascontiguousarray(m, dtype=np.float64)
    if m.ndim == 1:
        m = m[:, None]
    ptr = m.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.gp_write_matrix(path.encode(), ptr, m.shape[0], m.shape[1],
                             digits)
    return rc == 0
