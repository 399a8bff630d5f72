"""ctypes bindings for the native host-runtime kernels (native.cpp).

Compiled on first import with g++ -O3 into the package directory (cached
across runs); every entry point has a numpy fallback so the framework
works without a compiler.  The native paths replace the reference's
compiled host runtime: FCIDUMP record parsing (read_integrals,
chemistry.f90:538) and alias-table construction (setup_alias,
more_tools.f90:5603) - both are O(N) serial host work that bottlenecks
setup on large problems when done in interpreted Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_SO = os.path.join(_DIR, f"_native_{sys.implementation.cache_tag}.so")

_lib = None


def _build():
    # -march is selectable via SQMC_NATIVE_MARCH (default: portable
    # x86-64-v2 rather than -march=native, so a cached .so copied between
    # machines never carries illegal instructions)
    march = os.environ.get("SQMC_NATIVE_MARCH", "x86-64-v2")
    cmd = ["g++", "-O3", f"-march={march}", "-shared", "-fPIC", _SRC,
           "-o", _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                       os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.sqmc_parse_records.restype = ctypes.c_long
        lib.sqmc_parse_records.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long]
        lib.sqmc_build_alias.restype = None
        lib.sqmc_build_alias.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
        lib.sqmc_build_row_alias.restype = None
        lib.sqmc_build_row_alias.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def parse_records(text: bytes):
    """(vals [n], idx [n,4] int32) from 'value p q r s' records.
    Returns None if the native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    cap = max(len(text) // 10, 16)     # every record is >= 10 bytes
    vals = np.empty(cap, np.float64)
    idx = np.empty((cap, 4), np.int32)
    n = lib.sqmc_parse_records(text, len(text), _dptr(vals), _i32ptr(idx),
                               cap)
    return vals[:n].copy(), idx[:n].copy()


def build_alias(prob: np.ndarray):
    """Vose alias tables (J, q) for one normalized distribution; None if
    unavailable."""
    lib = _load()
    if not lib:
        return None
    prob = np.ascontiguousarray(prob, np.float64)
    k = len(prob)
    J = np.empty(k, np.int32)
    q = np.empty(k, np.float64)
    lib.sqmc_build_alias(_dptr(prob), k, _i32ptr(J), _dptr(q))
    return J, q


def build_row_alias(vals: np.ndarray, starts: np.ndarray,
                    counts: np.ndarray):
    """Ragged per-row alias tables over |vals|; None if unavailable."""
    lib = _load()
    if not lib:
        return None
    vals = np.ascontiguousarray(vals, np.float64)
    starts = np.ascontiguousarray(starts, np.int64)
    counts = np.ascontiguousarray(counts, np.int64)
    J = np.zeros(len(vals), np.int32)
    q = np.ones(len(vals), np.float64)
    lib.sqmc_build_row_alias(_dptr(vals), _i64ptr(starts), _i64ptr(counts),
                             len(starts), _i32ptr(J), _dptr(q))
    return J, q
