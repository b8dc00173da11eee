"""ctypes loader for the C++ host kernels (native/libsatnerf_native.so).

Builds on demand with the in-tree Makefile when the shared object is missing
and a toolchain is present; callers fall back to vectorised numpy when native
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_FP = os.path.abspath(os.path.join(_NATIVE_DIR, "libsatnerf_native.so"))

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.isfile(_LIB_FP)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # always invoke make: its mtime rules make this a no-op on a fresh
    # build, and it rebuilds stale .so files from older checkouts that
    # would otherwise silently lack newer symbols (e.g. sn_lzw_decode)
    if not _build() and not os.path.isfile(_LIB_FP):
        return None
    try:
        lib = ctypes.CDLL(_LIB_FP)
    except OSError:
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    i64 = ctypes.c_int64

    lib.sn_downsample2x.argtypes = [dp, i64, i64, dp]
    lib.sn_mean_std.argtypes = [dp, dp, i64, i64, ctypes.c_int, ctypes.c_int, dp]
    lib.sn_mean_std.restype = i64
    lib.sn_ncc_search.argtypes = [
        dp, dp, i64, i64, ctypes.c_int, ctypes.c_int, ctypes.c_int, ip,
    ]
    lib.sn_apply_shift.argtypes = [
        dp, i64, i64, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double, dp,
    ]
    lib.sn_rasterize_mean.argtypes = [
        dp, i64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        i64, i64, ctypes.c_int, dp, dp,
    ]
    if hasattr(lib, "sn_lzw_decode"):  # absent in pre-LZW cached builds
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.sn_lzw_decode.argtypes = [u8p, i64, u8p, i64]
        lib.sn_lzw_decode.restype = i64
    _lib = lib
    return _lib


def as_double_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def as_int_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def as_u8_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
