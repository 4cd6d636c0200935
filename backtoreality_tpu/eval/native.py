"""ctypes bridge to the native host-geometry library.

Builds `native/libbtr_native.so` on first use if a C++ toolchain is
available; falls back to the numpy implementations otherwise. The
native pairwise IoU accelerates VOC AP matching (the reference's
host-side hot loop, mitigated there with a Pool(10)).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libbtr_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = _NATIVE_DIR / "btr_native.cpp"
    stale = (_LIB_PATH.exists() and src.exists()
             and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)
    if not _LIB_PATH.exists() or stale:
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "-B"],
                           check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            if not _LIB_PATH.exists():
                return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.box3d_iou_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.box3d_iou_matrix.restype = None
    lib.box3d_iou_single.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.box3d_iou_single.restype = ctypes.c_double
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def box3d_iou_matrix(corners1: np.ndarray, corners2: np.ndarray
                     ) -> np.ndarray | None:
    """(n, 8, 3) x (m, 8, 3) -> (n, m) 3D IoU, or None if no native lib."""
    lib = _load()
    if lib is None:
        return None
    c1 = np.ascontiguousarray(corners1, dtype=np.float64)
    c2 = np.ascontiguousarray(corners2, dtype=np.float64)
    n, m = len(c1), len(c2)
    out = np.empty((n, m), dtype=np.float64)
    lib.box3d_iou_matrix(
        c1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        c2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
