"""ctypes binding for the native host runtime (libghicp_native.so).

Builds on demand with the in-tree Makefile; every entry point has a pure
numpy fallback so the package works without a compiler.  The native paths
matter for TLS-scale IO: multithreaded LAS decode and hash-map voxel dedup
of 100M+ point scans before anything touches the accelerator.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libghicp_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ghicp_las_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.ghicp_las_encode.argtypes = lib.ghicp_las_decode.argtypes
        lib.ghicp_voxel_mark.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_void_p]
        lib.ghicp_voxel_mark.restype = ctypes.c_int64
        lib.ghicp_transform_points.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.ghicp_txt_parse.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64]
        lib.ghicp_txt_parse.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def las_decode(raw: np.ndarray, n: int, record_len: int, scale: np.ndarray,
               offset: np.ndarray) -> np.ndarray:
    """Decode LAS point records to [n,3] float64 (native or numpy)."""
    lib = get_lib()
    if lib is not None:
        raw = np.ascontiguousarray(raw, np.uint8)
        out = np.empty((n, 3), np.float64)
        sc = np.ascontiguousarray(scale, np.float64)
        of = np.ascontiguousarray(offset, np.float64)
        lib.ghicp_las_decode(raw.ctypes.data, n, record_len,
                             sc.ctypes.data, of.ctypes.data, out.ctypes.data)
        return out
    rec = raw.reshape(n, record_len)
    xyz_i = rec[:, :12].copy().view("<i4").reshape(n, 3)
    return xyz_i.astype(np.float64) * scale + offset


def voxel_mark(xyz: np.ndarray, voxel: float) -> np.ndarray:
    """Boolean mask keeping the first point of each occupied voxel."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    lib = get_lib()
    if lib is not None:
        keep = np.empty(n, np.uint8)
        lib.ghicp_voxel_mark(xyz.ctypes.data, n, ctypes.c_float(voxel),
                             keep.ctypes.data)
        return keep.astype(bool)
    mn = xyz.min(axis=0) if n else np.zeros(3, np.float32)
    v = np.floor((xyz - mn) / voxel).astype(np.int64)
    key = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349663) ^ (v[:, 2] * 83492791)
    _, first = np.unique(key, return_index=True)
    keep = np.zeros(n, bool)
    keep[first] = True
    return keep


def txt_parse(data: bytes) -> Optional[np.ndarray]:
    """Parse whitespace-separated 'x y z [extras]' text to [n,3] float64.

    OpenMP-parallel strtod over newline-aligned chunks (the reference's
    readTxtFile getline loop, dataio.hpp:508-560, and np.loadtxt are both
    ~seconds per million lines).  Returns None when the native library is
    unavailable (callers fall back to numpy).
    """
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    max_pts = data.count(b"\n") + 1
    out = np.empty((max_pts, 3), np.float64)
    n = lib.ghicp_txt_parse(buf.ctypes.data, len(data), out.ctypes.data,
                            max_pts)
    return out[:n]


def transform_points(xyz: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Rigid-transform [n,3] float32 points (native in-place or numpy)."""
    lib = get_lib()
    out = np.ascontiguousarray(xyz, np.float32).copy()
    if lib is not None:
        Tc = np.ascontiguousarray(T, np.float32)
        lib.ghicp_transform_points(out.ctypes.data, len(out), Tc.ctypes.data)
        return out
    return xyz @ T[:3, :3].T + T[:3, 3]
