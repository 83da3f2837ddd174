"""ctypes bindings for the native host-ingest library (ingest.cpp).

Builds the shared object on first import (g++ -O3; cached next to the
source).  Every entry point has a pure-numpy fallback, so the package works
even without a toolchain — the native path is the production one.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "ingest.cpp")
_SO = os.path.join(_HERE, "_ingest.so")

_lib = None


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception as e:  # toolchain missing / build failure → fallback
        sys.stderr.write(f"limovelo_tpu.native: build failed ({e}); using numpy fallback\n")
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if _build():
        lib = ctypes.CDLL(_SO)
        lib.pc2_extract_field.restype = ctypes.c_int
        lib.pc2_extract_field_f64.restype = ctypes.c_int
        lib.process_scan.restype = ctypes.c_int64
        if hasattr(lib, "process_scan_idx"):
            lib.process_scan_idx.restype = ctypes.c_int64
        lib.time_window.restype = None
        lib.stage_window.restype = None
        _lib = lib
    else:
        _lib = False
    return _lib


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def process_scan(xyz: np.ndarray, t: np.ndarray, downsample_rate: int, min_dist: float,
                 intensity: np.ndarray | None = None):
    """Fused temporal-downsample + min-range filter + time sort.

    With `intensity` (N,), the per-point channel rides along (the reference
    Point carries intensity end to end, Point.cpp:172-175) and a 3-tuple is
    returned."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    t = np.ascontiguousarray(t, np.float64)
    n = len(xyz)
    lib = get_lib()
    if lib and intensity is None:
        xyz_out = np.empty_like(xyz)
        t_out = np.empty_like(t)
        m = lib.process_scan(
            _ptr(xyz, ctypes.c_float), _ptr(t, ctypes.c_double),
            ctypes.c_int64(n), ctypes.c_int32(downsample_rate),
            ctypes.c_double(min_dist),
            _ptr(xyz_out, ctypes.c_float), _ptr(t_out, ctypes.c_double),
        )
        return xyz_out[:m].copy(), t_out[:m].copy()
    if lib and hasattr(lib, "process_scan_idx"):
        xyz_out = np.empty_like(xyz)
        t_out = np.empty_like(t)
        idx_out = np.empty(n, np.int64)
        m = lib.process_scan_idx(
            _ptr(xyz, ctypes.c_float), _ptr(t, ctypes.c_double),
            ctypes.c_int64(n), ctypes.c_int32(downsample_rate),
            ctypes.c_double(min_dist),
            _ptr(xyz_out, ctypes.c_float), _ptr(t_out, ctypes.c_double),
            _ptr(idx_out, ctypes.c_int64),
        )
        inten = np.ascontiguousarray(intensity, np.float32)[idx_out[:m]].copy()
        return xyz_out[:m].copy(), t_out[:m].copy(), inten
    # numpy fallback (identical semantics)
    counter = np.arange(1, n + 1)
    keep = np.ones(n, bool) if downsample_rate <= 1 else (counter % downsample_rate) == 0
    keep &= np.isfinite(xyz).all(axis=1)
    keep &= (xyz.astype(np.float64) ** 2).sum(1) > min_dist * min_dist
    idx = np.nonzero(keep)[0]
    order = idx[np.argsort(t[idx], kind="stable")]
    if intensity is None:
        return xyz[order], t[order]
    return xyz[order], t[order], np.asarray(intensity, np.float32)[order]


def extract_field(data: bytes, n: int, point_step: int, offset: int, datatype: int,
                  f64: bool = False) -> np.ndarray:
    """Decode one PointCloud2 field from the raw byte blob."""
    buf = np.frombuffer(data, np.uint8)
    lib = get_lib()
    if lib:
        out = np.empty(n, np.float64 if f64 else np.float32)
        fn = lib.pc2_extract_field_f64 if f64 else lib.pc2_extract_field
        rc = fn(
            _ptr(buf, ctypes.c_uint8), ctypes.c_int64(n),
            ctypes.c_int32(point_step), ctypes.c_int32(offset),
            ctypes.c_int32(datatype),
            _ptr(out, ctypes.c_double if f64 else ctypes.c_float),
        )
        if rc == 0:
            return out
    # numpy fallback
    from ..io.rosbag import _PF_DTYPES

    dt = _PF_DTYPES[datatype]
    nbytes = np.dtype(dt).itemsize
    col = buf[: n * point_step].reshape(n, point_step)[:, offset : offset + nbytes]
    return col.copy().view(dt).reshape(n).astype(np.float64 if f64 else np.float32)
