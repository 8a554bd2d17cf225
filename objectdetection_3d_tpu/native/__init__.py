"""Native C++ host preprocessing, loaded via ctypes.

Compiles ``preprocess.cpp`` into a shared library on first use (g++ is part
of the toolchain); callers fall back to the numpy path when compilation or
loading fails, so the native layer is an accelerator, never a requirement.
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB = os.path.join(_HERE, "libodpreprocess.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Return the loaded ctypes library or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.preprocess_cloud.restype = ctypes.c_int64
            lib.preprocess_cloud.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain issues
            log.warning("native preprocess unavailable (%s); "
                        "falling back to numpy", e)
            _lib = None
        return _lib


def available():
    return load() is not None


def preprocess_cloud(points, input_features, point_cloud_range,
                     sigma_mult=5.0, max_points=None):
    """Fused outlier-reject + range-crop + column-select.

    Semantics match the numpy path in
    ``PointPillars.preprocess`` (detector.py): drop points with centroid
    distance >= mean + sigma_mult * std, keep xyz inside
    [range_min, range_max), then select ``input_features`` columns.

    Args:
        points: (N, C) float32 array (contiguous).
        input_features: column indices to keep.
        point_cloud_range: 6-tuple (x0, y0, z0, x1, y1, z1).
        max_points: output cap (defaults to N).
    Returns:
        (M, len(input_features)) float32 array, or None if the native
        library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n, c = pts.shape
    if max_points is None:
        max_points = n
    sel = np.ascontiguousarray(input_features, np.int64)
    rmin = np.ascontiguousarray(point_cloud_range[:3], np.float32)
    rmax = np.ascontiguousarray(point_cloud_range[3:], np.float32)
    out = np.empty((max_points, len(sel)), np.float32)

    fptr = ctypes.POINTER(ctypes.c_float)
    iptr = ctypes.POINTER(ctypes.c_int64)
    written = lib.preprocess_cloud(
        pts.ctypes.data_as(fptr), n, c,
        sel.ctypes.data_as(iptr), len(sel),
        rmin.ctypes.data_as(fptr), rmax.ctypes.data_as(fptr),
        ctypes.c_float(sigma_mult),
        out.ctypes.data_as(fptr), max_points)
    return out[:written]
