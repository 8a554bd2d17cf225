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
_FEAT_SRC = os.path.join(_HERE, "featurize.cpp")
_FEAT_LIB = os.path.join(_HERE, "libodfeaturize.so")

_lock = threading.Lock()
_lib = None
_tried = False
_feat_lib = None
_feat_tried = False


def _build(src=_SRC, lib=_LIB):
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", lib]
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


def load_featurize():
    """Return the loaded featurizer library or None when unavailable."""
    global _feat_lib, _feat_tried
    with _lock:
        if _feat_lib is not None or _feat_tried:
            return _feat_lib
        _feat_tried = True
        try:
            if (not os.path.exists(_FEAT_LIB)
                    or os.path.getmtime(_FEAT_LIB)
                    < os.path.getmtime(_FEAT_SRC)):
                _build(_FEAT_SRC, _FEAT_LIB)
            lib = ctypes.CDLL(_FEAT_LIB)
            dptr = ctypes.POINTER(ctypes.c_double)
            lib.featurize_cloud.restype = ctypes.c_int64
            lib.featurize_cloud.argtypes = [
                dptr, ctypes.c_int64,
                ctypes.c_double, ctypes.c_int64,
                ctypes.c_double, ctypes.c_int64,
                dptr, dptr, dptr,
            ]
            _feat_lib = lib
        except Exception as e:  # pragma: no cover - toolchain issues
            log.warning("native featurizer unavailable (%s); "
                        "falling back to numpy", e)
            _feat_lib = None
        return _feat_lib


def featurize_available():
    return load_featurize() is not None


def featurize_cloud(points, normal_rad, normal_max_nn, fpfh_rad,
                    fpfh_max_nn, normals=None):
    """Normals + FPFH-33 of one cloud via the native library.

    Semantics match the numpy fallback in
    ``models/preprocess_tools.py`` (``estimate_normals`` +
    ``compute_fpfh``): radius-bounded kNN neighborhoods (k nearest with
    distance <= radius, self-inclusive), PCA normals flipped to z >= 0,
    simplified-PFH 11-bin histograms of the Darboux angles and the
    distance-weighted FPFH combine.  Reference delegates this to open3d
    (model/utils.py:73-90).

    Args:
        points: (N, >=3) array; xyz columns are used.
        normals: optional (N, 3) precomputed normals (skips estimation).
    Returns:
        (normals, fpfh): (N, 3) and (N, 33) float64 arrays, or None if
        the native library is unavailable or declines the cloud.
    """
    lib = load_featurize()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(points[:, :3], np.float64)
    n = xyz.shape[0]
    normals_out = np.empty((n, 3), np.float64)
    fpfh_out = np.empty((n, 33), np.float64)
    dptr = ctypes.POINTER(ctypes.c_double)
    if normals is not None:
        normals = np.ascontiguousarray(normals, np.float64)
        nin = normals.ctypes.data_as(dptr)
    else:
        nin = None
    rc = lib.featurize_cloud(
        xyz.ctypes.data_as(dptr), n,
        ctypes.c_double(normal_rad), int(normal_max_nn),
        ctypes.c_double(fpfh_rad), int(fpfh_max_nn),
        nin, normals_out.ctypes.data_as(dptr),
        fpfh_out.ctypes.data_as(dptr))
    if rc != 0:
        log.warning("native featurizer declined the cloud (rc=%d); "
                    "falling back to numpy", rc)
        return None
    return normals_out, fpfh_out


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
