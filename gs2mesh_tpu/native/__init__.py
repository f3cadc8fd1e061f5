"""Native (C++) host-runtime kernels with transparent numpy fallbacks.

The TPU compute path is JAX/Pallas; this module covers the CPU-bound
plumbing the reference implements natively (Open3D's C++ mesh ops, the
DTUeval sklearn KD-trees): greedy radius downsampling, triangle
connected-component clustering, and grid-bounded NN distances.

The shared library is compiled from src/geom_ops.cpp with g++ on first use
and cached next to the source; if no compiler is available every entry
point transparently falls back to the pure-Python implementation, so the
package works (slower) everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "geom_ops.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_geom_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"[gs2mesh_tpu.native] build failed ({e}); "
              "using Python fallbacks")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH
        if not (os.path.exists(path)
                and os.path.getmtime(path) >= os.path.getmtime(_SRC)):
            path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_f64p = ctypes.POINTER(ctypes.c_double)
        lib.greedy_radius_downsample.argtypes = [
            c_f32p, ctypes.c_int64, ctypes.c_float, c_u8p]
        lib.greedy_radius_downsample.restype = None
        lib.triangle_clusters.argtypes = [
            c_i32p, ctypes.c_int64, ctypes.c_int64, c_i64p, c_i64p]
        lib.triangle_clusters.restype = ctypes.c_int64
        lib.nn_sq_distances_grid.argtypes = [
            c_f32p, ctypes.c_int64, c_f32p, ctypes.c_int64, ctypes.c_float,
            c_f64p]
        lib.nn_sq_distances_grid.restype = None
        _lib = lib
        return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def available() -> bool:
    return get_lib() is not None


def greedy_radius_downsample_mask(points: np.ndarray,
                                  radius: float) -> Optional[np.ndarray]:
    """(N, 3) points (in desired greedy order) -> keep mask, or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    mask = np.empty(len(pts), np.uint8)
    lib.greedy_radius_downsample(_ptr(pts, ctypes.c_float), len(pts),
                                 ctypes.c_float(radius),
                                 _ptr(mask, ctypes.c_uint8))
    return mask.astype(bool)


def triangle_clusters(faces: np.ndarray, num_vertices: int):
    """Union-find clustering. Returns (labels (F,), counts (n_clusters,))
    or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f = np.ascontiguousarray(faces, np.int32)
    labels = np.zeros(len(f), np.int64)
    counts = np.zeros(max(len(f), 1), np.int64)
    n = lib.triangle_clusters(_ptr(f, ctypes.c_int32), len(f),
                              num_vertices, _ptr(labels, ctypes.c_int64),
                              _ptr(counts, ctypes.c_int64))
    return labels, counts[:n]


def nn_sq_distances_grid(ref: np.ndarray, query: np.ndarray,
                         radius: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    r = np.ascontiguousarray(ref, np.float32)
    q = np.ascontiguousarray(query, np.float32)
    out = np.empty(len(q), np.float64)
    lib.nn_sq_distances_grid(_ptr(r, ctypes.c_float), len(r),
                             _ptr(q, ctypes.c_float), len(q),
                             ctypes.c_float(radius),
                             _ptr(out, ctypes.c_double))
    return out
