"""Native (C++) host-side geometry kernels with a ctypes binding.

The library is compiled on demand with g++ into a per-user cache directory
(first import only) and provides the kd-tree kNN + point-location fast path
used by remeshing and marker relocation — the counterpart of the
reference's nanoflann/knn-bvh native dependencies (knn.cxx).  When no
compiler is available, callers fall back to the scipy implementation
(mesh/locate.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build_lib() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "locate.cpp")
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.expanduser("~/.cache")),
        "dynearthsol_tpu")
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, "_native.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", src, "-o",
           out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    os.replace(out + ".tmp", out)
    return out


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DES_TPU_NO_NATIVE"):
        return None
    path = _build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_ip = ctypes.POINTER(ctypes.c_int32)
    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [c_dp, ctypes.c_int, ctypes.c_int]
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    lib.kdtree_query.argtypes = [ctypes.c_void_p, c_dp, ctypes.c_int,
                                 ctypes.c_int, c_ip, c_dp]
    lib.locate_points.argtypes = [
        c_dp, ctypes.c_int, c_ip, ctypes.c_int, ctypes.c_int, c_dp,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), c_dp,
        ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return _LIB


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def locate_points_native(coord: np.ndarray, conn: np.ndarray,
                         pts: np.ndarray, k: int, tol: float):
    """Native enclosing-element search.  Returns (elem, eta, found) or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    coord = np.ascontiguousarray(coord, dtype=np.float64)
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    n = pts.shape[0]
    npe = conn.shape[1]
    elem = np.empty(n, dtype=np.int64)
    eta = np.empty((n, npe), dtype=np.float64)
    found = np.empty(n, dtype=np.uint8)
    lib.locate_points(
        _ptr(coord, ctypes.c_double), coord.shape[0],
        _ptr(conn, ctypes.c_int32), conn.shape[0], coord.shape[1],
        _ptr(pts, ctypes.c_double), n, min(k, conn.shape[0]),
        ctypes.c_double(tol),
        elem.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _ptr(eta, ctypes.c_double),
        found.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return elem, eta, found.astype(bool)


class NativeKDTree:
    """kNN queries against a fixed point set (kd-tree, locate.cpp)."""

    def __init__(self, pts: np.ndarray):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._pts = np.ascontiguousarray(pts, dtype=np.float64)
        self._n, self._dim = self._pts.shape
        self._h = lib.kdtree_build(_ptr(self._pts, ctypes.c_double),
                                   self._n, self._dim)

    def query(self, q: np.ndarray, k: int = 1):
        q = np.ascontiguousarray(np.atleast_2d(q), dtype=np.float64)
        nq = q.shape[0]
        k = min(k, self._n)
        idx = np.empty((nq, k), dtype=np.int32)
        d2 = np.empty((nq, k), dtype=np.float64)
        self._lib.kdtree_query(self._h, _ptr(q, ctypes.c_double), nq, k,
                               _ptr(idx, ctypes.c_int32),
                               _ptr(d2, ctypes.c_double))
        return np.sqrt(d2), idx

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.kdtree_free(self._h)
            self._h = None
