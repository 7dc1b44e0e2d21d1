"""Host-side point location: find the mesh element enclosing each query
point.

Reference: the enclosing-element searches of brc-interpolation.cxx:101-322
(kNN seed -> support walk -> neighbor-of-neighbor -> outside-domain clamp)
and markerset.cxx:1004-1145 (marker containment via kNN + barycentric).
Here: a cKDTree of element centroids seeds k candidates per point, candidates
are tested with vectorized barycentric containment, and leftover points fall
back to the nearest centroid with clamped barycentric coordinates (the
reference's outside-domain behavior).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from ..barycentric import ETA_TOL, bary_coords


class ElementLocator:
    """Locate points in a simplicial mesh.  Uses the native C++ kd-tree
    fast path (native/locate.cpp) when available; scipy otherwise."""

    def __init__(self, coord: np.ndarray, conn: np.ndarray):
        self.coord = np.ascontiguousarray(coord, dtype=np.float64)
        self.conn = np.ascontiguousarray(conn, dtype=np.int32)
        self.centroids = self.coord[self.conn].mean(axis=1)
        self._tree = None

    @property
    def tree(self):
        if self._tree is None:
            self._tree = cKDTree(self.centroids)
        return self._tree

    def locate(self, pts: np.ndarray, k: int = 32, tol: float = ETA_TOL):
        """Returns (elem, eta, found): enclosing element ids, barycentric
        coords, and whether containment succeeded (False -> nearest element
        with clamped eta)."""
        from ..native import locate_points_native

        out = locate_points_native(self.coord, self.conn, pts, k, tol)
        if out is not None:
            return out
        return self._locate_scipy(pts, k, tol)

    def _locate_scipy(self, pts: np.ndarray, k: int = 32,
                      tol: float = ETA_TOL):
        n = pts.shape[0]
        k = min(k, self.conn.shape[0])
        _, cand = self.tree.query(pts, k=k)
        cand = np.atleast_2d(cand)
        if k == 1:
            cand = cand.reshape(-1, 1)

        elem = np.full(n, -1, dtype=np.int64)
        eta = np.zeros((n, self.conn.shape[1]))
        todo = np.arange(n)
        for j in range(k):
            if todo.size == 0:
                break
            e_try = cand[todo, j]
            et = bary_coords(self.coord, self.conn, e_try, pts[todo])
            inside = (et >= tol).all(axis=1)
            hit = todo[inside]
            elem[hit] = e_try[inside]
            eta[hit] = et[inside]
            todo = todo[~inside]

        found = elem >= 0
        if todo.size:
            # outside-domain clamp (brc-interpolation.cxx:291-322)
            e_near = cand[todo, 0]
            et = bary_coords(self.coord, self.conn, e_near, pts[todo])
            et = np.clip(et, 0.0, None)
            et /= et.sum(axis=1, keepdims=True)
            elem[todo] = e_near
            eta[todo] = et
        return elem, eta, found
