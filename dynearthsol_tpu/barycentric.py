"""Barycentric transforms between physical and reference coordinates.

Reference: barycentric-fn.cxx (Barycentric_transformation).  The reference
precomputes per-element affine coefficients via Cramer solves
(barycentric-fn.cxx:221-292) and tests containment with tolerance -1e-8
(barycentric-fn.cxx:135-206).  Here the same math is vectorized numpy; these
run on host (marker init, remap) — rare events relative to the device step
loop.
"""

from __future__ import annotations

import numpy as np

# containment tolerance (barycentric-fn.cxx:44 uses -1e-8)
ETA_TOL = -1e-8


def bary_coords(coord: np.ndarray, conn: np.ndarray, elem: np.ndarray,
                points: np.ndarray) -> np.ndarray:
    """Barycentric coordinates of `points` (n, ndims) within elements
    `elem` (n,) of the mesh.  Returns (n, ndims+1); the first ndims entries
    are solved, the last is 1 - sum (matching eta storage order of
    markerset.cxx:100-113)."""
    ndims = coord.shape[1]
    verts = coord[conn[elem]]                    # (n, npe, ndims)
    a = verts[:, :ndims, :] - verts[:, ndims:ndims + 1, :]  # (n,ndims,ndims)
    rhs = points - verts[:, ndims, :]            # (n, ndims)
    # solve a^T eta = rhs  (x = sum eta_i v_i with eta_last = 1 - sum)
    eta = np.linalg.solve(np.swapaxes(a, 1, 2), rhs[..., None])[..., 0]
    last = 1.0 - eta.sum(axis=1, keepdims=True)
    return np.concatenate([eta, last], axis=1)


def bary_to_coord(coord: np.ndarray, conn: np.ndarray, elem: np.ndarray,
                  eta: np.ndarray) -> np.ndarray:
    """Physical coordinates from barycentric eta (n, npe)."""
    verts = coord[conn[elem]]                    # (n, npe, ndims)
    return np.einsum("nk,nkd->nd", eta, verts)


def is_inside(eta: np.ndarray, tol: float = ETA_TOL) -> np.ndarray:
    """Containment test with the reference tolerance
    (barycentric-fn.cxx:135-206)."""
    return (eta >= tol).all(axis=1)


def random_barycentric(n: int, npe: int, rng: np.random.Generator
                       ) -> np.ndarray:
    """Uniform random points in the reference simplex: sorted-uniform
    spacings (equivalent to a flat Dirichlet), cf. markerset.cxx:510-560
    random marker placement."""
    u = np.sort(rng.random((n, npe - 1)), axis=1)
    zeros = np.zeros((n, 1))
    ones = np.ones((n, 1))
    return np.diff(np.concatenate([zeros, u, ones], axis=1), axis=1)
