"""ACM volume-overlap element remap (nn-interpolation.cxx:16-326).

Element fields cross a remesh in two stages.  Every new element first
copies the field of the OLD element whose centroid is nearest
(find_nearest_neighbor, nn-interpolation.cxx:16-75).  Then every "changed"
element — one whose centroid moved (dist^2 >= 1e-15) — gets the
"approximate conservative mapping": a lattice of barycentric sample points
is generated inside the new element (10x11 in 2D, 10x11x10 in 3D, 20 /
20x21 for surface facets, nn-interpolation.cxx:91-158), each point is
located in the old mesh (kNN candidates walked nearest-first with the
barycentric containment test, tolerance -1e-8), and the per-old-element
hit counts become volume-overlap weights (capped at the 32
first-encountered donor elements, nn-interpolation.cxx:240-326).

Special cases mirror the reference exactly: zero located samples (new
material) or a single donor keep the plain nearest-centroid copy
(is_changed = -1, nn-interpolation.cxx:295-312).

Host-side numpy: remeshing is a rare host event (SURVEY §3.4); the sample
location is vectorized over (changed x sample x candidate) blocks instead
of the reference's per-element OpenMP loops.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from .barycentric import ETA_TOL

EPS = 1e-15
MAX_DONORS = 32


def _sample_etas(ndims: int, is_surface: bool) -> np.ndarray:
    """Barycentric sample lattice (nn-interpolation.cxx:91-158).
    Returns (nsample, npe) with npe = cell node count."""
    neta0 = 20 if is_surface else 10
    neta1 = neta0 + 1  # offset lattice prevents points on element edges
    neta2 = neta0
    out = []
    if is_surface:
        if ndims == 3:
            for i in range(neta0):
                for j in range(neta1):
                    e0 = (i + 0.5) / neta0
                    e1 = (j + 0.5) / neta1
                    e2 = 1.0 - e0 - e1
                    if e2 < EPS:
                        continue
                    out.append((e0, e1, e2))
        else:
            for i in range(neta0):
                e0 = (i + 0.5) / neta0
                e1 = 1.0 - e0
                if e1 < EPS:
                    continue
                out.append((e0, e1))
    else:
        if ndims == 3:
            for i in range(neta0):
                for j in range(neta1):
                    for k in range(neta2):
                        e0 = (i + 0.5) / neta0
                        e1 = (j + 0.5) / neta1
                        e2 = (k + 0.5) / neta2
                        e3 = 1.0 - e0 - e1 - e2
                        if e3 < EPS:
                            continue
                        out.append((e0, e1, e2, e3))
        else:
            for i in range(neta0):
                for j in range(neta1):
                    e0 = (i + 0.5) / neta0
                    e1 = (j + 0.5) / neta1
                    e2 = 1.0 - e0 - e1
                    if e2 < EPS:
                        continue
                    out.append((e0, e1, e2))
    return np.asarray(out, dtype=np.float64)


def _bary_eta(coord_p: np.ndarray, conn: np.ndarray, elems: np.ndarray,
              points: np.ndarray) -> np.ndarray:
    """Barycentric coords of points in (possibly projected) cells; works
    for volume elements and for surface facets in the projected
    (ndims-1)-space (Barycentric_transformation is_surface=true)."""
    nc = coord_p.shape[1]
    verts = coord_p[conn[elems]]                       # (n, nc+1, nc)
    a = verts[:, :nc, :] - verts[:, nc:nc + 1, :]
    rhs = points - verts[:, nc, :]
    eta = np.linalg.solve(np.swapaxes(a, 1, 2), rhs[..., None])[..., 0]
    last = 1.0 - eta.sum(axis=1, keepdims=True)
    return np.concatenate([eta, last], axis=1)


class ACMRemap:
    """Precomputed old->new element mapping for one remesh event."""

    def __init__(self, old_coord, old_conn, new_coord, new_conn,
                 is_surface: bool = False, block: int = 200000):
        ndims = old_coord.shape[1]
        ncomp = ndims - 1 if is_surface else ndims
        oc = np.asarray(old_coord, dtype=np.float64)[:, :ncomp]
        nc_ = np.asarray(new_coord, dtype=np.float64)[:, :ncomp]
        old_conn = np.asarray(old_conn)
        new_conn = np.asarray(new_conn)
        n_old = old_conn.shape[0]
        n_new = new_conn.shape[0]

        old_cent = oc[old_conn].mean(axis=1)
        new_cent = nc_[new_conn].mean(axis=1)
        tree = cKDTree(old_cent)
        d, nn = tree.query(new_cent)
        self.nn = nn.astype(np.int64)
        # is_changed: centroid moved (nn-interpolation.cxx:58-61)
        self.is_changed = np.where(d * d < EPS, 0, 1).astype(np.int64)
        changed = np.flatnonzero(self.is_changed)

        etas = _sample_etas(ndims, is_surface)
        nsample = etas.shape[0]
        k = min(MAX_DONORS, n_old)

        self.donors = np.full((n_new, MAX_DONORS), -1, dtype=np.int64)
        self.ratios = np.zeros((n_new, MAX_DONORS), dtype=np.float64)
        self.empty = np.zeros(n_new, dtype=np.float64)
        if changed.size == 0:
            return

        # precompute old-cell inverse transposed edge matrices once
        nc = ncomp
        verts = oc[old_conn]                           # (n_old, nc+1, nc)
        amat = np.swapaxes(verts[:, :nc, :] - verts[:, nc:nc + 1, :], 1, 2)
        ainv = np.linalg.inv(amat)                     # (n_old, nc, nc)
        base = verts[:, nc, :]                         # (n_old, nc)

        for b0 in range(0, changed.size, max(1, block // nsample)):
            rows = changed[b0:b0 + max(1, block // nsample)]
            # physical sample points in the new cells
            pv = nc_[new_conn[rows]]                   # (R, npe, nc)
            pts = np.einsum("sk,rkd->rsd", etas, pv)   # (R, nsample, nc)
            flat = pts.reshape(-1, nc)
            _, cand = tree.query(flat, k=k)            # sorted by distance
            if k == 1:
                cand = cand[:, None]
            # first candidate (nearest-first) containing each point
            chosen = np.full(flat.shape[0], -1, dtype=np.int64)
            todo = np.arange(flat.shape[0])
            for j in range(k):
                if todo.size == 0:
                    break
                ce = cand[todo, j]
                rhs = flat[todo] - base[ce]
                eta = np.einsum("nij,nj->ni", ainv[ce], rhs)
                last = 1.0 - eta.sum(axis=1, keepdims=True)
                full = np.concatenate([eta, last], axis=1)
                inside = (full >= ETA_TOL).all(axis=1)
                chosen[todo[inside]] = ce[inside]
                todo = todo[~inside]
            chosen = chosen.reshape(rows.size, nsample)

            for ri, e in zip(range(rows.size), rows):
                row = chosen[ri]
                # first-appearance donor order with the 32-donor cap
                # (nn-interpolation.cxx:240-276)
                keys: list[int] = []
                counts: dict[int, int] = {}
                for oe in row:
                    if oe < 0:
                        continue
                    if oe in counts:
                        counts[oe] += 1
                    elif len(keys) < MAX_DONORS:
                        keys.append(int(oe))
                        counts[int(oe)] = 1
                total = sum(counts.values())
                self.empty[e] = (nsample - total) / nsample
                if total == 0 or len(keys) == 1:
                    # keep the nearest-centroid copy
                    # (nn-interpolation.cxx:295-312)
                    self.is_changed[e] = -1
                    continue
                inv = 1.0 / total
                for jj, oe in enumerate(keys):
                    self.donors[e, jj] = oe
                    self.ratios[e, jj] = counts[oe] * inv

    def inject(self, source: np.ndarray) -> np.ndarray:
        """Remap one element field (inject_field,
        nn-interpolation.cxx:437-536): nearest copy everywhere, donor-
        weighted sum on changed elements."""
        src = np.asarray(source, dtype=np.float64)
        target = src[self.nn].copy()
        ch = self.is_changed > 0
        if ch.any():
            d = self.donors[ch]                        # (m, 32)
            r = self.ratios[ch]
            vals = src[np.where(d >= 0, d, 0)]         # (m, 32, ...)
            w = np.where(d >= 0, r, 0.0)
            if src.ndim == 1:
                target[ch] = (w * vals).sum(axis=1)
            else:
                target[ch] = (w[..., None] * vals).sum(axis=1)
        return target
