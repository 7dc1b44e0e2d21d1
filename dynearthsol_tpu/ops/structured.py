"""Structured-grid fast path: corner gather / nodal assembly as SLICES.

The flagship meshes (meshing_option 1/2 with meshing_elem_shape 1/2, cf.
mesh.cxx:120-744 regular & equilateral grid generators) are raster-ordered
regular grids: node id = i*nz + j, and each cell (i, j) holds two triangles
with the diagonal alternating on cell parity (generate.regular_grid_2d).

On TPU a random gather reaches only a few percent of HBM bandwidth (rows of
8-20 bytes waste the (8,128) lane tile), while shifted *slices* of a
(nx, nz, k) grid are full-bandwidth contiguous copies that XLA fuses into
their consumers.  So while the structured connectivity holds (i.e. until the
first remesh produces an unstructured mesh) the element<->node transfers run
as stencils:

  gather : nodal (nx*nz, k) -> corner slots (nelem, 3, k) via 4 shifted
           views + a checkerboard select for the alternating diagonal.
  scatter: the exact transpose -- per-cell-corner partial sums + 4 padded
           adds (static `.at[slice].add`, lowered to pad+add fusions).

Both are bit-identical in exact arithmetic to the conn-indexed forms; the
float sum order per node differs from the sorted-support gather (same
situation as the reference's OpenMP vs serial sum order).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def structured_conn_2d(nx: int, nz: int) -> np.ndarray:
    """Reconstruct the raster connectivity of generate.regular_grid_2d for
    an (nx, nz) node grid.  Used to VERIFY a mesh is stencil-compatible."""
    i, j = np.meshgrid(np.arange(nx - 1), np.arange(nz - 1), indexing="ij")
    n00 = i * nz + j
    n10 = (i + 1) * nz + j
    n01 = i * nz + (j + 1)
    n11 = (i + 1) * nz + (j + 1)
    even = (i + j) % 2 == 0
    t0 = np.stack([n00, n10, np.where(even, n11, n01)], axis=-1)
    t1 = np.stack([np.where(even, n00, n10), n11, n01], axis=-1)
    conn = np.stack([t0, t1], axis=2)  # (nx-1, nz-1, 2, 3)
    return conn.reshape(-1, 3).astype(np.int32)


def detect_structured_2d(conn: np.ndarray, nnode: int) -> tuple | None:
    """Return (nx, nz) if ``conn`` is exactly the raster structured pattern
    (any orientation fix or reordering disables the fast path)."""
    nelem = conn.shape[0]
    if conn.shape[1] != 3 or nelem % 2:
        return None
    ncell = nelem // 2
    # node raster nid = i*nz + j: nz = (node1 - node0) of the first cell's
    # vertical neighbour; infer from nnode = nx*nz and ncell = (nx-1)(nz-1)
    for nz in range(2, nnode):
        if nnode % nz:
            continue
        nx = nnode // nz
        if (nx - 1) * (nz - 1) == ncell:
            if np.array_equal(conn, structured_conn_2d(nx, nz)):
                return (nx, nz)
    return None


import functools


@functools.lru_cache(maxsize=None)
def _parity_np(nx: int, nz: int):
    # host-side checkerboard, embedded as an XLA constant: computing
    # (i+j)%2 on-device lowers to thousands of emulated-rem shift ops
    i = np.arange(nx - 1)[:, None]
    j = np.arange(nz - 1)[None, :]
    return (i + j) % 2 == 0  # (nx-1, nz-1) bool


def _parity(nx: int, nz: int):
    # NOTE: only the numpy array is cached — caching the jnp.asarray
    # result would capture a tracer when first called under a jit trace
    return jnp.asarray(_parity_np(nx, nz))


def gather_corners_2d(nodal: jnp.ndarray, nx: int, nz: int) -> jnp.ndarray:
    """Nodal (nnode,) or (nnode, k) -> corner slots (nelem, 3[, k])."""
    from .fastidx import fast_reshape
    squeeze = nodal.ndim == 1
    v = nodal[:, None] if squeeze else nodal
    k = v.shape[1]
    g = fast_reshape(v, nx, nz, k)
    c00 = g[:-1, :-1]
    c10 = g[1:, :-1]
    c01 = g[:-1, 1:]
    c11 = g[1:, 1:]
    P = _parity(nx, nz)[..., None]
    t0 = jnp.stack([c00, c10, jnp.where(P, c11, c01)], axis=2)
    t1 = jnp.stack([jnp.where(P, c00, c10), c11, c01], axis=2)
    out = jnp.stack([t0, t1], axis=2)  # (nx-1, nz-1, 2, 3, k)
    out = fast_reshape(out, (nx - 1) * (nz - 1) * 2, 3, k)
    return out[..., 0] if squeeze else out


def scatter_corners_2d(contrib: jnp.ndarray, nx: int, nz: int
                       ) -> jnp.ndarray:
    """Transpose of gather_corners_2d: (nelem, 3[, k]) -> nodal sums
    (nnode[, k])."""
    from .fastidx import fast_reshape
    squeeze = contrib.ndim == 2
    c = contrib[..., None] if squeeze else contrib
    k = c.shape[2]
    c = fast_reshape(c, nx - 1, nz - 1, 2, 3, k)
    t0, t1 = c[:, :, 0], c[:, :, 1]
    P = _parity(nx, nz)[..., None]
    zero = jnp.zeros((), dtype=c.dtype)
    a00 = t0[:, :, 0] + jnp.where(P, t1[:, :, 0], zero)
    a10 = t0[:, :, 1] + jnp.where(P, zero, t1[:, :, 0])
    a11 = jnp.where(P, t0[:, :, 2], zero) + t1[:, :, 1]
    a01 = jnp.where(P, zero, t0[:, :, 2]) + t1[:, :, 2]
    out = jnp.zeros((nx, nz, k), dtype=c.dtype)
    out = (out.at[:-1, :-1].add(a00).at[1:, :-1].add(a10)
              .at[1:, 1:].add(a11).at[:-1, 1:].add(a01))
    out = fast_reshape(out, nx * nz, k)
    return out[:, 0] if squeeze else out


import functools


@functools.lru_cache(maxsize=None)
def tet_tables():
    """Post-orientation slot->cell-corner tables for the two parities of
    the 5-tet cell decomposition (generate.regular_grid_3d + _orient_3d).
    Cell corner id = a*4 + b*2 + d for offsets (a, b, d) in x/y/z.
    Returns (even_table, odd_table), each a tuple of 5 4-tuples."""
    corners = np.array([[a, b, d] for a in (0, 1) for b in (0, 1)
                        for d in (0, 1)], dtype=float)
    even = [(0, 1, 2, 4), (1, 2, 3, 7), (1, 4, 5, 7), (2, 4, 6, 7),
            (1, 2, 4, 7)]
    odd = [(0, 1, 3, 5), (0, 2, 3, 6), (0, 4, 5, 6), (3, 5, 6, 7),
           (0, 3, 5, 6)]
    out = []
    for tets in (even, odd):
        tt = []
        for t in tets:
            t = list(t)
            d1 = corners[t[1]] - corners[t[0]]
            d2 = corners[t[2]] - corners[t[0]]
            d3 = corners[t[3]] - corners[t[0]]
            if np.dot(d1, np.cross(d2, d3)) < 0:
                t[2], t[3] = t[3], t[2]
            tt.append(tuple(t))
        out.append(tuple(tt))
    return tuple(out)


def structured_conn_3d(nx: int, ny: int, nz: int) -> np.ndarray:
    """Reconstruct the raster connectivity of generate.regular_grid_3d
    (after orientation) for an (nx, ny, nz) node grid."""
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    i, j, k = np.meshgrid(np.arange(nxc), np.arange(nyc), np.arange(nzc),
                          indexing="ij")
    cn = np.stack([((i + a) * ny + (j + b)) * nz + (k + d)
                   for a in (0, 1) for b in (0, 1) for d in (0, 1)])
    P = (i + j + k) % 2 == 0
    even_t, odd_t = tet_tables()
    conn = np.empty((nxc, nyc, nzc, 5, 4), dtype=np.int32)
    for t in range(5):
        for s in range(4):
            conn[..., t, s] = np.where(P, cn[even_t[t][s]],
                                       cn[odd_t[t][s]])
    return conn.reshape(-1, 4)


def detect_structured_3d(conn: np.ndarray, nnode: int) -> tuple | None:
    """Return (nx, ny, nz) if ``conn`` is exactly the raster 5-tet
    structured pattern, else None."""
    nelem = conn.shape[0]
    if conn.shape[1] != 4 or nelem % 5:
        return None
    ncell = nelem // 5
    for nx in range(2, int(nnode ** (1 / 3)) + 2):
        if nnode % nx:
            continue
        rem = nnode // nx
        for ny in range(2, rem):
            if rem % ny:
                continue
            nz = rem // ny
            for dims in {(nx, ny, nz), (ny, nz, nx), (nz, nx, ny),
                         (nx, nz, ny), (ny, nx, nz), (nz, ny, nx)}:
                a, b, c = dims
                if (a - 1) * (b - 1) * (c - 1) != ncell:
                    continue
                if np.array_equal(conn, structured_conn_3d(a, b, c)):
                    return dims
    return None


def make_corner_gather(ctx):
    """Closure nodal -> (nelem, npe[, k]) corner slots for a StepCtx:
    stencil when the mesh is structured, index gather otherwise."""
    if ctx.sgrid is not None and len(ctx.sgrid) == 2 and ctx.axis is None:
        nx, nz = ctx.sgrid
        return lambda nodal: gather_corners_2d(nodal, nx, nz)
    from .fastidx import take_rows
    return lambda nodal: take_rows(nodal, ctx.conn)
