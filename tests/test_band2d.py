"""Banded gather/assembly engine: equivalence to direct indexing and
node_sum (ops/band2d.py; see its docstring for the measured TPU gather
rates that motivate it)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynearthsol_tpu.ops import band2d
from dynearthsol_tpu.ops.assembly import node_sum


def _mesh(nx=37, nz=11):
    """Small structured tri mesh (same layout as mesh/generate)."""
    nnode = nx * nz
    nid = np.arange(nnode).reshape(nx, nz)
    conns = []
    for i in range(nx - 1):
        for j in range(nz - 1):
            n00, n01 = nid[i, j], nid[i, j + 1]
            n10, n11 = nid[i + 1, j], nid[i + 1, j + 1]
            conns.append([n00, n10, n01])
            conns.append([n10, n11, n01])
    return np.asarray(conns, np.int32), nnode


def _support(conn, nnode):
    npe = conn.shape[1]
    deg = np.zeros(nnode, np.int64)
    for c in range(npe):
        np.add.at(deg, conn[:, c], 1)
    maxd = int(deg.max())
    gidx = np.zeros((nnode, maxd), np.int64)
    gmask = np.zeros((nnode, maxd), bool)
    fill = np.zeros(nnode, np.int64)
    for e in range(conn.shape[0]):
        for c in range(npe):
            n = conn[e, c]
            gidx[n, fill[n]] = e * npe + c
            gmask[n, fill[n]] = True
            fill[n] += 1
    return jnp.asarray(gidx), jnp.asarray(gmask)


def test_band_gather_matches_direct():
    conn, nnode = _mesh()
    bt = band2d.build_band_tables(conn, nnode)
    assert bt is not None
    rng = np.random.default_rng(0)
    k = 5
    cols = [jnp.asarray(rng.standard_normal(nnode), jnp.float32)
            for _ in range(k)]
    npack8 = band2d.pack_nodal(cols, bt)
    got = band2d.gather_corners(npack8, bt, k)
    for c in range(3):
        for f in range(k):
            want = np.asarray(cols[f])[conn[:, c]]
            np.testing.assert_allclose(np.asarray(got[c][f]), want,
                                       rtol=0, atol=0)


def test_band_scatter_matches_node_sum():
    conn, nnode = _mesh()
    bt = band2d.build_band_tables(conn, nnode)
    rng = np.random.default_rng(1)
    k = 3
    nelem = conn.shape[0]
    slot_cols = [tuple(jnp.asarray(rng.standard_normal(nelem), jnp.float32)
                       for _ in range(k)) for _ in range(3)]
    got = band2d.scatter_corners(slot_cols, bt)
    contrib = jnp.stack(
        [jnp.stack([slot_cols[c][f] for f in range(k)], axis=1)
         for c in range(3)], axis=1)            # (nelem, npe, k)
    gidx, gmask = _support(conn, nnode)
    want = node_sum(contrib, gidx, gmask)       # (nnode, k)
    for f in range(k):
        np.testing.assert_allclose(np.asarray(got[f]),
                                   np.asarray(want[:, f]),
                                   rtol=2e-6, atol=2e-5)


def test_band_pack_roundtrip():
    conn, nnode = _mesh()
    bt = band2d.build_band_tables(conn, nnode)
    rng = np.random.default_rng(2)
    cols = [jnp.asarray(rng.standard_normal(nnode), jnp.float32)
            for _ in range(4)]
    back = band2d.unpack_nodal(band2d.pack_nodal(cols, bt), bt, 4)
    for f in range(4):
        np.testing.assert_array_equal(np.asarray(back[f]),
                                      np.asarray(cols[f]))


def test_band_infeasible_returns_none():
    # pathological numbering: element 0 touches node 0 and the last node
    conn, nnode = _mesh()
    conn = conn.copy()
    conn[0, 2] = nnode - 1
    assert band2d.build_band_tables(conn, nnode, w8_cap=16) is None


def test_band_pallas_kernels_match_reference(monkeypatch):
    """Pallas kernels (interpret mode on CPU) vs the jnp reference."""
    monkeypatch.setattr(band2d, "INTERPRET", True)
    conn, nnode = _mesh(61, 17)
    bt = band2d.build_band_tables(conn, nnode)
    rng = np.random.default_rng(3)
    k = 5
    cols = [jnp.asarray(rng.standard_normal(nnode), jnp.float32)
            for _ in range(k)]
    npack8 = band2d.pack_nodal(cols, bt)
    want = band2d.gather_corners(npack8, bt, k)
    got = band2d.gather_corners_tpu(npack8, bt, k)
    for c in range(3):
        for f in range(k):
            np.testing.assert_allclose(np.asarray(got[c][f]),
                                       np.asarray(want[c][f]),
                                       rtol=1e-6, atol=1e-6)

    nelem = conn.shape[0]
    slot_cols = [tuple(jnp.asarray(rng.standard_normal(nelem), jnp.float32)
                       for _ in range(3)) for _ in range(3)]
    want_s = band2d.scatter_corners(slot_cols, bt)
    got_s = band2d.scatter_corners_tpu(slot_cols, bt)
    for f in range(3):
        np.testing.assert_allclose(np.asarray(got_s[f]),
                                   np.asarray(want_s[f]),
                                   rtol=2e-6, atol=2e-5)


def test_band_fused_scatter_gather_matches_sequential():
    """scatter_gather_corners == scatter_corners + gather_corners."""
    conn, nnode = _mesh()
    bt = band2d.build_band_tables(conn, nnode)
    rng = np.random.default_rng(6)
    k, kg = 3, 2
    nelem = conn.shape[0]
    slot_cols = [tuple(jnp.asarray(rng.standard_normal(nelem), jnp.float32)
                       for _ in range(k)) for _ in range(3)]
    sums, gath = band2d.scatter_gather_corners(slot_cols, bt, kg)
    want_s = band2d.scatter_corners(slot_cols, bt)
    pack = band2d.pack_nodal(list(want_s[:kg]), bt)
    want_g = band2d.gather_corners(pack, bt, kg)
    for f in range(k):
        np.testing.assert_array_equal(np.asarray(sums[f]),
                                      np.asarray(want_s[f]))
    for c in range(3):
        for f in range(kg):
            np.testing.assert_array_equal(np.asarray(gath[c][f]),
                                          np.asarray(want_g[c][f]))


def test_band_fused_pallas_matches_reference(monkeypatch):
    """Fused Pallas assembly+regather (interpret mode) vs the jnp
    reference.  Small mesh: interpret-mode DMA emulation is slow."""
    monkeypatch.setattr(band2d, "INTERPRET", True)
    conn, nnode = _mesh(37, 11)
    bt = band2d.build_band_tables(conn, nnode)
    rng = np.random.default_rng(7)
    k, kg = 3, 2
    nelem = conn.shape[0]
    slot_cols = [tuple(jnp.asarray(rng.standard_normal(nelem), jnp.float32)
                       for _ in range(k)) for _ in range(3)]
    want_n, want_g = band2d.scatter_gather_corners(slot_cols, bt, kg)
    got_n, got_g = band2d.scatter_gather_corners_tpu(slot_cols, bt, kg)
    for f in range(k):
        np.testing.assert_allclose(np.asarray(got_n[f]),
                                   np.asarray(want_n[f]),
                                   rtol=2e-6, atol=2e-5)
    for c in range(3):
        for f in range(kg):
            np.testing.assert_allclose(np.asarray(got_g[c][f]),
                                       np.asarray(want_g[c][f]),
                                       rtol=2e-6, atol=2e-5)


# ---- npe=4 (tets): the engine is npe-generic; ABR=8 exactly fits ----

def _tet_mesh(nx=9, ny=7, nz=5):
    """Structured tet mesh: each cube cell split into 5 tets."""
    nnode = nx * ny * nz
    nid = np.arange(nnode).reshape(nx, ny, nz)
    conns = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                c = nid[i:i + 2, j:j + 2, k:k + 2]
                n000, n001 = c[0, 0, 0], c[0, 0, 1]
                n010, n011 = c[0, 1, 0], c[0, 1, 1]
                n100, n101 = c[1, 0, 0], c[1, 0, 1]
                n110, n111 = c[1, 1, 0], c[1, 1, 1]
                conns += [[n000, n100, n010, n001],
                          [n100, n110, n010, n111],
                          [n100, n101, n001, n111],
                          [n010, n011, n001, n111],
                          [n100, n010, n001, n111]]
    return np.asarray(conns, np.int32), nnode


def test_band_tet_gather_scatter_match():
    conn, nnode = _tet_mesh()
    bt = band2d.build_band_tables(conn, nnode)
    assert bt is not None and bt.npe == 4
    rng = np.random.default_rng(4)
    k = 6
    cols = [jnp.asarray(rng.standard_normal(nnode), jnp.float32)
            for _ in range(k)]
    npack8 = band2d.pack_nodal(cols, bt)
    got = band2d.gather_corners(npack8, bt, k)
    for c in range(4):
        for f in range(k):
            want = np.asarray(cols[f])[conn[:, c]]
            np.testing.assert_allclose(np.asarray(got[c][f]), want,
                                       rtol=0, atol=0)

    nelem = conn.shape[0]
    slot_cols = [tuple(jnp.asarray(rng.standard_normal(nelem), jnp.float32)
                       for _ in range(3)) for _ in range(4)]
    got_s = band2d.scatter_corners(slot_cols, bt)
    contrib = jnp.stack(
        [jnp.stack([slot_cols[c][f] for f in range(3)], axis=1)
         for c in range(4)], axis=1)
    gidx, gmask = _support(conn, nnode)
    want_s = node_sum(contrib, gidx, gmask)
    for f in range(3):
        np.testing.assert_allclose(np.asarray(got_s[f]),
                                   np.asarray(want_s[:, f]),
                                   rtol=2e-6, atol=2e-5)


def test_band_tet_pallas_kernels_match_reference(monkeypatch):
    monkeypatch.setattr(band2d, "INTERPRET", True)
    conn, nnode = _tet_mesh()
    bt = band2d.build_band_tables(conn, nnode)
    rng = np.random.default_rng(5)
    k = 4
    cols = [jnp.asarray(rng.standard_normal(nnode), jnp.float32)
            for _ in range(k)]
    npack8 = band2d.pack_nodal(cols, bt)
    want = band2d.gather_corners(npack8, bt, k)
    got = band2d.gather_corners_tpu(npack8, bt, k)
    for c in range(4):
        for f in range(k):
            np.testing.assert_allclose(np.asarray(got[c][f]),
                                       np.asarray(want[c][f]),
                                       rtol=1e-6, atol=1e-6)

    nelem = conn.shape[0]
    slot_cols = [tuple(jnp.asarray(rng.standard_normal(nelem), jnp.float32)
                       for _ in range(3)) for _ in range(4)]
    want_s = band2d.scatter_corners(slot_cols, bt)
    got_s = band2d.scatter_corners_tpu(slot_cols, bt)
    for f in range(3):
        np.testing.assert_allclose(np.asarray(got_s[f]),
                                   np.asarray(want_s[f]),
                                   rtol=2e-6, atol=2e-5)
