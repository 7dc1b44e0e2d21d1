"""Meshing from Triangle .poly files (meshing_option 90/91,
mesh.cxx:1848-2230) with regional mattypes via flood fill."""

import numpy as np
import pytest

import dynearthsol_tpu as des

RIFTING_CFG = "/root/reference/benchmarks/../examples/rifting-2d.cfg"


@pytest.fixture(scope="module")
def rifting_sim():
    p = des.load_config(RIFTING_CFG)
    return des.Simulation(p)


def test_poly_mesh_regions(rifting_sim):
    sim = rifting_sim
    assert sim.topo.nelem > 500
    vol = np.asarray(sim.state.volume)
    assert (vol > 0).all()
    ra = sim.mesh.regattr
    assert ra is not None and set(np.unique(ra)) == {0, 1}
    cen = np.asarray(sim.mesh.coord)[sim.topo.connectivity].mean(axis=1)
    z = cen[:, 1]
    # layer geometry from rifting-2d.poly: crust (mat 0) above ~-39 km,
    # mantle (mat 1) below ~-35 km
    assert (z[ra == 0] > -39.5e3).all()
    assert (z[ra == 1] < -34.5e3).all()
    # refined upper layer (size 2e7 m^2) vs unlimited outer lower regions
    fine = np.median(vol[ra == 0])
    coarse = np.median(vol[(ra == 1) & (np.abs(cen[:, 0] - 250e3) > 150e3)])
    assert fine < 2.5e7
    assert coarse > 4e7


def test_poly_mesh_steps(rifting_sim):
    sim = rifting_sim
    s = sim.run_steps(10, chunk=5)
    assert np.isfinite(np.asarray(s.stress)).all()
    assert np.isfinite(np.asarray(s.vel)).all()


def test_exodus_import():
    """meshing_option 95 (new_mesh_from_exofile, mesh.cxx:2231-2487):
    Exodus/NetCDF mesh with block mattypes and side-set boundaries."""
    p = des.load_config("/root/reference/examples/kenner_and_segall.cfg")
    assert p.sim.ndims == 3
    sim = des.Simulation(p)
    assert sim.topo.nelem == 46369
    assert sim.topo.nnode == 8923
    vol = np.asarray(sim.state.volume)
    assert (vol > 0).all()
    assert set(np.unique(sim.mesh.regattr)) == {0, 1}
    # side sets provided all six box boundaries
    assert all(len(b) > 0 for b in sim.topo.bnodes[:6])


def test_layered_radiogenic_geotherm():
    """temperature_option 2 (ic.cxx:907-1010): conductive layered geotherm
    with exponentially folded radiogenic heating."""
    p = des.load_config("/root/reference/examples/test-geotherm.cfg")
    sim = des.Simulation(p)
    T = np.asarray(sim.state.temperature)
    z = np.asarray(sim.state.coord)[:, 1]
    assert np.isfinite(T).all()
    # surface at t_top, bottom at t_bot, monotonic-ish in depth
    assert abs(T[z == 0.0].max() - p.bc.surface_temperature) < 1e-6
    assert abs(T[z == z.min()].mean() - p.bc.mantle_temperature) < 1.0
    src = np.asarray(sim.state.radiogenic_source)
    assert src.max() > 0.0 and np.isfinite(src).all()
