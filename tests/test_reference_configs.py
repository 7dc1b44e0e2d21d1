"""Every reference .cfg must parse through our config layer, and the tiny
ones must initialize a Simulation.  (A full init sweep of all 39 configs
passes but takes ~25 min of XLA compiles; run it manually when needed.)"""

import os

import pytest

import dynearthsol_tpu as des

DIRS = ("/root/reference/examples", "/root/reference/benchmarks",
        "/root/reference/benchmarks-cores",
        "/root/reference/tests/functional",
        "/root/reference/examples/3d_mesh_gen")


def _cfgs():
    out = []
    for d in DIRS:
        if os.path.isdir(d):
            out += sorted(os.path.join(d, f) for f in os.listdir(d)
                          if f.endswith(".cfg") and f != "defaults.cfg")
    return out


@pytest.mark.skipif(not os.path.isdir(DIRS[0]), reason="no reference")
def test_all_reference_cfgs_parse():
    cfgs = _cfgs()
    assert len(cfgs) > 30
    for c in cfgs:
        p = des.load_config(c)  # raises on parse/validation errors
        assert p.sim.ndims in (2, 3)


@pytest.mark.skipif(not os.path.isdir(DIRS[0]), reason="no reference")
def test_tiny_reference_cfgs_init(tmp_path):
    for c in _cfgs():
        p = des.load_config(c)
        if p.sim.is_restarting:
            continue
        m = p.mesh
        cells = (m.xlength / m.resolution) * (m.zlength / m.resolution)
        if p.sim.ndims == 3:
            cells *= max(m.ylength / m.resolution, 1)
        if cells > 1.2e3:
            continue
        p.sim.modelname = os.path.join(str(tmp_path),
                                       os.path.basename(c))
        sim = des.Simulation(p)
        assert sim.topo.nelem > 0
