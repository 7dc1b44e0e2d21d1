"""3D TetGen-format .poly meshing (meshing_option 90/91, THREED branch
of new_mesh_from_polyfile, mesh.cxx:1848-2230) — regional mattypes,
per-facet boundary markers, and facet-conforming tetrahedralization,
validated on the reference's own examples/3d_mesh_gen/bp1.poly."""

import numpy as np
import pytest

import dynearthsol_tpu as des

BP1 = "/root/reference/examples/3d_mesh_gen/bp1.poly"
TESTPOLY = "/root/reference/examples/3d_mesh_gen/test.poly"


def _bp1_param(resolution=1e3):
    return des.param_from_dict({
        "sim": {"ndims": 3, "modelname": "/tmp/test_poly3"},
        "mesh": {"meshing_option": 91, "poly_filename": BP1,
                 "xlength": 200e3, "ylength": 200e3, "zlength": 60e3,
                 "resolution": resolution,
                 "largest_size": 1e3, "smallest_size": 1e3},
        "control": {"inertial_scaling": 1e5, "dt_fraction": 1.0},
        "bc": {"vbc_x0": 1, "vbc_x1": 1,
               "vbc_val_x0": -1e-9, "vbc_val_x1": 1e-9,
               "vbc_y0": 0, "vbc_y1": 0},
        "mat": {"num_materials": 3, "rheology_type": "elastic",
                "rho0": [2700.0] * 3, "bulk_modulus": [50e9] * 3,
                "shear_modulus": [30e9] * 3},
    })


def test_read_poly_3d_bp1():
    from dynearthsol_tpu.mesh.poly3 import read_poly_3d

    pts, facets, regions = read_poly_3d(BP1)
    assert pts.shape == (16, 3)
    assert len(facets) == 16
    # single-bit boundary markers only (mesh.cxx:1966-1975); the two
    # internal fault-block walls carry flag 0
    flags = [f for _, f in facets]
    assert flags.count(0) == 2
    assert all(f == 0 or (f & (f - 1)) == 0 for f in flags)
    assert regions.shape == (3, 5)
    assert list(regions[:, 3]) == [0.0, 1.0, 2.0]


def test_read_poly_3d_rejects_unsupported():
    # the reference exits on has_bdryflag != 1 (mesh.cxx:1937-1941) and
    # on nregions <= 0 (mesh.cxx:2075-2079); examples/3d_mesh_gen/
    # test.poly has neither boundary markers nor regions
    from dynearthsol_tpu.mesh.poly3 import read_poly_3d

    with pytest.raises(ValueError, match="boundary markers|nregions"):
        read_poly_3d(TESTPOLY)


@pytest.fixture(scope="module")
def bp1_mesh():
    from dynearthsol_tpu.mesh.poly3 import mesh_from_poly_3d

    return mesh_from_poly_3d(_bp1_param())


def test_poly3_regions_and_sizes(bp1_mesh):
    """Region flood fill must put mattype 2 exactly inside the central
    fault block x in [99, 101] km, and honor the 10x finer size there."""
    md = bp1_mesh
    assert md.nelem > 5000
    cen = md.coord[md.connectivity].mean(axis=1)
    for mt in (0, 1, 2):
        assert (md.regattr == mt).any()
    assert cen[md.regattr == 2, 0].min() >= 99e3 - 1.0
    assert cen[md.regattr == 2, 0].max() <= 101e3 + 1.0
    assert cen[md.regattr == 0, 0].max() <= 99e3 + 1.0
    assert cen[md.regattr == 1, 0].min() >= 101e3 - 1.0
    # size grading: median element volume in the refined block is
    # smaller than in the host blocks (region sizes 1e2 vs 1e3)
    a = md.coord[md.connectivity[:, 0]]
    vol = np.abs(np.einsum(
        "ij,ij->i", md.coord[md.connectivity[:, 1]] - a,
        np.cross(md.coord[md.connectivity[:, 2]] - a,
                 md.coord[md.connectivity[:, 3]] - a))) / 6.0
    assert (np.median(vol[md.regattr == 2])
            < 0.5 * np.median(vol[md.regattr == 0]))


def test_poly3_boundary_markers(bp1_mesh):
    """Hull triangles carry the facet markers; all six box sides are
    covered and the marked areas sum to the side areas."""
    md = bp1_mesh
    assert md.segment.shape[0] > 0
    areas = {}
    for flag in (1, 2, 4, 8, 16, 32):
        tris = md.segment[md.segflag == flag]
        assert tris.shape[0] > 0, f"no boundary triangles for flag {flag}"
        a = md.coord[tris[:, 0]]
        cr = np.cross(md.coord[tris[:, 1]] - a, md.coord[tris[:, 2]] - a)
        areas[flag] = 0.5 * np.linalg.norm(cr, axis=1).sum()
    assert np.isclose(areas[1], 200e3 * 60e3, rtol=1e-6)   # x0 side
    assert np.isclose(areas[16], 200e3 * 200e3, rtol=1e-6)  # bottom
    assert np.isclose(areas[32], 200e3 * 200e3, rtol=1e-6)  # top


def test_poly3_simulation_steps(bp1_mesh):
    """A Simulation built from the .poly mesh steps without NaNs and
    the boundary node sets derive from the facet markers."""
    sim = des.Simulation(_bp1_param())
    for i in range(6):
        assert sim.topo.bnodes[i].size > 0, f"boundary {i} empty"
    # internal walls must NOT leak into boundary flags: interior nodes
    # on x=99km plane are unflagged
    x = sim.mesh.coord[:, 0]
    interior = ((np.abs(x - 99e3) < 1.0)
                & (sim.mesh.coord[:, 1] > 1e3)
                & (sim.mesh.coord[:, 1] < 199e3)
                & (sim.mesh.coord[:, 2] < -1e3)
                & (sim.mesh.coord[:, 2] > -59e3))
    assert interior.any()
    assert (sim.topo.bcflag[interior] == 0).all()
    sim.run_steps(5, chunk=5)
    v = np.asarray(sim.state.vel)
    assert np.isfinite(v).all()
    assert np.isfinite(np.asarray(sim.state.stress)).all()
