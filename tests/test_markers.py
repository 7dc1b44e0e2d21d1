"""Marker subsystem tests (reference: markerset.cxx behaviors)."""

import numpy as np

import dynearthsol_tpu as des
from dynearthsol_tpu.barycentric import (bary_coords, bary_to_coord,
                                         is_inside, random_barycentric)
from dynearthsol_tpu.markers import MarkerSet, create_markers, \
    emw_from_markers
from dynearthsol_tpu.mesh import build_topology, create_new_mesh


def small_param(nmat=1, extra_mat=None):
    mat = {"rheology_type": "elastic", "rho0": [2800.0] * nmat,
           "bulk_modulus": [50e9] * nmat, "shear_modulus": [30e9] * nmat,
           "num_materials": nmat}
    if extra_mat:
        mat.update(extra_mat)
    return des.param_from_dict({
        "sim": {"ndims": 2},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10e3, "ylength": 0.0, "zlength": 10e3,
                 "resolution": 2.5e3},
        "markers": {"markers_per_element": 4, "random_seed": 7},
        "ic": {"num_mattype_layers": 2, "layer_mattypes": [0, nmat - 1],
               "mattype_layer_depths": [0.5]},
        "mat": mat,
    })


def _mesh_topo(param):
    mesh = create_new_mesh(param)
    topo = build_topology(mesh, param.mesh.xlength, param.mesh.ylength,
                          param.mesh.zlength)
    return mesh, topo


def test_random_barycentric_in_simplex():
    rng = np.random.default_rng(0)
    eta = random_barycentric(1000, 3, rng)
    assert np.allclose(eta.sum(axis=1), 1.0)
    assert (eta >= 0).all()
    # uniformity: mean of each coordinate ~ 1/3
    assert np.allclose(eta.mean(axis=0), 1 / 3, atol=0.02)


def test_bary_roundtrip():
    param = small_param()
    mesh, topo = _mesh_topo(param)
    rng = np.random.default_rng(1)
    elems = rng.integers(0, topo.nelem, 50).astype(np.int32)
    eta = random_barycentric(50, 3, rng)
    pts = bary_to_coord(mesh.coord, topo.connectivity, elems, eta)
    eta2 = bary_coords(mesh.coord, topo.connectivity, elems, pts)
    assert np.allclose(eta, eta2, atol=1e-12)
    assert is_inside(eta2).all()


def test_create_markers_counts_and_histogram():
    param = small_param()
    mesh, topo = _mesh_topo(param)
    ms = create_markers(param, mesh.coord, topo.connectivity)
    assert ms.n == topo.nelem * 4
    h = ms.elem_histogram(topo.nelem, 1)
    assert (h[:, 0] == 4).all()
    # all markers inside their element
    assert is_inside(ms.live("eta")).all()


def test_mattype_depth_layers():
    param = small_param(nmat=2)
    mesh, topo = _mesh_topo(param)
    ms = create_markers(param, mesh.coord, topo.connectivity)
    pts = ms.coords(mesh.coord, topo.connectivity)
    deep = pts[:, 1] < -5e3
    assert (ms.live("mattype")[deep] == 1).all()
    assert (ms.live("mattype")[~deep] == 0).all()
    emw = emw_from_markers(ms, topo.nelem, 2)
    assert emw.shape == (topo.nelem, 2)
    assert (emw.sum(axis=1) > 0).all()


def test_append_remove_swap_with_last():
    ms = MarkerSet.empty(2, cap=4)
    eta = np.full((6, 3), 1 / 3)
    ms.append(eta, elem=np.arange(6), mattype=0)
    assert ms.n == 6 and ms.cap >= 6
    ids_before = ms.live("id").copy()
    ms.remove(np.array([1, 3]))
    assert ms.n == 4
    # swap-with-last semantics: removing 3 puts 5 there, removing 1 puts 4
    assert set(ms.live("id")) == {0, 2, 4, 5}
    assert ms.id[3] == ids_before[5]
    assert ms.id[1] == ids_before[4]


def test_simulation_uses_marker_histogram():
    param = small_param(nmat=2, extra_mat={
        "rho0": [2000.0, 3000.0], "bulk_modulus": [50e9, 80e9],
        "shear_modulus": [30e9, 40e9]})
    sim = des.Simulation(param)
    assert sim.markers is not None
    emw = np.asarray(sim.state.emw)
    assert emw.sum() == sim.markers.n


def test_glibc_rand_replica():
    """utils/glibc_rand reproduces the in-container glibc rand() stream
    word-for-word (vectors captured from a C program compiled here:
    srand(seed); rand() x5)."""
    from dynearthsol_tpu.utils.glibc_rand import (glibc_rand_stream,
                                                  reference_random_eta)

    assert glibc_rand_stream(1, 5).tolist() == [
        1804289383, 846930886, 1681692777, 1714636915, 1957747793]
    assert glibc_rand_stream(12345, 5).tolist() == [
        383100999, 858300821, 357768173, 455528251, 133005921]
    # seed 0 is replaced by 1 (glibc __srandom_r)
    assert glibc_rand_stream(0, 2).tolist() == glibc_rand_stream(
        1, 2).tolist()

    eta = reference_random_eta(12345, 1000, 2)
    assert eta.shape == (1000, 3)
    assert (eta >= 0).all()
    assert np.allclose(eta.sum(axis=1), 1.0, atol=1e-15)
    # first marker reproduces the hand-walked rejection sequence:
    # u0+u1 = (383100999+858300821)/RAND_MAX < 1 -> accepted directly
    assert abs(eta[0, 0] - 383100999 / 2147483647) < 1e-18
    assert abs(eta[0, 1] - 858300821 / 2147483647) < 1e-18


def test_reference_compatible_marker_init():
    """markers.reference_compatible_rng places nelem*mpe markers from
    the glibc stream in reference element order (markerset.cxx:510-538)."""
    import dynearthsol_tpu as des

    d = {
        "sim": {"ndims": 2, "float_dtype": "float64"},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 4e3, "ylength": 0.0, "zlength": 2e3,
                 "resolution": 1e3, "quality_check_step_interval": 10**8},
        "markers": {"markers_per_element": 4, "random_seed": 12345,
                    "reference_compatible_rng": True},
        "ic": {"mattype_option": 1, "num_mattype_layers": 2,
               "layer_mattypes": [0, 1], "mattype_layer_depths": [0.5]},
        "control": {"gravity": 0.0, "has_thermal_diffusion": False},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0, "vbc_x1": 1,
               "vbc_val_x1": 0.0, "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 0},
        "mat": {"rheology_type": "maxwell", "nmat": 2,
                "rho0": [2700.0, 3300.0],
                "bulk_modulus": [1e12, 2e12],
                "shear_modulus": [1e10, 3e10]},
    }
    sim = des.Simulation(des.param_from_dict(d))
    ms = sim.markers
    assert ms.n == sim.topo.nelem * 4
    from dynearthsol_tpu.utils.glibc_rand import reference_random_eta
    eta = reference_random_eta(12345, ms.n, 2)
    assert np.abs(ms.eta[:ms.n] - eta).max() == 0.0
    # both materials present (layered split)
    assert set(np.unique(ms.mattype[:ms.n])) == {0, 1}


def test_regularly_spaced_markers():
    """init_marker_option 2 (regularly_spaced_markers,
    markerset.cxx:542-649): centered grid at init_marker_spacing *
    resolution, located into elements; off-mesh points skipped."""
    import dynearthsol_tpu as des
    from dynearthsol_tpu.barycentric import bary_to_coord

    p = des.param_from_dict({
        "sim": {"ndims": 2, "max_steps": 1},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10.0, "zlength": 10.0, "resolution": 1.0},
        "markers": {"init_marker_option": 2, "init_marker_spacing": 0.5,
                    "markers_per_element": 4},
        "mat": {"rheology_type": "elastic"},
    })
    sim = des.Simulation(p)
    ms = sim.markers
    # spacing d = int(0.5 * 1.0) -> clamped to 1; 11x11 grid inside the
    # 10x10 box -> one marker per grid point that lands in an element
    assert ms.n > 100
    pts = bary_to_coord(np.asarray(sim.mesh.coord), sim.topo.connectivity,
                        ms.elem[:ms.n], ms.eta[:ms.n])
    # all markers inside the domain
    assert pts[:, 0].min() >= -1e-9 and pts[:, 0].max() <= 10.0 + 1e-9
    # regular spacing: x coordinates take ~11 distinct values
    xs = np.unique(np.round(pts[:, 0], 6))
    assert len(xs) <= 12
