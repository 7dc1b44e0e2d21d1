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
