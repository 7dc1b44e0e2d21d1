"""Mesh generation, topology and assembly tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from dynearthsol_tpu.constants import (BOUNDX0, BOUNDX1, BOUNDZ0, BOUNDZ1)
from dynearthsol_tpu.mesh import build_topology
from dynearthsol_tpu.mesh.generate import (regular_grid_2d, regular_grid_3d,
                                           unstructured_box_2d,
                                           unstructured_box_3d)
from dynearthsol_tpu.ops.assembly import node_sum
from dynearthsol_tpu.ops.shapefn import compute_volume, shape_fn_gradients


@pytest.mark.parametrize("maker,args", [
    (regular_grid_2d, (2.0, 1.0, 0.25)),
    (unstructured_box_2d, (2.0, 1.0, 0.25)),
    (regular_grid_3d, (1.0, 1.0, 1.0, 0.5)),
    (unstructured_box_3d, (1.0, 1.0, 1.0, 0.5)),
])
def test_mesh_valid(maker, args):
    mesh = maker(*args)
    vol = np.asarray(compute_volume(jnp.asarray(mesh.coord),
                                    jnp.asarray(mesh.connectivity)))
    assert (vol > 0).all()
    # total volume equals box volume
    if mesh.ndims == 2:
        box = args[0] * args[1]
    else:
        box = args[0] * args[1] * args[2]
    assert np.isclose(vol.sum(), box, rtol=1e-10)


def test_topology_flags():
    mesh = unstructured_box_2d(2.0, 1.0, 0.25)
    topo = build_topology(mesh, 2.0, 0.0, 1.0)
    x, z = mesh.coord[:, 0], mesh.coord[:, 1]
    assert ((topo.bcflag & BOUNDX0) != 0).sum() == (x == 0).sum()
    assert ((topo.bcflag & BOUNDX1) != 0).sum() == (x == 2.0).sum()
    assert ((topo.bcflag & BOUNDZ1) != 0).sum() == (z == 0).sum()
    assert ((topo.bcflag & BOUNDZ0) != 0).sum() == (z == -1.0).sum()
    # every boundary has at least one facet, facets' nodes carry the flag
    for i, bit in ((0, BOUNDX0), (1, BOUNDX1), (4, BOUNDZ0), (5, BOUNDZ1)):
        assert len(topo.bfacets[i]) > 0


def test_node_sum_matches_loop():
    mesh = unstructured_box_2d(1.0, 1.0, 0.34, seed=7)
    topo = build_topology(mesh, 1.0, 0.0, 1.0)
    rng = np.random.default_rng(0)
    contrib = rng.normal(size=(topo.nelem, 3, 2))
    expected = np.zeros((topo.nnode, 2))
    for e in range(topo.nelem):
        for i in range(3):
            expected[topo.connectivity[e, i]] += contrib[e, i]
    got = np.asarray(node_sum(jnp.asarray(contrib),
                              jnp.asarray(topo.gather_idx),
                              jnp.asarray(topo.gather_mask)))
    np.testing.assert_allclose(got, expected, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("ndims", [2, 3])
def test_shape_fn_partition_of_unity(ndims):
    if ndims == 2:
        mesh = unstructured_box_2d(1.0, 1.0, 0.3)
    else:
        mesh = unstructured_box_3d(1.0, 1.0, 1.0, 0.5)
    coord = jnp.asarray(mesh.coord)
    conn = jnp.asarray(mesh.connectivity)
    vol = compute_volume(coord, conn)
    dnd = shape_fn_gradients(coord, conn, vol)
    # gradients of the P1 partition of unity sum to zero
    np.testing.assert_allclose(np.asarray(dnd.sum(axis=1)), 0.0, atol=1e-10)
    # linear completeness: sum_i dN_i x_i = Identity
    x = coord[conn]
    grad_x = jnp.einsum("nid,nie->nde", dnd, x)
    eye = np.broadcast_to(np.eye(ndims), grad_x.shape)
    np.testing.assert_allclose(np.asarray(grad_x), eye, atol=1e-9)


def test_renumbering_mesh():
    """renumbering_mesh (mesh.cxx:2675-2795): nodes sorted along the
    longest axis, elements by centroid; geometry and regattr preserved."""
    from dynearthsol_tpu.mesh.generate import (renumber_mesh,
                                               unstructured_box_2d)

    md = unstructured_box_2d(30e3, 10e3, 2e3)
    rng = np.random.default_rng(0)
    ra = rng.integers(0, 3, md.connectivity.shape[0])
    # per-element signature (sorted coords) must survive the renumbering
    def sig(coord, conn, order=None):
        c = coord[conn]
        cc = np.sort(c.reshape(c.shape[0], -1), axis=1)
        return cc

    coord2, conn2, ra2, _ = renumber_mesh(md.coord, md.connectivity, ra)
    # nodes monotone along x (longest axis)
    assert (np.diff(coord2[:, 0]) >= 0).all()
    # same element set: match by sorted-coordinate signature
    s1 = {tuple(r) for r in np.round(sig(md.coord, md.connectivity), 6)}
    s2 = {tuple(r) for r in np.round(sig(coord2, conn2), 6)}
    assert s1 == s2
    # element centroids monotone along x
    cx = coord2[conn2].mean(axis=1)[:, 0]
    assert (np.diff(cx) >= 0).all()
    # regattr follows its element
    cent_old = md.coord[md.connectivity].mean(axis=1)
    cent_new = coord2[conn2].mean(axis=1)
    from scipy.spatial import cKDTree
    _, idx = cKDTree(cent_old).query(cent_new)
    assert (ra[idx] == ra2).all()
