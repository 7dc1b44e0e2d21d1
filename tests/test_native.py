"""Native C++ kd-tree / locate extension tests: must agree with the scipy
reference implementation exactly."""

import numpy as np
import pytest

from dynearthsol_tpu.native import (NativeKDTree, get_lib,
                                    locate_points_native)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C++ toolchain")


def test_kdtree_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    pts = rng.random((500, 2))
    q = rng.random((100, 2))
    nt = NativeKDTree(pts)
    d_n, i_n = nt.query(q, k=5)
    d_s, i_s = cKDTree(pts).query(q, k=5)
    np.testing.assert_allclose(d_n, d_s, rtol=1e-12)
    np.testing.assert_array_equal(i_n, i_s)


def test_locate_matches_scipy_2d_and_3d():
    import dynearthsol_tpu as des
    from dynearthsol_tpu.mesh.locate import ElementLocator

    for ndims in (2, 3):
        d = {
            "sim": {"ndims": ndims},
            "mesh": {"meshing_option": 1, "meshing_elem_shape": 0,
                     "xlength": 10.0, "ylength": 10.0, "zlength": 10.0,
                     "resolution": 2.0},
            "mat": {"rheology_type": "elastic", "rho0": [2800.0],
                    "bulk_modulus": [50e9], "shear_modulus": [30e9]},
            "bc": {"vbc_x0": 1, "vbc_x1": 1, "vbc_z0": 0, "vbc_z1": 0},
        }
        param = des.param_from_dict(d)
        from dynearthsol_tpu.mesh import create_new_mesh
        mesh = create_new_mesh(param)
        rng = np.random.default_rng(1)
        pts = rng.uniform(1.0, 9.0, (200, ndims))
        pts[:, -1] -= 10.0  # z in [-9, -1]

        loc = ElementLocator(mesh.coord, mesh.connectivity)
        e_n, eta_n, f_n = locate_points_native(loc.coord, loc.conn, pts,
                                               32, -1e-8)
        e_s, eta_s, f_s = loc._locate_scipy(pts)
        assert f_n.all() and f_s.all()
        # both must reconstruct the point exactly (elements may differ on
        # shared facets)
        rec_n = np.einsum("nk,nkd->nd", eta_n,
                          loc.coord[loc.conn[e_n]])
        np.testing.assert_allclose(rec_n, pts, atol=1e-9)
        same = e_n == e_s
        assert same.mean() > 0.95  # ties on facets may differ
