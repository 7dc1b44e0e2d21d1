"""ACM volume-overlap element remap (nn-interpolation.cxx:77-326).

The accuracy contract (benchmarks/acm-error-est.cfg's purpose): remapping
an element field between offset meshes through the ACM sample-lattice
weighting must beat the plain nearest-centroid copy by a clear margin on
smooth fields, and must reproduce constants exactly.
"""

import numpy as np

from dynearthsol_tpu.acm import ACMRemap, _sample_etas


def _box_mesh(nx, nz, x0=0.0, z0=0.0, lx=1.0, lz=1.0):
    xs = np.linspace(x0, x0 + lx, nx)
    zs = np.linspace(z0, z0 + lz, nz)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    coord = np.stack([X.reshape(-1), Z.reshape(-1)], axis=1)
    conn = []
    for i in range(nx - 1):
        for j in range(nz - 1):
            n00 = i * nz + j
            n10 = (i + 1) * nz + j
            n01 = i * nz + (j + 1)
            n11 = (i + 1) * nz + (j + 1)
            conn.append((n00, n10, n11))
            conn.append((n00, n11, n01))
    return coord, np.asarray(conn, dtype=np.int64)


def test_sample_lattices_match_reference():
    # 2D volume: 10 x 11 offset lattice, inside points only
    # (nn-interpolation.cxx:137-158)
    s = _sample_etas(2, is_surface=False)
    assert s.shape[1] == 3
    assert (s > 0).all() and np.allclose(s.sum(axis=1), 1.0)
    assert len(s) == sum(
        1 for i in range(10) for j in range(11)
        if 1 - (i + 0.5) / 10 - (j + 0.5) / 11 >= 1e-15)
    # surface 2D: 20 segment samples
    assert len(_sample_etas(2, is_surface=True)) == 20
    # 3D volume: 10 x 11 x 10
    s3 = _sample_etas(3, is_surface=False)
    assert s3.shape[1] == 4 and (s3 > 0).all()


def test_acm_exact_on_constant_and_beats_nearest():
    old_coord, old_conn = _box_mesh(21, 21)
    # offset + slightly stretched new mesh interior to the old one
    new_coord, new_conn = _box_mesh(17, 17, x0=0.013, z0=0.021,
                                    lx=0.95, lz=0.95)
    acm = ACMRemap(old_coord, old_conn, new_coord, new_conn)
    assert (acm.is_changed != 0).any()

    # constants are reproduced exactly (weights sum to 1)
    const = np.full(old_conn.shape[0], 3.7)
    out = acm.inject(const)
    np.testing.assert_allclose(out, 3.7, rtol=1e-12)

    # smooth field: ACM must beat the nearest-centroid copy
    def f(cent):
        return np.sin(3.0 * cent[:, 0]) * np.cos(2.0 * cent[:, 1])

    old_cent = old_coord[old_conn].mean(axis=1)
    new_cent = new_coord[new_conn].mean(axis=1)
    src = f(old_cent)
    exact = f(new_cent)
    acm_err = np.abs(acm.inject(src) - exact)
    nn_err = np.abs(src[acm.nn] - exact)
    ch = acm.is_changed > 0
    assert ch.sum() > 50
    assert acm_err[ch].mean() < 0.5 * nn_err[ch].mean(), \
        (acm_err[ch].mean(), nn_err[ch].mean())

    # tensor fields remap componentwise
    t = np.stack([src, 2 * src, -src], axis=1)
    tout = acm.inject(t)
    np.testing.assert_allclose(tout[:, 1], 2 * acm.inject(src), rtol=1e-12)


def test_acm_identical_mesh_is_identity():
    coord, conn = _box_mesh(12, 12)
    acm = ACMRemap(coord, conn, coord, conn)
    assert (acm.is_changed == 0).all()
    src = np.random.default_rng(0).random(conn.shape[0])
    np.testing.assert_array_equal(acm.inject(src), src)


def test_acm_surface_segments():
    # 1D surface facets (2D mesh): segments along the top
    x_old = np.linspace(0.0, 1.0, 31)
    x_new = np.linspace(0.0, 1.0, 24) + 0.002
    x_new = np.clip(x_new, 0.0, 1.0)

    def seg_mesh(xs):
        coord = np.stack([xs, np.zeros_like(xs)], axis=1)
        conn = np.stack([np.arange(len(xs) - 1),
                         np.arange(1, len(xs))], axis=1)
        return coord, conn

    oc, ocn = seg_mesh(x_old)
    nc, ncn = seg_mesh(x_new)
    acm = ACMRemap(oc, ocn, nc, ncn, is_surface=True)
    const = np.full(ocn.shape[0], 1.25)
    np.testing.assert_allclose(acm.inject(const), 1.25, rtol=1e-12)
    # per-length density of a linear field remaps to ~the midpoint value
    mid_old = 0.5 * (x_old[:-1] + x_old[1:])
    mid_new = 0.5 * (x_new[:-1] + x_new[1:])
    out = acm.inject(mid_old)
    assert np.abs(out - mid_new).max() < 0.05
