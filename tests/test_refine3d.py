"""3D radius-edge quality guarantee (TetGen q-switch parity).

The reference enforces circumradius/shortest-edge <= mesh.max_ratio
(default 2.0) on every tet via TetGen's q switch (set_3d_quality_str,
mesh.cxx:745-757; input.cxx:182-183).  These tests pin the same
constructive bound on the first-party 3D meshing paths — strictly in
the domain interior, with an explicitly bounded tail at the boundary
(TetGen likewise exempts constrained-facet-protected tets; our retry
loop owns the residue).
"""

import numpy as np

from dynearthsol_tpu.mesh.refine3d import (_delaunay3, box_inside_fn_3d,
                                           box_project_fn_3d,
                                           refine_radius_edge,
                                           tet_quality_stats)


def _interior_ratios(coord, inside_fn):
    conn = _delaunay3(coord)
    a = coord[conn[:, 0]]
    vol6 = np.abs(np.einsum(
        "ij,ij->i", coord[conn[:, 1]] - a,
        np.cross(coord[conn[:, 2]] - a, coord[conn[:, 3]] - a)))
    conn = conn[vol6 > 1e-12 * vol6.max()]
    ratio, _, _ = tet_quality_stats(coord, conn)
    return ratio[inside_fn(coord[conn].mean(axis=1))]


def test_quality_stats_regular_tet():
    # regular tetrahedron: R/l = sqrt(6)/4 ~ 0.6124, dihedral ~ 70.53 deg
    coord = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                     dtype=np.float64)
    conn = np.array([[0, 1, 2, 3]])
    ratio, mindih, vol = tet_quality_stats(coord, conn)
    assert abs(ratio[0] - np.sqrt(6.0) / 4.0) < 1e-12
    assert abs(mindih[0] - np.degrees(np.arccos(1.0 / 3.0))) < 1e-9
    assert abs(vol[0] - 8.0 / 3.0) < 1e-12


def test_refine_radius_edge_random_cloud():
    """A random interior cloud (plenty of ratio > 2 tets) is driven to
    the bound; the boundary-limited tail stays tiny and never exceeds
    a small overshoot of the bound."""
    rng = np.random.default_rng(42)
    L = 1.0
    g = np.linspace(0, L, 13)
    GX, GY = np.meshgrid(g, g, indexing="ij")
    W = []
    for zf in (0.0, -L):
        W.append(np.stack([GX.ravel(), GY.ravel(),
                           np.full(GX.size, zf)], axis=1))
    for xf in (0.0, L):
        W.append(np.stack([np.full(GX.size, xf), GX.ravel(),
                           -GY.ravel()], axis=1))
    for yf in (0.0, L):
        W.append(np.stack([GX.ravel(), np.full(GX.size, yf),
                           -GY.ravel()], axis=1))
    wall = np.unique(np.concatenate(W), axis=0)
    intr = rng.random((600, 3))
    intr[:, 2] -= 1.0
    intr = intr[(intr[:, :2].min(1) > 0.04) & (intr[:, :2].max(1) < L - 0.04)
                & (intr[:, 2] > -L + 0.04) & (intr[:, 2] < -0.04)]
    coord = np.concatenate([wall, intr])

    surf = lambda x, y: np.zeros_like(np.asarray(x, dtype=float))
    bot = lambda x, y: np.full_like(np.asarray(x, dtype=float), -L)
    inside = box_inside_fn_3d(L, L, surf, bot)
    proj = box_project_fn_3d(L, L, surf, bot)

    r0 = _interior_ratios(coord, inside)
    assert float((r0 > 2.0).mean()) > 0.03   # input genuinely bad
    assert r0.max() > 4.0

    out, _ = refine_radius_edge(coord, inside, max_ratio=2.0,
                                project_fn=proj)
    assert out.shape[0] > coord.shape[0]
    r1 = _interior_ratios(out, inside)
    assert float((r1 > 2.0).mean()) < 0.005  # tail: boundary-limited only
    assert r1.max() < 2.5                    # and never far over the bound


def test_refined_zone_box_3d_quality():
    """The graded refined-zone 3D generator honours mesh.max_ratio
    (mesh.cxx:1618-1846 + TetGen q parity): refinement cuts the
    violation tail and caps the worst ratio near the bound."""
    from dynearthsol_tpu.config import param_from_dict
    from dynearthsol_tpu.mesh.generate import refined_zone_box_3d

    def param(max_ratio):
        return param_from_dict({
            "sim": {"modelname": "t", "ndims": 3},
            "mesh": {"meshing_option": 2, "xlength": 10e3,
                     "ylength": 10e3, "zlength": 10e3,
                     "resolution": 1e3, "largest_size": 8,
                     "refined_zonex": [0.4, 0.6],
                     "refined_zoney": [0.4, 0.6],
                     "refined_zonez": [0.0, 0.3],
                     "max_ratio": max_ratio},
        })

    md0 = refined_zone_box_3d(param(0.0))
    r0, _, _ = tet_quality_stats(md0.coord, md0.connectivity)
    md1 = refined_zone_box_3d(param(2.0))
    r1, _, _ = tet_quality_stats(md1.coord, md1.connectivity)
    assert float((r0 > 2.0).mean()) > 0.01   # unrefined: a real tail
    assert float((r1 > 2.0).mean()) < 0.005  # refined: tail almost gone
    assert r1.max() < 2.5
    assert r1.max() < r0.max()
