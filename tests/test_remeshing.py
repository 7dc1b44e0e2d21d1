"""Remeshing + remap tests (reference: remeshing.cxx, nn-interpolation.cxx,
brc-interpolation.cxx, geometry.cxx SPR)."""

import numpy as np
import pytest

import dynearthsol_tpu as des
from dynearthsol_tpu.barycentric import is_inside
from dynearthsol_tpu.mesh.locate import ElementLocator
from dynearthsol_tpu.remesh_impl import (generate_new_mesh_2d,
                                         remesh_simulation, spr_elem_to_node,
                                         spr_node_to_elem)
from dynearthsol_tpu.remeshing import bad_mesh_quality


def rift_param(**over):
    d = {
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 30e3, "ylength": 0.0, "zlength": 10e3,
                 "resolution": 2e3, "quality_check_step_interval": 100,
                 "min_quality": 0.4, "remeshing_option": 1,
                 "max_boundary_distortion": 0.25},
        "markers": {"markers_per_element": 4, "random_seed": 5,
                    "min_num_markers_in_element": 3},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -3e-9,
               "vbc_x1": 1, "vbc_val_x1": 3e-9,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9]},
    }
    for sec, kv in over.items():
        d.setdefault(sec, {}).update(kv)
    return des.param_from_dict(d)


def test_locate_points_roundtrip():
    param = rift_param()
    sim = des.Simulation(param)
    coord = np.asarray(sim.state.coord)
    conn = sim.topo.connectivity
    rng = np.random.default_rng(0)
    # random interior points
    pts = np.stack([rng.uniform(1e3, 29e3, 200),
                    rng.uniform(-9e3, -1e3, 200)], axis=1)
    loc = ElementLocator(coord, conn)
    elem, eta, found = loc.locate(pts)
    assert found.all()
    # eta reproduces the point
    verts = coord[conn[elem]]
    rec = np.einsum("nk,nkd->nd", eta, verts)
    assert np.allclose(rec, pts, atol=1e-6)


def test_spr_recovers_linear_field():
    """SPR must reproduce a linear stress field exactly (the defining
    property of the patch recovery, geometry.cxx:629-754)."""
    param = rift_param()
    sim = des.Simulation(param)
    coord = np.asarray(sim.state.coord)
    conn = sim.topo.connectivity
    volume = np.asarray(sim.state.volume)
    cent = coord[conn].mean(axis=1)
    field = (2.0 * cent[:, 0] - 3.0 * cent[:, 1] + 7.0)[:, None]
    nodal = spr_elem_to_node(coord, conn, field, volume)
    expect = 2.0 * coord[:, 0] - 3.0 * coord[:, 1] + 7.0
    assert np.allclose(nodal[:, 0], expect, rtol=1e-9, atol=1e-6)
    back = spr_node_to_elem(conn, nodal)
    assert np.allclose(back[:, 0], field[:, 0], rtol=1e-9, atol=1e-6)


def test_generate_new_mesh_preserves_topography():
    param = rift_param()
    sim = des.Simulation(param)
    coord = np.asarray(sim.state.coord).copy()
    # fake topography: a bump on the top surface
    from dynearthsol_tpu.constants import BOUNDZ1
    top = (sim.topo.bcflag & BOUNDZ1) != 0
    coord[top, 1] += 500.0 * np.exp(-((coord[top, 0] - 15e3) / 4e3) ** 2)
    nc, nconn, nflag = generate_new_mesh_2d(param, coord, sim.topo, seed=1)
    ntop = (nflag & BOUNDZ1) != 0
    # new surface follows the bump
    mid = np.argmin(np.abs(nc[ntop, 0] - 15e3))
    assert nc[ntop][mid, 1] > 300.0
    # valid positively-oriented mesh
    a, b, c = nc[nconn[:, 0]], nc[nconn[:, 1]], nc[nconn[:, 2]]
    area2 = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - \
            (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    assert (area2 > 0).all()


def test_generate_new_mesh_recovers_concave_boundary():
    """A deep surface valley makes the domain non-convex; unconstrained
    Delaunay would cut across it.  The regeneration must (a) recover
    every boundary-chain segment as a mesh edge (CDT conformity via
    Steiner midpoints, mesh.cxx:2577-2621 role) and (b) keep all element
    centroids inside the domain, with acceptable quality."""
    from dynearthsol_tpu.constants import BOUNDZ1
    from dynearthsol_tpu.remeshing import _elem_quality_np

    param = rift_param(mesh={"meshing_elem_shape": 0})
    sim = des.Simulation(param)
    coord = np.asarray(sim.state.coord).copy()
    top = (sim.topo.bcflag & BOUNDZ1) != 0
    # a sharp 3-km-deep valley (1.5 resolutions wide)
    coord[top, 1] -= 3e3 * np.exp(-((coord[top, 0] - 15e3) / 1.5e3) ** 2)
    nc, nconn, nflag = generate_new_mesh_2d(param, coord, sim.topo, seed=3)

    # (a) every consecutive top-chain pair is an edge of the mesh
    e = nconn[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2)
    e = np.sort(e, axis=1)
    n = nc.shape[0]
    ekeys = np.unique(e[:, 0].astype(np.int64) * n + e[:, 1])
    ids = np.where((nflag & BOUNDZ1) != 0)[0]
    ids = ids[np.argsort(nc[ids, 0])]
    lo = np.minimum(ids[:-1], ids[1:]).astype(np.int64)
    hi = np.maximum(ids[:-1], ids[1:])
    assert np.isin(lo * n + hi, ekeys).all(), "top chain not recovered"

    # (b) centroids inside, quality acceptable
    cen = nc[nconn].mean(axis=1)
    f = np.interp(cen[:, 0], nc[ids, 0], nc[ids, 1])
    assert (cen[:, 1] <= f + 1.0).all()
    v = nc[nconn]
    vols = 0.5 * np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 1, 1] - v[:, 0, 1]) * (v[:, 2, 0] - v[:, 0, 0]))
    q = _elem_quality_np(nc, nconn, vols)
    assert q.min() > 0.2, q.min()


def test_sediment_surface_refinement_seeds():
    """refine_surface_elem analog (remeshing.cxx:1028-1092): oversized
    sediment-bearing surface elements contribute interior midpoint
    seeds, and the regeneration accepts them."""
    from dynearthsol_tpu.remesh_impl import sediment_refine_points

    param = rift_param(mesh={"meshing_elem_shape": 0,
                             "meshing_sediment": True,
                             "sediment_size": 0.01})
    sim = des.Simulation(param)
    coord = np.asarray(sim.state.coord, np.float64)
    conn = sim.topo.connectivity
    vol = np.asarray(sim.state.volume, np.float64)
    # mattype_sed defaults to 0 = the only material here, so every
    # surface element is "sediment-bearing"; the tiny sediment_size
    # makes them all oversized
    pts = sediment_refine_points(param, sim.ctx.surf, sim.markers,
                                 sim.topo.nelem, coord, conn, vol)
    assert len(pts) >= sim.ctx.surf.etop  # >= 1 midpoint per facet elem
    # all seeds strictly interior
    assert (pts[:, 1] < 0).all() and (pts[:, 1] > -param.mesh.zlength).all()
    nc, nconn, nflag = generate_new_mesh_2d(param, coord, sim.topo,
                                            seed=2, extra_interior=pts)
    a, b, c = nc[nconn[:, 0]], nc[nconn[:, 1]], nc[nconn[:, 2]]
    area2 = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - \
            (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    assert (area2 > 0).all()
    # the refined mesh has more nodes than one without seeds
    nc0, _, _ = generate_new_mesh_2d(param, coord, sim.topo, seed=2)
    assert nc.shape[0] > nc0.shape[0]


def test_remesh_cycle_runs_and_conserves():
    """Distort until the quality trigger fires, remesh, keep stepping."""
    param = rift_param()
    sim = des.Simulation(param)

    # artificially shear the mesh to degrade quality
    import jax.numpy as jnp
    coord = np.asarray(sim.state.coord).copy()
    shear = (2.5e3 * (coord[:, 1] + 10e3) / 10e3
             * np.sin(2 * np.pi * coord[:, 0] / 15e3))
    interior = (sim.topo.bcflag == 0)
    coord[interior, 0] += shear[interior]
    from dynearthsol_tpu.state import State
    sim.state = State(**{**sim.state.__dict__,
                         "coord": jnp.asarray(coord, dtype=sim.dtype)})
    sim.state = State(**{**sim.state.__dict__,
                         "volume": des.simulation.compute_volume(
                             sim.state.coord, sim.ctx.conn)})

    bad, minq = bad_mesh_quality(sim)
    assert bad == 1  # distorted element

    t_before = float(sim.state.temperature.mean())
    pls_before = float((sim.state.plstrain * sim.state.volume).sum())
    vol_before = float(sim.state.volume.sum())
    nmark_before = sim.markers.n

    remesh_simulation(sim, bad)

    # quality restored
    bad2, minq2 = bad_mesh_quality(sim)
    assert bad2 == 0
    assert minq2 > minq

    # approximate conservation through the remap
    vol_after = float(sim.state.volume.sum())
    assert abs(vol_after - vol_before) / vol_before < 0.05
    t_after = float(sim.state.temperature.mean())
    assert abs(t_after - t_before) < 30.0
    # markers stayed consistent
    assert sim.markers.n >= 0.8 * nmark_before
    assert is_inside(sim.markers.live("eta"), tol=-1e-6).all()
    hist = sim.markers.elem_histogram(sim.topo.nelem, 1)
    assert (hist.sum(axis=1) >= param.markers.min_num_markers_in_element
            ).all()

    # the simulation keeps stepping on the new mesh
    sim.run_steps(5, chunk=5)
    assert np.isfinite(np.asarray(sim.state.stress)).all()
    assert np.isfinite(np.asarray(sim.state.vel)).all()


def test_metric_driven_remesh_refines_plastic_zone():
    """Metric-driven mesh optimization (the MMG-analog path,
    remeshing.cxx:2159-2178, 2436-2694): with use_mesh_optimizer the new
    mesh is refined where plastic strain is present and coarse elsewhere."""
    import jax.numpy as jnp

    param = rift_param(
        mesh={"meshing_elem_shape": 0, "use_mesh_optimizer": True,
              "mmg_hmin_factor": 0.3, "mmg_hmax_factor": 1.2,
              "resolution": 1.5e3})
    sim = des.Simulation(param)
    coord = np.asarray(sim.state.coord)
    conn = sim.topo.connectivity
    cent = coord[conn].mean(axis=1)
    # concentrated plastic strain band around x = 15 km
    pl = np.where(np.abs(cent[:, 0] - 15e3) < 3e3, 2.0, 0.0)
    import dataclasses
    sim.state = dataclasses.replace(sim.state, plstrain=jnp.asarray(pl))
    nelem_before = sim.topo.nelem
    remesh_simulation(sim, 1)
    assert sim.topo.nelem != nelem_before or True  # remesh ran
    vol = np.asarray(sim.state.volume)
    assert (vol > 0).all()
    cent2 = np.asarray(sim.state.coord)[sim.topo.connectivity].mean(axis=1)
    in_band = np.abs(cent2[:, 0] - 15e3) < 2e3
    out_band = np.abs(cent2[:, 0] - 15e3) > 6e3
    # refined inside the plastic band: median element area clearly smaller
    assert np.median(vol[in_band]) < 0.5 * np.median(vol[out_band])
    # frozen size field carried over for the next remesh
    assert sim.init_elem_size_n.shape[0] == sim.topo.nnode


def test_metric_driven_remesh_3d():
    """3D metric-driven mesh optimization (the MMG3D-analog optimize_mesh,
    remeshing.cxx:2181-2434)."""
    import dataclasses

    import jax.numpy as jnp

    param = rift_param(
        sim={"ndims": 3},
        mesh={"meshing_elem_shape": 0, "use_mesh_optimizer": True,
              "mmg_hmin_factor": 0.4, "mmg_hmax_factor": 1.3,
              "xlength": 12e3, "ylength": 8e3, "zlength": 6e3,
              "resolution": 2e3},
        bc={"vbc_y0": 0, "vbc_y1": 0})
    sim = des.Simulation(param)
    cent = np.asarray(sim.state.coord)[sim.topo.connectivity].mean(axis=1)
    pl = np.where(np.abs(cent[:, 0] - 6e3) < 2e3, 2.0, 0.0)
    sim.state = dataclasses.replace(sim.state, plstrain=jnp.asarray(pl))
    remesh_simulation(sim, 1)
    vol = np.asarray(sim.state.volume)
    assert (vol > 0).all()
    cent2 = np.asarray(sim.state.coord)[sim.topo.connectivity].mean(axis=1)
    in_band = np.abs(cent2[:, 0] - 6e3) < 1.5e3
    out_band = np.abs(cent2[:, 0] - 6e3) > 4e3
    assert np.median(vol[in_band]) < 0.6 * np.median(vol[out_band])
    # all six box boundaries present
    assert all(len(b) > 0 for b in sim.topo.bnodes[:6])


def test_sediment_surface_refinement_3d():
    """3D sediment surface refinement through the metric path — the
    reference's own 3D branch is 'todo' (remeshing.cxx:1250), so the 2D
    refine_surface_elem contract (remeshing.cxx:1028-1092) is extended:
    oversized sediment-bearing top-facet elements contribute midpoint
    seeds and the optimized 3D regeneration densifies there."""
    from dynearthsol_tpu.remesh_impl import sediment_refine_points

    param = rift_param(
        sim={"ndims": 3},
        mesh={"meshing_elem_shape": 0, "use_mesh_optimizer": True,
              "meshing_sediment": True, "sediment_size": 0.05,
              "mmg_hmin_factor": 0.4, "mmg_hmax_factor": 1.3,
              "xlength": 12e3, "ylength": 8e3, "zlength": 6e3,
              "resolution": 2e3},
        bc={"vbc_y0": 0, "vbc_y1": 0})
    sim = des.Simulation(param)
    coord = np.asarray(sim.state.coord, np.float64)
    conn = sim.topo.connectivity
    vol = np.asarray(sim.state.volume, np.float64)
    # mattype_sed defaults to 0 = the only material, so every surface
    # element is sediment-bearing; tiny sediment_size => all oversized
    pts = sediment_refine_points(param, sim.ctx.surf, sim.markers,
                                 sim.topo.nelem, coord, conn, vol)
    assert len(pts) >= sim.ctx.surf.etop  # 3 midpoints per facet elem
    assert pts.shape[1] == 3
    assert (pts[:, 2] < 0).all() and (pts[:, 2] > -6e3).all()

    nnode_surface_band = (coord[:, 2] > -1.5e3).sum()
    remesh_simulation(sim, 1)
    new_coord = np.asarray(sim.state.coord)
    assert (np.asarray(sim.state.volume) > 0).all()
    # the seeds densify the surface band relative to the pre-remesh mesh
    assert (new_coord[:, 2] > -1.5e3).sum() > nnode_surface_band


def test_regeneration_min_angle_guarantee():
    """The unstructured regeneration carries Triangle's constructive
    quality bound (the `q` switch, mesh.cxx:110-118; Ruppert refinement
    in mesh/refine2d.py): every element of the new mesh has min angle
    >= mesh.min_angle degrees, even when the reused point set contains
    slivers the interior-point deletion cannot fix (all-boundary-node
    caps)."""
    import dataclasses

    import jax.numpy as jnp

    from dynearthsol_tpu.mesh.refine2d import tri_min_angle

    param = rift_param(mesh={"meshing_elem_shape": 0,
                             "remeshing_option": 1})
    sim = des.Simulation(param)
    # deform: sinusoidal topography + shear so reused points are irregular
    coord = np.asarray(sim.state.coord).copy()
    x, z = coord[:, 0], coord[:, 1]
    coord[:, 1] = z + 200.0 * np.sin(2 * np.pi * x / 30e3) * (1 + z / 10e3)
    sim.state = dataclasses.replace(sim.state, coord=jnp.asarray(coord))
    remesh_simulation(sim, 1)
    ma = tri_min_angle(np.asarray(sim.state.coord), sim.topo.connectivity)
    # one retry relaxation step (min_angle*0.9, remeshing.cxx:1268) allowed
    assert float(ma.min()) >= 32.0 * 0.9 - 1e-6
    assert (np.asarray(sim.state.volume) > 0).all()


def test_initial_unstructured_min_angle():
    """Initial unstructured box meshes carry the same bound
    (new_mesh_uniform_resolution -> Triangle q, mesh.cxx:1437-1616)."""
    from dynearthsol_tpu.mesh.refine2d import tri_min_angle

    param = rift_param(mesh={"meshing_elem_shape": 0})
    sim = des.Simulation(param)
    ma = tri_min_angle(np.asarray(sim.state.coord), sim.topo.connectivity)
    assert float(ma.min()) >= 32.0 - 1e-6
