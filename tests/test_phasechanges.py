"""Phase-change + hydrous-marker tests (phasechanges.cxx,
markerset.cxx:1887-1955)."""

import numpy as np

import dynearthsol_tpu as des
from dynearthsol_tpu.phasechanges import (MT_ECLOGITE, MT_MANTLE,
                                          MT_OCEANIC_CRUST, MT_SCHIST,
                                          MT_SEDIMENT,
                                          MT_SERPENTINIZED_MANTLE,
                                          advect_hydrous_markers,
                                          phase_changes)


def subduction_param():
    nmat = 8
    return des.param_from_dict({
        "sim": {"ndims": 2, "float_dtype": "float64"},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 40e3, "ylength": 0.0, "zlength": 40e3,
                 "resolution": 5e3, "quality_check_step_interval": 10**8},
        "markers": {"markers_per_element": 4, "random_seed": 2},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_hydration_processes": True,
                    "hydration_migration_speed": 3e-9},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0, "vbc_x1": 1,
               "vbc_val_x1": 0.0, "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False,
               "surface_temperature": 273.0,
               "mantle_temperature": 1600.0},
        "ic": {"num_mattype_layers": 1, "layer_mattypes": [2],
               "mattype_layer_depths": [], "oceanic_plate_age_in_yr": 1e5},
        "mat": {"rheology_type": "elastic", "nmat": nmat,
                "phase_change_option": 1,
                "rho0": [3210.0], "bulk_modulus": [128e9],
                "shear_modulus": [80e9]},
    })


def test_basalt_to_eclogite():
    param = subduction_param()
    sim = des.Simulation(param)
    ms = sim.markers
    assert (ms.live("mattype") == MT_OCEANIC_CRUST).all()

    # force hot, deep conditions: eclogite transition needs T>773 K and
    # P > -0.3e9 + 2.2e6 T
    import jax.numpy as jnp
    from dynearthsol_tpu.state import State

    T = np.full(sim.topo.nnode, 1000.0 + 273.0)
    sim.state = State(**{**sim.state.__dict__,
                         "temperature": jnp.asarray(T, dtype=sim.dtype)})
    # at depth >= ~80 km P = rho g h > 2.5e9; our box is 40 km deep with
    # rho=3210 -> P up to 1.28e9 < threshold 2.5e9.  Deep markers stay
    # basalt; verify NO transition first.
    phase_changes(sim)
    assert (sim.markers.live("mattype") == MT_OCEANIC_CRUST).all()
    # dehydration released hydrous markers (T > 423 K everywhere)
    assert sim.hydrous_markers is not None
    assert sim.hydrous_markers.n == sim.markers.n

    # now with a mantle-density column 100 km deep the transition happens:
    param2 = subduction_param()
    param2.mesh.zlength = 150e3
    param2.mesh.resolution = 25e3
    sim2 = des.Simulation(param2)
    T = np.full(sim2.topo.nnode, 1000.0 + 273.0)
    sim2.state = State(**{**sim2.state.__dict__,
                          "temperature": jnp.asarray(T, dtype=sim2.dtype)})
    phase_changes(sim2)
    mt = sim2.markers.live("mattype")
    z = sim2.markers.coords(np.asarray(sim2.state.coord),
                            sim2.topo.connectivity)[:, 1]
    deep = z < -90e3
    assert (mt[deep] == MT_ECLOGITE).all()
    assert (mt[~deep] != MT_ECLOGITE).any()
    # emw updated on device
    emw = np.asarray(sim2.state.emw)
    assert emw[:, MT_ECLOGITE].sum() == (mt == MT_ECLOGITE).sum()


def test_hydrous_marker_advection():
    param = subduction_param()
    sim = des.Simulation(param)
    import jax.numpy as jnp
    from dynearthsol_tpu.state import State

    T = np.full(sim.topo.nnode, 500.0)  # warm enough to dehydrate
    sim.state = State(**{**sim.state.__dict__,
                         "temperature": jnp.asarray(T, dtype=sim.dtype)})
    phase_changes(sim)
    hyd = sim.hydrous_markers
    assert hyd is not None and hyd.n > 0

    coord = np.asarray(sim.state.coord)
    from dynearthsol_tpu.barycentric import bary_to_coord
    p0 = bary_to_coord(coord, sim.topo.connectivity, hyd.live("elem"),
                       hyd.live("eta"))
    n0 = hyd.n
    dt_total = 1e12  # 3e-9 m/s * 1e12 s = 3000 m rise
    advect_hydrous_markers(sim, dt_total)
    p1 = bary_to_coord(coord, sim.topo.connectivity, hyd.live("elem"),
                       hyd.live("eta"))
    # surviving markers rose by ~3000 m
    rises = p1[:, 1].mean() - p0[: hyd.n, 1].mean()
    assert 2000.0 < rises < 4000.0 or hyd.n < n0
    # markers above the surface were deleted
    assert (p1[:, 1] <= 1e-6).all()
