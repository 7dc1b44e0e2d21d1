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
