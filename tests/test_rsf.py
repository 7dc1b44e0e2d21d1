"""Rate-and-state friction benchmark (reference:
benchmarks/simple_shear_rsf/check_simple_shear_benchmark.py, tolerance 5e-2;
kernels matprops.cxx:343-552, rheology.cxx:107-233)."""

import math

import numpy as np
import pytest

import dynearthsol_tpu as des

VX_TOP = 1e-5
G_SHEAR = 200.0e6
COHESION = 1.0e6
DT = 1.0


def shear_param(rheology, phi_deg, a, b, dc, cv, model):
    return des.param_from_dict({
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 1.0, "ylength": 0.0, "zlength": 1.0,
                 "resolution": 1.0, "quality_check_step_interval": 100},
        "markers": {"markers_per_element": 4},
        "control": {"gravity": 0.0, "fixed_dt": DT,
                    "inertial_scaling": 1e5,
                    "use_global_velocity_scaling": True,
                    "damping_option": 1,
                    "has_thermal_diffusion": False},
        "ic": {"weakzone_option": 0},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0,
               "vbc_x1": 1, "vbc_val_x1": 0.0,
               "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 4, "vbc_val_z1": VX_TOP,
               "surface_temperature": 273.0, "mantle_temperature": 273.0},
        "mat": {"rheology_type": rheology, "is_plane_strain": True,
                "rho0": [1.0], "alpha": [0.0],
                "bulk_modulus": [2e8], "shear_modulus": [2e8],
                "pls0": [0.0], "pls1": [0.1],
                "cohesion0": [COHESION], "cohesion1": [COHESION],
                "friction_angle0": [phi_deg], "friction_angle1": [phi_deg],
                "dilation_angle0": [0.0], "dilation_angle1": [0.0],
                "max_tension": 5.67e6,
                "direct_a": [a], "evolution_b": [b],
                "characteristic_distance": [dc],
                "characteristic_velocity": [cv],
                "state_var_model": model},
    })


def effective_velocity():
    # geometric mean of the two elements' mean velocities
    # (check_simple_shear_benchmark.py:32-35)
    return math.sqrt((VX_TOP / 3.0) * (2.0 * VX_TOP / 3.0))


def analytic_shear(nsteps, nphi):
    """Elastic loading capped by the MC yield surface
    (check_simple_shear_benchmark.py analytical_ep)."""
    sxy = 0.0
    out = [0.0]
    for _ in range(nsteps):
        stress_el = sxy + 2.0 * G_SHEAR * 0.5 * VX_TOP * DT
        yield_fn = -stress_el - stress_el * nphi \
            + 2.0 * COHESION * math.sqrt(nphi)
        if yield_fn > 0.0:
            sxy = stress_el
        else:
            d_beta = yield_fn / (2.0 * G_SHEAR * (1.0 + nphi))
            sxy = stress_el + 2.0 * G_SHEAR * d_beta
        out.append(sxy)
    return np.asarray(out)


def run_case(rheology, phi_deg, a, b, dc, cv, model, nsteps):
    param = shear_param(rheology, phi_deg, a, b, dc, cv, model)
    sim = des.Simulation(param)
    assert sim.topo.nelem == 2
    traj = []
    for _ in range(nsteps // 10):
        sim.run_steps(10, chunk=10)
        traj.append(float(np.asarray(sim.state.stress)[:, 2].mean()))
    return sim, np.asarray(traj)


def test_ep_simple_shear_vs_analytic():
    phi = 30.0
    nsteps = 300
    sim, traj = run_case("elasto-plastic", phi, 0.0, 0.0, 1e-3, 1e-5, 0,
                         nsteps)
    sphi = math.sin(math.radians(phi))
    nphi = (1 + sphi) / (1 - sphi)
    ana = analytic_shear(nsteps, nphi)
    sim_final = traj[-1]
    ana_final = ana[-1]
    assert abs(sim_final - ana_final) / abs(ana_final) < 5e-2


@pytest.mark.parametrize("a,b,cv,model", [
    (0.2, 0.1, 1e-6, 0),   # steady, a-b > 0 (velocity strengthening)
    (0.2, 0.3, 1e-4, 0),   # steady, a-b < 0 (velocity weakening)
])
def test_rsf_steady_vs_analytic(a, b, cv, model):
    phi = 30.0
    nsteps = 300
    sim, traj = run_case("elasto-plastic-rate-state-friction", phi, a, b,
                         1e-3, cv, model, nsteps)
    mu0 = math.tan(math.radians(phi))
    mu_ss = max(mu0 + (a - b) * math.log(effective_velocity() / cv), 1e-6)
    phi_eff = math.atan(mu_ss)
    sphi = math.sin(phi_eff)
    nphi = (1 + sphi) / (1 - sphi)
    ana = analytic_shear(nsteps, nphi)
    assert abs(traj[-1] - ana[-1]) / abs(ana[-1]) < 5e-2, \
        f"sim {traj[-1]:.4e} vs analytic {ana[-1]:.4e}"
    # dynamic friction tracked in state
    dfc = np.asarray(sim.state.dyn_fric_coeff)
    assert abs(dfc.mean() - mu_ss) / mu_ss < 0.3


def analytic_aging(nsteps, phi_deg, a, b, dc, v0):
    """Aging-law trajectory (check_simple_shear_benchmark.py
    analytical_rsf_aging): explicit-Euler theta evolution feeding the
    MC cap through the rate-state friction coefficient."""
    mu0 = math.tan(math.radians(phi_deg))
    v = max(effective_velocity(), 1e-12)
    theta = dc / v0
    sxy = 0.0
    out = [0.0]
    for _ in range(nsteps):
        stress_el = sxy + 2.0 * G_SHEAR * 0.5 * VX_TOP * DT
        theta = max(theta + DT * (1.0 - v * theta / dc), 1e-30)
        mu = max(mu0 + a * math.log(v / v0)
                 + b * math.log(theta * v0 / dc), 1e-6)
        sphi = math.sin(math.atan(mu))
        nphi = (1 + sphi) / (1 - sphi)
        yield_fn = -stress_el - stress_el * nphi \
            + 2.0 * COHESION * math.sqrt(nphi)
        if yield_fn > 0.0:
            sxy = stress_el
        else:
            d_beta = yield_fn / (2.0 * G_SHEAR * (1.0 + nphi))
            sxy = stress_el + 2.0 * G_SHEAR * d_beta
        out.append(sxy)
    return np.asarray(out)


def test_rsf_aging_vs_analytic():
    """Aging-law (state_var_model 1) trajectory gate at the reference's
    CI case aging_ab_neg_dc_1e-6 and tolerance (5e-2,
    run_simple_shear_benchmark.py:41)."""
    phi, a, b, dc, v0 = 30.0, 0.2, 0.3, 1e-6, 1e-5
    nsteps = 300
    sim, traj = run_case("elasto-plastic-rate-state-friction", phi, a, b,
                         dc, v0, 1, nsteps)
    ana = analytic_aging(nsteps, phi, a, b, dc, v0)
    ana_s = ana[10::10]  # run_case samples every 10 steps
    scale = max(np.abs(ana_s).max(), 1.0)
    rel = np.abs(np.abs(traj) - np.abs(ana_s)).max() / scale
    assert rel < 5e-2, f"max rel err {rel:.3e}"
    sv = np.asarray(sim.state.state_variable)
    assert (sv > 0).all() and np.isfinite(sv).all()
