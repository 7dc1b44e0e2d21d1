"""Monitor + earthquake/ATS subsystem tests (reference: monitor.cxx,
earthquake_state.cxx, ats_output_scheduler.cxx).  Drives the full CLI run()
on the reference's simple-shear RSF benchmark geometry and checks the
monitor CSV against the closed-form solution, like
tests/functional/2d-rsf-ats.sh does."""

import csv
import math
import os

import numpy as np

import dynearthsol_tpu as des
from dynearthsol_tpu.__main__ import run

VX_TOP = 1e-5
G_SHEAR = 200.0e6
COHESION = 1.0e6


def monitor_param(tmpdir, a=0.2, b=0.1, cv=1e-6, model=0, nsteps=300):
    prefix = os.path.join(str(tmpdir), "mon")
    return des.param_from_dict({
        "sim": {"modelname": os.path.join(str(tmpdir), "shear"),
                "max_steps": nsteps, "output_step_interval": nsteps,
                "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 1.0, "ylength": 0.0, "zlength": 1.0,
                 "resolution": 1.0, "quality_check_step_interval": 100},
        "markers": {"markers_per_element": 4},
        "control": {"gravity": 0.0, "fixed_dt": 1.0,
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
        "mat": {"rheology_type": "elasto-plastic-rate-state-friction",
                "is_plane_strain": True,
                "rho0": [1.0], "alpha": [0.0],
                "bulk_modulus": [2e8], "shear_modulus": [2e8],
                "pls0": [0.0], "pls1": [0.1],
                "cohesion0": [COHESION], "cohesion1": [COHESION],
                "friction_angle0": [30.0], "friction_angle1": [30.0],
                "dilation_angle0": [0.0], "dilation_angle1": [0.0],
                "max_tension": 5.67e6,
                "direct_a": [a], "evolution_b": [b],
                "characteristic_distance": [1e-3],
                "characteristic_velocity": [cv],
                "state_var_model": model},
        "monitor": {"enabled": True, "output_prefix": prefix,
                    "step_interval": 10, "num_points": 2,
                    "points_x": [1 / 3, 2 / 3],
                    "points_y": [-2 / 3, -1 / 3],
                    "points_unit": "m",
                    "remesh_rebind": "initial_coord",
                    "write_header": True,
                    "output_coord": False, "output_velocity": False,
                    "output_stress": True,
                    "output_dynamic_friction": True,
                    "output_state_variable": True},
    })


def test_monitor_csv_rsf_vs_analytic(tmp_path):
    param = monitor_param(tmp_path)
    run(param)

    fname = os.path.join(str(tmp_path), "mon_point_0.csv")
    assert os.path.exists(fname)
    with open(fname) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) >= 25
    cols = rows[0].keys()
    for want in ("step", "time_s", "stress_2", "dynamic_friction",
                 "state_variable"):
        assert want in cols, cols

    # steady-state RSF analytic shear stress at the last row
    # (check_simple_shear_benchmark.py)
    a, b, cv = 0.2, 0.1, 1e-6
    mu0 = math.tan(math.radians(30.0))
    veff = math.sqrt((VX_TOP / 3) * (2 * VX_TOP / 3))
    mu_ss = max(mu0 + (a - b) * math.log(veff / cv), 1e-6)
    phi_eff = math.atan(mu_ss)
    sphi = math.sin(phi_eff)
    nphi = (1 + sphi) / (1 - sphi)

    sxy = 0.0
    nsteps = int(rows[-1]["step"])
    for _ in range(nsteps):
        trial = sxy + 2.0 * G_SHEAR * 0.5 * VX_TOP
        y = -trial - trial * nphi + 2.0 * COHESION * math.sqrt(nphi)
        sxy = trial if y > 0 else trial + 2.0 * G_SHEAR * y / (
            2.0 * G_SHEAR * (1.0 + nphi))

    got = float(rows[-1]["stress_2"])
    assert abs(got - sxy) / abs(sxy) < 5e-2, (got, sxy)
    # row cadence respected
    steps = [int(r["step"]) for r in rows]
    assert all(s % 10 == 0 for s in steps)


def test_earthquake_state_tracking():
    from dynearthsol_tpu.earthquake import (EarthquakeState,
                                            update_earthquake_tracking)

    param = monitor_param("/tmp", nsteps=50)
    sim = des.Simulation(param)
    eq = EarthquakeState.init(param)
    sim.run_steps(20, chunk=10)
    update_earthquake_tracking(param, sim, eq)
    # shear loading at plate rate: no dynamic event
    assert isinstance(eq.in_earthquake_mode, bool)
