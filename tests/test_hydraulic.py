"""Hydraulic (pore-pressure) diffusion tests.

Analytic gate: a cosine-mode excess pore pressure in a 1D column with a
drained top (hbc_z1=1) and undrained bottom decays as
exp(-c_v (pi/2H)^2 t) — the first Terzaghi consolidation mode
(cf. benchmarks/1d-consolidation*.cfg; kernel fields.cxx:297-406)."""

import numpy as np

import dynearthsol_tpu as des


def column_param():
    return des.param_from_dict({
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 4.0, "ylength": 0.0, "zlength": 10.0,
                 "resolution": 1.0, "quality_check_step_interval": 10**8},
        "markers": {"markers_per_element": 4},
        "control": {"gravity": 10.0, "inertial_scaling": 1e8,
                    "damping_option": 1, "damping_factor": 0.3,
                    # the 0.5 h^2/D CFL bound is marginal for P1 FEM when
                    # the dt-limit diffusivity equals the scheme diffusivity
                    # (here, biot=0); halve it like the reference configs do
                    "dt_fraction": 0.5,
                    "has_hydraulic_diffusion": True,
                    "has_moving_mesh": False,
                    "has_thermal_diffusion": False},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0, "vbc_x1": 1,
               "vbc_val_x1": 0.0, "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 0,
               "hbc_z1": 1,
               "surface_temperature": 273.0, "mantle_temperature": 273.0},
        "mat": {"rheology_type": "elastic", "rho0": [2650.0],
                "bulk_modulus": [1e7], "shear_modulus": [1e7],
                "porosity": [0.3], "hydraulic_perm": [1.03e-12],
                "fluid_rho0": [1000.0], "fluid_alpha": [2.07e-4],
                # biot_coeff 0 + compressible fluid: decouples the
                # poroelastic feedback so the decay rate is the pure
                # diffusion constant of the scheme (see test below)
                "fluid_bulk_modulus": [1e5], "fluid_visc": [1.002e-3],
                "biot_coeff": [0.0], "bulk_modulus_s": [37e9]},
    })


def test_initial_hydrostatic_state():
    param = column_param()
    sim = des.Simulation(param)
    pp = np.asarray(sim.state.ppressure)
    z = np.asarray(sim.state.coord)[:, 1]
    assert np.allclose(pp, -1000.0 * 10.0 * z)


def test_pore_pressure_mode_decay():
    import jax.numpy as jnp
    from dynearthsol_tpu.state import State

    param = column_param()
    sim = des.Simulation(param)
    coord = np.asarray(sim.state.coord)
    z = coord[:, 1]
    H = 10.0
    zeta = -z  # depth below the drained top

    # the scheme's storage: hmass = (hm_coeff*bulk_comp + phi*beta_f)*V/npe
    # (geometry.cxx:1111-1117); with biot_coeff = 0 there is no poroelastic
    # feedback and the decay constant is c_v = k/(mu * S)
    perm, mu, phi, alpha = 1.03e-12, 1.002e-3, 0.3, 0.0
    beta_f = 1.0 / 1e5
    bulk_comp = 1.0 / (1e7 + 1e7 / 3.0)  # 2D: lambda + G
    hm_coeff = alpha + phi - alpha * phi
    S = hm_coeff * bulk_comp + phi * beta_f
    cv = perm / (mu * S)

    A = 1e4
    mode = A * np.sin(np.pi * zeta / (2 * H))
    pp0 = np.asarray(sim.state.ppressure) + mode
    sim.state = State(**{**sim.state.__dict__,
                         "ppressure": jnp.asarray(pp0, dtype=sim.dtype)})

    sim.run_steps(400, chunk=200)
    t = float(sim.state.time)
    decay = np.exp(-cv * (np.pi / (2 * H)) ** 2 * t)
    assert decay < 0.9  # the test ran long enough to mean something

    pp = np.asarray(sim.state.ppressure)
    excess = pp - (-1000.0 * 10.0 * z)
    # compare against the analytic decayed mode away from the top boundary
    sel = zeta > 1.5
    expect = A * np.sin(np.pi * zeta[sel] / (2 * H)) * decay
    err = np.abs(excess[sel] - expect).max() / A
    assert err < 0.05, f"mode-decay error {err:.3f}"


def test_pp_bc_mask():
    from dynearthsol_tpu.bc import pp_bc_mask
    from dynearthsol_tpu.constants import BOUNDZ1

    param = column_param()
    sim = des.Simulation(param)
    mask = pp_bc_mask(param.bc, sim.topo.bcflag)
    top = (sim.topo.bcflag & BOUNDZ1) != 0
    assert (mask == top).all()
