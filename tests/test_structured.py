"""Structured-grid stencil fast path (ops/structured.py): the slice-based
corner gather / nodal assembly must match conn-indexed forms exactly, and a
full step on a structured mesh must match the generic gather path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynearthsol_tpu as des
from dynearthsol_tpu.mesh.generate import regular_grid_2d
from dynearthsol_tpu.ops.structured import (detect_structured_2d,
                                            gather_corners_2d,
                                            scatter_corners_2d)
from dynearthsol_tpu.simulation import make_step_fn


@pytest.mark.parametrize("equilateral", [False, True])
def test_gather_scatter_match_conn(equilateral):
    m = regular_grid_2d(10e3, 5e3, 10e3 / 16, equilateral=equilateral)
    sg = detect_structured_2d(m.connectivity, m.nnode)
    assert sg == (17, 9)
    nx, nz = sg
    rng = np.random.default_rng(0)

    nodal = rng.normal(size=(m.nnode, 3))
    got = np.asarray(gather_corners_2d(jnp.asarray(nodal), nx, nz))
    np.testing.assert_array_equal(nodal[m.connectivity], got)
    n1 = rng.normal(size=m.nnode)
    np.testing.assert_array_equal(
        n1[m.connectivity],
        np.asarray(gather_corners_2d(jnp.asarray(n1), nx, nz)))

    contrib = rng.normal(size=(m.nelem, 3, 2))
    ref = np.zeros((m.nnode, 2))
    np.add.at(ref, m.connectivity.ravel(),
              contrib.reshape(-1, 2))
    got2 = np.asarray(scatter_corners_2d(jnp.asarray(contrib), nx, nz))
    np.testing.assert_allclose(ref, got2, rtol=1e-12)
    c1 = rng.normal(size=(m.nelem, 3))
    r1 = np.zeros(m.nnode)
    np.add.at(r1, m.connectivity.ravel(), c1.ravel())
    np.testing.assert_allclose(
        r1, np.asarray(scatter_corners_2d(jnp.asarray(c1), nx, nz)),
        rtol=1e-12)


def test_detect_rejects_unstructured():
    from dynearthsol_tpu.mesh.generate import unstructured_box_2d

    m = unstructured_box_2d(10e3, 5e3, 10e3 / 8)
    assert detect_structured_2d(m.connectivity, m.nnode) is None


def _small_sim():
    param = des.param_from_dict({
        "sim": {"ndims": 2},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10e3, "ylength": 0.0, "zlength": 5e3,
                 "resolution": 10e3 / 16,
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    })
    return des.Simulation(param)


def test_step_structured_matches_gather_path():
    sim = _small_sim()
    assert sim.ctx.sgrid == (17, 9)
    step = make_step_fn(sim.param)
    s_fast = jax.jit(step)(sim.ctx, sim.state)
    ctx_gen = dataclasses.replace(sim.ctx, sgrid=None)
    s_ref = jax.jit(step)(ctx_gen, sim.state)
    for f in ["coord", "vel", "stress", "strain", "temperature",
              "plstrain", "volume", "mass", "dt"]:
        a = np.asarray(getattr(s_fast, f))
        b = np.asarray(getattr(s_ref, f))
        scale = max(float(np.abs(b).max()), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-5, f


def test_grid_step_matches_generic_f64():
    """Plane-layout structured step (ops/grid2d.py) vs the generic step:
    exact-math parity over 50 steps in f64 (f32 diverges via the
    sign-sensitive damping, like the reference's OMP>1 runs)."""
    import dynearthsol_tpu.ops.grid2d as grid2d

    def mk():
        param = des.param_from_dict({
            "sim": {"ndims": 2, "float_dtype": "float64"},
            "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                     "xlength": 10e3, "ylength": 0.0, "zlength": 5e3,
                     "resolution": 10e3 / 16,
                     "quality_check_step_interval": 10**8},
            "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                        "has_thermal_diffusion": True},
            "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
                   "vbc_x1": 1, "vbc_val_x1": 1e-9},
            "mat": {"rheology_type": "elasto-visco-plastic",
                    "is_plane_strain": True,
                    "rho0": [2800.0], "bulk_modulus": [50e9],
                    "shear_modulus": [30e9],
                    "visc_max": 1e24, "visc_min": 1e19},
        })
        return des.Simulation(param)

    sim1 = mk()
    assert grid2d.grid_step_applicable(sim1.param, sim1.ctx)
    sim1.run_steps(50, chunk=25)

    sim2 = mk()
    sim2.ctx = dataclasses.replace(sim2.ctx, sgrid=None)  # generic path
    sim2.run_steps(50, chunk=25)

    for f in ["coord", "vel", "stress", "stressyy", "strain",
              "strain_rate", "temperature", "plstrain", "delta_plstrain",
              "viscosity", "dpressure", "volume", "volume_n", "mass",
              "tmass", "hmass", "ymass", "force", "edvoldt", "dt", "time"]:
        a = np.asarray(getattr(sim1.state, f))
        b = np.asarray(getattr(sim2.state, f))
        scale = max(float(np.abs(b).max()), 1e-30)
        # 1e-8: dpressure is a difference of large stresses, so sum-order
        # roundoff (the asm orderings differ) amplifies through cancellation
        assert np.abs(a - b).max() / scale < 1e-8, f


def _sim3d(dtype="float64"):
    param = des.param_from_dict({
        "sim": {"ndims": 3, "float_dtype": dtype},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10e3, "ylength": 8e3, "zlength": 5e3,
                 "resolution": 10e3 / 8,
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": False,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    })
    return des.Simulation(param)


def test_grid3d_step_matches_generic():
    """3D plane step (ops/grid3d.py) vs the generic step: exact single-step
    parity, and 50-step agreement within f64 roundoff amplification."""
    import dynearthsol_tpu.ops.grid3d as grid3d
    from dynearthsol_tpu.simulation import make_step_fn

    sim = _sim3d()
    assert sim.ctx.sgrid == (9, 7, 5)
    assert grid3d.grid_step_applicable(sim.param, sim.ctx)
    nx, ny, nz = sim.ctx.sgrid

    gstep = grid3d.make_grid_step(sim.param, sim.ctx,
                                  sim.compensation_pressure)
    g1 = jax.jit(gstep)(sim.ctx, grid3d.state_to_grid(sim.state,
                                                      nx, ny, nz))
    s_grid = grid3d.grid_to_state(g1, nx, ny, nz)
    s_ref = jax.jit(make_step_fn(sim.param, sim.compensation_pressure))(
        sim.ctx, sim.state)
    for f in ["coord", "vel", "stress", "strain", "strain_rate",
              "temperature", "plstrain", "viscosity", "dpressure",
              "volume", "volume_n", "mass", "tmass", "hmass", "ymass",
              "force", "edvoldt", "dt"]:
        a = np.asarray(getattr(s_grid, f))
        b = np.asarray(getattr(s_ref, f))
        scale = max(float(np.abs(b).max()), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-12, f

    sim1 = _sim3d()
    sim1.run_steps(50, chunk=25)
    sim2 = _sim3d()
    sim2.ctx = dataclasses.replace(sim2.ctx, sgrid=None)
    sim2.run_steps(50, chunk=25)
    for f in ["coord", "vel", "stress", "strain", "temperature",
              "plstrain", "volume", "mass", "dt", "time"]:
        a = np.asarray(getattr(sim1.state, f))
        b = np.asarray(getattr(sim2.state, f))
        scale = max(float(np.abs(b).max()), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-6, f


def _production2d_param():
    """examples/rifting-2d.cfg feature shape: surface diffusion + surface
    element correction + Winkler + water loading, EVP, f64."""
    return des.param_from_dict({
        "sim": {"ndims": 2, "float_dtype": "float64"},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10e3, "ylength": 0.0, "zlength": 5e3,
                 "resolution": 10e3 / 16,
                 "quality_check_step_interval": 7},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True, "damping_option": 1,
                    "surface_process_option": 1,
                    "surface_diffusivity": 1e-6,
                    "has_surface_correction": True},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9,
               "has_winkler_foundation": True, "has_water_loading": True,
               "winkler_delta_rho": 100.0},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    })


def test_grid2d_surface_production_matches_generic():
    """grid2d applies surface processes in-step (the gate widening that
    keeps production configs on the plane path): trajectory parity vs
    the generic gather step over 20 steps, incl. the dh accumulators."""
    import dynearthsol_tpu.ops.grid2d as grid2d

    sim = des.Simulation(_production2d_param())
    assert grid2d.grid_step_applicable(sim.param, sim.ctx)
    nx, nz = sim.ctx.sgrid
    gstep = jax.jit(grid2d.make_grid_step(sim.param, sim.ctx,
                                          sim.compensation_pressure))
    g = grid2d.state_to_grid(sim.state, nx, nz)
    for _ in range(20):
        g = gstep(sim.ctx, g)
    out = grid2d.grid_to_state(g, nx, nz)

    step = jax.jit(make_step_fn(sim.param, sim.compensation_pressure))
    ref = sim.state
    for _ in range(20):
        ref = step(sim.ctx, ref)

    for f in ["coord", "vel", "stress", "stressyy", "strain",
              "temperature", "plstrain", "delta_plstrain", "viscosity",
              "volume", "volume_old", "mass", "force", "dhacc",
              "edvacc_surf", "dt", "time"]:
        a = np.asarray(getattr(out, f))
        b = np.asarray(getattr(ref, f))
        scale = max(float(np.abs(b).max()), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-10, f


def test_grid3d_surface_production_matches_generic():
    """grid3d with surface diffusion + surface correction + Winkler/water:
    trajectory parity vs the generic step (3D production feature set on
    the plane path)."""
    import dynearthsol_tpu.ops.grid3d as grid3d

    param = des.param_from_dict({
        "sim": {"ndims": 3, "float_dtype": "float64"},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 8e3, "ylength": 4e3, "zlength": 4e3,
                 "resolution": 1e3,
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True, "damping_option": 1,
                    "surface_process_option": 1,
                    "surface_diffusivity": 1e-6,
                    "has_surface_correction": True},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9,
               "vbc_y0": 1, "vbc_val_y0": 0.0,
               "vbc_y1": 1, "vbc_val_y1": 0.0,
               "has_winkler_foundation": True, "has_water_loading": True,
               "winkler_delta_rho": 100.0},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": False,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    })
    sim = des.Simulation(param)
    assert grid3d.grid_step_applicable(sim.param, sim.ctx)
    nx, ny, nz = sim.ctx.sgrid
    gstep = jax.jit(grid3d.make_grid_step(sim.param, sim.ctx,
                                          sim.compensation_pressure))
    g = grid3d.state_to_grid(sim.state, nx, ny, nz)
    for _ in range(20):
        g = gstep(sim.ctx, g)
    out = grid3d.grid_to_state(g, nx, ny, nz)

    step = jax.jit(make_step_fn(sim.param, sim.compensation_pressure))
    ref = sim.state
    for _ in range(20):
        ref = step(sim.ctx, ref)

    for f in ["coord", "vel", "stress", "strain", "temperature",
              "plstrain", "viscosity", "volume", "volume_old", "mass",
              "force", "dhacc", "edvacc_surf", "dt", "time"]:
        a = np.asarray(getattr(out, f))
        b = np.asarray(getattr(ref, f))
        scale = max(float(np.abs(b).max()), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-10, f


def test_grid2d_surface_102_matches_generic():
    """Option 102 (diffusion + terrigenous basin fill + hemi/pelagic
    rain) through the grid2d in-step surface call, vs generic."""
    import dynearthsol_tpu.ops.grid2d as grid2d

    param = _production2d_param()
    param.control.surface_process_option = 102
    param.control.terrig_sediment_area = 3.17e-7
    sim = des.Simulation(param)
    assert grid2d.grid_step_applicable(sim.param, sim.ctx)
    nx, nz = sim.ctx.sgrid
    gstep = jax.jit(grid2d.make_grid_step(sim.param, sim.ctx,
                                          sim.compensation_pressure))
    g = grid2d.state_to_grid(sim.state, nx, nz)
    for _ in range(15):
        g = gstep(sim.ctx, g)
    out = grid2d.grid_to_state(g, nx, nz)

    step = jax.jit(make_step_fn(sim.param, sim.compensation_pressure))
    ref = sim.state
    for _ in range(15):
        ref = step(sim.ctx, ref)

    for f in ["coord", "vel", "stress", "plstrain", "dhacc",
              "edvacc_surf", "dt", "time"]:
        a = np.asarray(getattr(out, f))
        b = np.asarray(getattr(ref, f))
        scale = max(float(np.abs(b).max()), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-10, f
