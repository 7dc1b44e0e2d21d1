"""Unstructured SoA column step (ops/flat2d.py) vs the generic step.

The flat step reuses the generic step's formulas and the SAME per-node
summation order (degree-unrolled gather over the node_sum support
table), so in f64 it must reproduce the generic trajectory to fp
roundoff on an unstructured Delaunay mesh."""

import numpy as np
import pytest

import dynearthsol_tpu as des
from dynearthsol_tpu.ops import flat2d


def mk_param(rheo="elasto-visco-plastic", **over):
    d = {
        "sim": {"ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 0,
                 "xlength": 16e3, "ylength": 0.0, "zlength": 8e3,
                 "resolution": 1e3, "quality_check_step_interval": 7},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True, "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9, "vbc_x1": 1,
               "vbc_val_x1": 1e-9, "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": rheo, "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9], "visc_max": 1e24,
                "visc_min": 1e19},
    }
    for sec, kv in over.items():
        d.setdefault(sec, {}).update(kv)
    return des.param_from_dict(d)


FIELDS = ("coord", "vel", "temperature", "stress", "stressyy", "strain",
          "strain_rate", "plstrain", "delta_plstrain", "viscosity",
          "volume", "volume_old", "volume_n", "mass", "tmass", "hmass",
          "ymass", "force", "edvoldt", "dt", "time",
          "max_global_vel_mag", "global_dt_min", "l2_residual")


def run_both(param, n=20):
    import jax
    from dynearthsol_tpu.simulation import make_step_fn

    sim = des.Simulation(param)
    assert flat2d.flat_step_applicable(sim.param, sim.ctx)
    step = jax.jit(make_step_fn(param, sim.compensation_pressure))
    ref = sim.state
    for _ in range(n):
        ref = step(sim.ctx, ref)

    run = flat2d.make_chunk_runner(param, sim.ctx,
                                   sim.compensation_pressure, n)
    out = run(sim.ctx, sim.state)
    return ref, out


def assert_match(ref, out, tol=1e-12):
    for f in FIELDS:
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        b = np.asarray(getattr(out, f), dtype=np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        err = np.abs(a - b).max() / scale
        assert err < tol, (f, err)


def test_flat_matches_generic_evp():
    ref, out = run_both(mk_param())
    assert_match(ref, out)


def test_flat_matches_generic_maxwell_surface_correction():
    ref, out = run_both(mk_param(
        rheo="maxwell",
        control={"has_surface_correction": True}))
    assert_match(ref, out)


def test_flat_matches_generic_surface_processes():
    """In-step surface diffusion + sedimentation (option 102) plus the
    surface element correction, vs the generic step."""
    ref, out = run_both(mk_param(
        control={"surface_process_option": 102,
                 "surface_diffusivity": 1e-6,
                 "has_surface_correction": True,
                 "terrig_sediment_area": 3.17e-7}))
    assert_match(ref, out)
    a = np.asarray(ref.dhacc)
    b = np.asarray(out.dhacc)
    assert np.abs(a - b).max() <= 1e-12 * max(np.abs(a).max(), 1e-300)


def mk_param3d(rheo="elasto-visco-plastic"):
    return des.param_from_dict({
        "sim": {"ndims": 3, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 0,
                 "xlength": 8e3, "ylength": 4e3, "zlength": 4e3,
                 "resolution": 1e3, "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True, "damping_option": 1,
                    "has_surface_correction": True},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9, "vbc_x1": 1,
               "vbc_val_x1": 1e-9, "vbc_y0": 1, "vbc_val_y0": 0.0,
               "vbc_y1": 1, "vbc_val_y1": 0.0,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "ic": {"weakzone_option": 0 if rheo == "maxwell" else 1},
        "mat": {"rheology_type": rheo, "is_plane_strain": False,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9], "visc_max": 1e24,
                "visc_min": 1e19},
    })


def run_both3d(param, n):
    import jax
    from dynearthsol_tpu.ops import flat3d
    from dynearthsol_tpu.simulation import make_step_fn

    sim = des.Simulation(param)
    assert flat3d.flat3d_step_applicable(sim.param, sim.ctx)
    step = jax.jit(make_step_fn(param, sim.compensation_pressure))
    ref = sim.state
    for _ in range(n):
        ref = step(sim.ctx, ref)
    run = flat3d.make_chunk_runner(param, sim.ctx,
                                   sim.compensation_pressure, n)
    out = run(sim.ctx, sim.state)
    return ref, out


def test_flat3d_matches_generic_maxwell():
    """15-step trajectory gate, branch-free rheology (the 3D EVP
    min-select amplifies the one-ulp reduce-order difference between
    XLA's tree-sum and the flat fold ~1000x/step — same bistability as
    tests/test_pallas3d.py documents)."""
    ref, out = run_both3d(mk_param3d("maxwell"), 15)
    assert_match(ref, out, tol=1e-11)


def test_flat3d_matches_generic_hydraulic():
    """3D Biot diffusion through the flat path (short horizon, f64)."""
    p = mk_param3d("maxwell")
    p.control.has_hydraulic_diffusion = True
    p.mat.porosity = [0.1]
    p.mat.hydraulic_perm = [1e-15]
    p.mat.biot_coeff = [0.8]
    ref, out = run_both3d(p, 10)
    assert_match(ref, out, tol=1e-11)
    pp_scale = np.abs(np.asarray(ref.ppressure, np.float64)).max()
    for f in ("ppressure", "dppressure", "hydro_diff_max"):
        a = np.asarray(getattr(ref, f), np.float64)
        b = np.asarray(getattr(out, f), np.float64)
        # dppressure is the per-step increment (~1e-7 of ppressure):
        # judge it against the pressure scale, not its own tiny scale
        scale = pp_scale if f == "dppressure" \
            else max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() <= 1e-11 * scale, f


def test_flat3d_matches_generic_surface_diffusion():
    """3D in-step surface diffusion (facet-FEM dh, bc.cxx 3D branch)
    through the flat path."""
    p = mk_param3d("maxwell")
    p.control.surface_process_option = 1
    p.control.surface_diffusivity = 1e-6
    p.control.has_surface_correction = True
    ref, out = run_both3d(p, 10)
    assert_match(ref, out, tol=1e-11)
    a = np.asarray(ref.dhacc)
    b = np.asarray(out.dhacc)
    assert np.abs(a - b).max() <= 1e-11 * max(np.abs(a).max(), 1e-300)


def test_flat3d_matches_generic_evp_short():
    """3-step EVP gate: exercises eig3 plasticity + min-select before
    the branch-flip amplification overtakes roundoff (8e-14 measured)."""
    ref, out = run_both3d(mk_param3d(), 3)
    assert_match(ref, out, tol=1e-12)


def test_flat_matches_generic_hydraulic():
    """Biot poroelastic diffusion through the flat path: effective
    stress, pore-pressure update, and the hydraulic dt limit."""
    ref, out = run_both(mk_param(
        rheo="maxwell",
        control={"has_hydraulic_diffusion": True},
        mat={"porosity": [0.1], "hydraulic_perm": [1e-15],
             "fluid_bulk_modulus": [2.2e9], "biot_coeff": [0.8]}))
    assert_match(ref, out)
    for f in ("ppressure", "dppressure", "old_mean_stress",
              "hydro_diff_max"):
        a = np.asarray(getattr(ref, f), np.float64)
        b = np.asarray(getattr(out, f), np.float64)
        assert np.abs(a - b).max() <= 1e-12 * max(np.abs(a).max(),
                                                  1e-300), f


def test_flat_matches_generic_winkler_water():
    """Facet tractions (Winkler foundation + water loading,
    bc.cxx:632-875) apply to the flat path's assembled nodal force
    exactly as in the generic step."""
    ref, out = run_both(mk_param(
        rheo="maxwell",
        bc={"has_winkler_foundation": True, "has_water_loading": True,
            "winkler_delta_rho": 100.0}))
    # 1e-10: the generic path computes force contributions via einsum
    # (different mul/add association than the explicit column products),
    # and the Winkler feedback amplifies the 1-ulp difference over 20
    # steps to ~1.5e-11
    assert_match(ref, out, tol=1e-10)


def test_flat_matches_generic_rsf():
    """Rate-state friction through the flat path (simple-shear geometry
    on an unstructured mesh): slip rate, state evolution, dynamic
    friction feeding the MC cap."""
    param = des.param_from_dict({
        "sim": {"ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 0,
                 "xlength": 1.0, "ylength": 0.0, "zlength": 1.0,
                 "resolution": 1.0, "quality_check_step_interval": 10**8},
        "control": {"gravity": 0.0, "fixed_dt": 1.0,
                    "inertial_scaling": 1e5,
                    "use_global_velocity_scaling": True,
                    "damping_option": 1,
                    "has_thermal_diffusion": False},
        "ic": {"weakzone_option": 0},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0,
               "vbc_x1": 1, "vbc_val_x1": 0.0,
               "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 4, "vbc_val_z1": 1e-5},
        "mat": {"rheology_type": "elasto-plastic-rate-state-friction",
                "is_plane_strain": True,
                "rho0": [1.0], "alpha": [0.0],
                "bulk_modulus": [2e8], "shear_modulus": [2e8],
                "cohesion0": [1e6], "cohesion1": [1e6],
                "friction_angle0": [30.0], "friction_angle1": [30.0],
                "direct_a": [0.2], "evolution_b": [0.1],
                "characteristic_distance": [1e-3],
                "characteristic_velocity": [1e-6],
                "state_var_model": 0},
    })
    import jax
    from dynearthsol_tpu.simulation import make_step_fn

    sim = des.Simulation(param)
    assert flat2d.flat_step_applicable(sim.param, sim.ctx)
    step = jax.jit(make_step_fn(param, sim.compensation_pressure))
    ref = sim.state
    for _ in range(30):
        ref = step(sim.ctx, ref)
    run = flat2d.make_chunk_runner(param, sim.ctx,
                                   sim.compensation_pressure, 30)
    out = run(sim.ctx, sim.state)
    # stressyy and edvoldt are identically ~0 here (pure isochoric
    # shear): judge their roundoff against the natural scales (stress,
    # strain rate), not their own ~1e-14 cancellation noise
    fields = tuple(f for f in FIELDS if f not in ("stressyy", "edvoldt"))
    for f in fields:
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        b = np.asarray(getattr(out, f), dtype=np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-10, f
    syy = np.abs(np.asarray(ref.stressyy) - np.asarray(out.stressyy))
    assert syy.max() <= 1e-10 * np.abs(np.asarray(ref.stress)).max()
    edv = np.abs(np.asarray(ref.edvoldt) - np.asarray(out.edvoldt))
    assert edv.max() <= 1e-10 * np.abs(np.asarray(ref.strain_rate)).max()
    for f in ("dyn_fric_coeff", "state_variable"):
        a = np.asarray(getattr(ref, f), np.float64)
        b = np.asarray(getattr(out, f), np.float64)
        assert np.abs(a - b).max() <= 1e-10 * max(np.abs(a).max(),
                                                  1e-300), f


def test_flat3d_matches_generic_rsf():
    """3D rate-state friction through the flat path (slip projected in
    the principal frame, rheology.cxx:151-194)."""
    param = des.param_from_dict({
        "sim": {"ndims": 3, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 0,
                 "xlength": 1.0, "ylength": 1.0, "zlength": 1.0,
                 "resolution": 1.0, "quality_check_step_interval": 10**8},
        "control": {"gravity": 0.0, "fixed_dt": 1.0,
                    "inertial_scaling": 1e5,
                    "use_global_velocity_scaling": True,
                    "damping_option": 1,
                    "has_thermal_diffusion": False},
        "ic": {"weakzone_option": 0},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0,
               "vbc_x1": 1, "vbc_val_x1": 0.0,
               "vbc_y0": 1, "vbc_val_y0": 0.0,
               "vbc_y1": 1, "vbc_val_y1": 0.0,
               "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 4, "vbc_val_z1": 1e-5},
        "mat": {"rheology_type": "elasto-plastic-rate-state-friction",
                "is_plane_strain": False,
                "rho0": [1.0], "alpha": [0.0],
                "bulk_modulus": [2e8], "shear_modulus": [2e8],
                "cohesion0": [1e6], "cohesion1": [1e6],
                "friction_angle0": [30.0], "friction_angle1": [30.0],
                "direct_a": [0.2], "evolution_b": [0.1],
                "characteristic_distance": [1e-3],
                "characteristic_velocity": [1e-6],
                "state_var_model": 0},
    })
    ref, out = run_both3d(param, 20)
    for f in ("coord", "vel", "stress", "plstrain", "dt", "time",
              "dyn_fric_coeff", "state_variable"):
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        b = np.asarray(getattr(out, f), dtype=np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-10, f


def test_flat_gate():
    # structured mesh: flat is applicable, but the dispatcher prefers
    # the grid path (checked first), so plain configs still route there
    p = mk_param(mesh={"meshing_elem_shape": 1})
    sim = des.Simulation(p)
    assert flat2d.flat_step_applicable(sim.param, sim.ctx)
    sim._chunk_fn(2)
    assert sim.step_path in ("grid2d", "pallas2d")
    # PT relaxation rides the flat path too (round 4)
    p2 = mk_param(control={"has_PT": True})
    sim2 = des.Simulation(p2)
    assert flat2d.flat_step_applicable(sim2.param, sim2.ctx)


def test_flat_dispatched_by_simulation():
    """Simulation.run_steps must route unstructured meshes through the
    flat path (and produce finite state)."""
    sim = des.Simulation(mk_param())
    sim._chunk_fn(5)
    assert sim.step_path == "flat2d"
    sim.run_steps(5, chunk=5)
    assert np.isfinite(np.asarray(sim.state.stress)).all()


def mk_production_param(**over):
    """Structured-mesh production feature set (the examples/rifting-2d.cfg
    shape: surface processes + Winkler + water + multi-material markers) —
    the configs that previously fell off every fast path to the generic
    step (grid2d.py gate excludes surface processes/hydraulic/RSF)."""
    d = dict(
        mesh={"meshing_elem_shape": 1},
        control={"surface_process_option": 1,
                 "surface_diffusivity": 1e-6,
                 "has_surface_correction": True},
        bc={"has_winkler_foundation": True, "has_water_loading": True,
            "winkler_delta_rho": 100.0},
    )
    for sec, kv in over.items():
        d.setdefault(sec, {}).update(kv)
    return mk_param(**d)


def test_flat_structured_production_dispatch():
    """A structured mesh with surface processes + Winkler must dispatch
    to a fast path, NOT the generic gather step (VERDICT r2 #1).  The
    grid plane step now applies surface processes in-step, so it is
    preferred; flat remains applicable (it is the post-remesh path)."""
    sim = des.Simulation(mk_production_param())
    from dynearthsol_tpu.ops import grid2d
    assert grid2d.grid_step_applicable(sim.param, sim.ctx)
    assert flat2d.flat_step_applicable(sim.param, sim.ctx)
    sim._chunk_fn(2)
    assert sim.step_path in ("grid2d", "pallas2d", "pallas2d_res")


def test_flat_structured_production_matches_generic():
    """flat-vs-generic trajectory equivalence on a STRUCTURED mesh with
    the production feature set (surface diffusion + surface element
    correction + Winkler/water tractions).

    Tolerance 1e-10, not 1e-12: the one-step difference is ulp-level
    (3e-14 on vel, measured), but the EVP viscous/plastic min-select
    amplifies roundoff at Lyapunov rates over the 20-step horizon (the
    maxwell variant below holds 1e-12 over the same horizon)."""
    ref, out = run_both(mk_production_param())
    assert_match(ref, out, tol=1e-10)
    a, b = np.asarray(ref.dhacc), np.asarray(out.dhacc)
    assert np.abs(a - b).max() <= 1e-10 * max(np.abs(a).max(), 1e-300)


def test_flat_structured_production_maxwell_matches_generic():
    """Branch-free rheology variant of the production case: holds the
    tight tolerance over the full horizon (no plastic-select
    amplification)."""
    ref, out = run_both(mk_production_param(mat={"rheology_type":
                                                 "maxwell"}))
    assert_match(ref, out)


def test_flat_structured_hydraulic_matches_generic():
    """Structured mesh + Biot hydraulic diffusion lands on flat and
    matches the generic trajectory."""
    p = mk_param(
        mesh={"meshing_elem_shape": 1},
        control={"has_hydraulic_diffusion": True},
        mat={"porosity": [0.1], "hydraulic_perm": [1e-15],
             "fluid_rho0": [1000.0], "fluid_bulk_modulus": [2e9],
             "fluid_visc": [1e-3], "biot_coeff": [0.8]})
    sim = des.Simulation(p)
    sim._chunk_fn(2)
    assert sim.step_path == "flat2d"
    ref, out = run_both(p)
    assert_match(ref, out)
    for f in ("ppressure", "dppressure"):
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        b = np.asarray(getattr(out, f), dtype=np.float64)
        scale = max(np.abs(np.asarray(ref.ppressure)).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-12, f


def test_flat3d_structured_dispatch():
    """3D structured mesh with surface processes rides the grid3d plane
    step (surface processes are applied in-step there), not generic;
    flat3d remains applicable as the post-remesh path."""
    from dynearthsol_tpu.ops import flat3d
    p = mk_param3d("maxwell")
    p.mesh.meshing_elem_shape = 1
    p.control.surface_process_option = 1
    p.control.surface_diffusivity = 1e-6
    sim = des.Simulation(p)
    assert flat3d.flat3d_step_applicable(sim.param, sim.ctx)
    sim._chunk_fn(2)
    assert sim.step_path == "grid3d"
    sim.run_steps(4, chunk=2)
    assert np.isfinite(np.asarray(sim.state.stress)).all()


# ---- banded MXU engine (ops/band2d.py) through the flat step ----

def run_band_pair(param, n=10):
    """Run the flat chunk runner twice: exact column engine (ctx.band
    None) vs the banded engine (pure-jnp formulation on CPU — the
    Pallas kernels are validated against it in test_band2d.py)."""
    import dataclasses

    from dynearthsol_tpu.ops import band2d

    sim = des.Simulation(param)
    assert flat2d.flat_step_applicable(sim.param, sim.ctx)
    bt = band2d.build_band_tables(np.asarray(sim.topo.connectivity),
                                  sim.topo.nnode)
    assert bt is not None
    ctx_band = dataclasses.replace(sim.ctx, band=bt)
    run = flat2d.make_chunk_runner(param, sim.ctx,
                                   sim.compensation_pressure, n)
    ref = run(sim.ctx, sim.state)
    out = run(ctx_band, sim.state)
    return ref, out


def mk_param_f32(rheo="elasto-visco-plastic", **over):
    over.setdefault("sim", {})["float_dtype"] = "float32"
    return mk_param(rheo, **over)


def test_flat_band_matches_exact_maxwell():
    """f32 Maxwell trajectory: band engine vs exact column engine.  The
    band assembly reassociates per-node sums into window matmuls, so
    the match is at f32 roundoff (measured ~2e-6 at 20 steps), not
    bitwise.  Maxwell has no discrete constitutive switch, so pointwise
    comparison stays meaningful over steps."""
    ref, out = run_band_pair(mk_param_f32("maxwell"), n=20)
    assert_match(ref, out, tol=1e-5)


def test_flat_band_matches_exact_surface_processes():
    """Surface processes exercise the merged vel+coord gather and the
    mass-matrix assembly through the band engine."""
    ref, out = run_band_pair(mk_param_f32(
        "maxwell",
        control={"surface_process_option": 102,
                 "surface_diffusivity": 1e-6,
                 "has_surface_correction": True,
                 "terrig_sediment_area": 3.17e-7}), n=20)
    assert_match(ref, out, tol=1e-5)


def test_flat_band_matches_exact_hydraulic():
    """Hydraulic diffusion packs 7 nodal fields into one band gather
    (coord, vel, T, pp, dpp) and 3 assembly fields (force + pp_tdot)."""
    ref, out = run_band_pair(mk_param_f32(
        rheo="maxwell",
        control={"has_hydraulic_diffusion": True},
        mat={"porosity": [0.1], "hydraulic_perm": [1e-15],
             "fluid_bulk_modulus": [2.2e9], "biot_coeff": [0.8]}), n=20)
    assert_match(ref, out, tol=1e-5)


def test_flat_band_evp_pointwise_then_statistics():
    """EVP's viscous/plastic element selection amplifies 1-ulp input
    differences to O(1) on individual elements within ~2 steps (the
    same Lyapunov behavior the f32/f64 twin gates document in
    tests/test_precision.py), so the EVP band gate is two-tier:
    pointwise at 1 step, integrated statistics at 100 steps."""
    ref, out = run_band_pair(mk_param_f32(), n=1)
    assert_match(ref, out, tol=1e-5)

    ref, out = run_band_pair(mk_param_f32(), n=100)
    a = np.asarray(ref.stress, np.float64)
    b = np.asarray(out.stress, np.float64)
    sII_a = np.sqrt(0.25 * (a[:, 0] - a[:, 1]) ** 2 + a[:, 2] ** 2)
    sII_b = np.sqrt(0.25 * (b[:, 0] - b[:, 1]) ** 2 + b[:, 2] ** 2)
    assert abs(sII_a.mean() - sII_b.mean()) <= 5e-2 * abs(sII_a.mean())
    # dt is CFL-recomputed from the (decorrelated) fields every 10
    # steps, so integrated time drifts at ~1e-4 over 100 steps
    assert abs(float(ref.time) - float(out.time)) \
        <= 1e-3 * abs(float(ref.time))
    ztop_a = np.asarray(ref.coord, np.float64)[:, 1].max()
    ztop_b = np.asarray(out.coord, np.float64)[:, 1].max()
    assert abs(ztop_a - ztop_b) <= 1e-2 * max(abs(ztop_a), 1.0)


def test_flat_band_f64_stays_exact():
    """f64 state must bypass the band engine entirely: attaching band
    tables changes NOTHING at f64 (bit-exact contract preserved)."""
    import dataclasses

    from dynearthsol_tpu.ops import band2d

    param = mk_param("maxwell")
    sim = des.Simulation(param)
    bt = band2d.build_band_tables(np.asarray(sim.topo.connectivity),
                                  sim.topo.nnode)
    ctx_band = dataclasses.replace(sim.ctx, band=bt)
    run = flat2d.make_chunk_runner(param, sim.ctx,
                                   sim.compensation_pressure, 8)
    ref = run(sim.ctx, sim.state)
    out = run(ctx_band, sim.state)
    for f in FIELDS:
        a = np.asarray(getattr(ref, f))
        b = np.asarray(getattr(out, f))
        assert np.array_equal(a, b), f


def test_flat3d_band_matches_exact_maxwell():
    """3D tets through the band engine (npe=4): f32 Maxwell pointwise
    vs the exact column engine."""
    import dataclasses

    from dynearthsol_tpu.ops import band2d, flat3d

    p = mk_param3d("maxwell")
    p.sim.float_dtype = "float32"
    sim = des.Simulation(p)
    assert flat3d.flat3d_step_applicable(sim.param, sim.ctx)
    bt = band2d.build_band_tables(np.asarray(sim.topo.connectivity),
                                  sim.topo.nnode)
    assert bt is not None and bt.npe == 4
    ctx_band = dataclasses.replace(sim.ctx, band=bt)
    run = flat3d.make_chunk_runner(p, sim.ctx,
                                   sim.compensation_pressure, 10)
    ref = run(sim.ctx, sim.state)
    out = run(ctx_band, sim.state)
    assert_match(ref, out, tol=1e-5)


def test_flat_matches_generic_pt():
    """PT inner relaxation (dynearthsol.cxx:779-840) on the flat path
    must reproduce the generic step's PT loop to f64 roundoff — same
    kernel sequence, same support-table summation order (round 4: the
    has_PT gate exclusion dropped)."""
    p = mk_param(control={"has_PT": True, "PT_max_iter": 8,
                          "PT_relative_tolerance": 1e-12})
    ref, out = run_both(p, n=6)
    assert_match(ref, out, tol=1e-10)


def test_flat_matches_generic_pt_hydraulic():
    """PT + hydraulic diffusion (the consolidation configuration,
    benchmarks/2d-consolidation.cfg): hydraulic is suspended inside the
    PT loop and the pore-pressure update recomputes from the PT-updated
    stress, exactly like the generic step."""
    p = mk_param(
        rheo="elastic",
        control={"has_PT": True, "PT_max_iter": 8,
                 "PT_relative_tolerance": 1e-12,
                 "has_hydraulic_diffusion": True,
                 "has_thermal_diffusion": False},
        bc={"vbc_z0": 1, "vbc_val_z0": 0.0,
            "stress_bc_z1": 3, "stress_val_z1": -1e5},
        mat={"porosity": [0.3], "hydraulic_perm": [1e-13],
             "biot_coeff": [1.0], "fluid_bulk_modulus": [2.2e9]})
    ref, out = run_both(p, n=6)
    assert_match(ref, out, tol=1e-10)


def test_flat3d_matches_generic_pt():
    """3D PT inner relaxation on the flat path vs the generic step
    (round 4: has_PT gate exclusion dropped in flat3d too).

    The tight gate runs branch-free maxwell; EVP gets a loose
    short-horizon check only — the 3D eig3 plastic/viscous min-select
    is bistable at f32/f64 roundoff (same story as tests/test_pallas3d
    docstring), and PT iterates it many times per step."""
    p = mk_param3d(rheo="maxwell")
    p.control.has_PT = True
    p.control.PT_max_iter = 6
    p.control.PT_relative_tolerance = 1e-12
    ref, out = run_both3d(p, 4)
    assert_match(ref, out, tol=1e-10)
    p2 = mk_param3d()
    p2.control.has_PT = True
    p2.control.PT_max_iter = 6
    p2.control.PT_relative_tolerance = 1e-12
    ref2, out2 = run_both3d(p2, 1)
    assert_match(ref2, out2, tol=5e-3)
