"""Fused Pallas plane-step (ops/pallas2d.py) vs the XLA grid step.

The grid step (ops/grid2d.py, itself validated against the generic step
and the analytic gates) is the oracle; the Pallas kernel runs in
interpreter mode on CPU (pallas2d.INTERPRET) and must reproduce it to
f32 roundoff.  Viscosity is compared in log space: the creep law
exponentiates an O(50) argument, so f32 association-order differences
legitimately move exp() by ~1e-3 relative.
"""

import dataclasses

import numpy as np
import pytest

import dynearthsol_tpu as des
from dynearthsol_tpu.ops import grid2d, pallas2d


def make_sim(**over):
    d = {
        "sim": {"ndims": 2, "float_dtype": "float32",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 16e3, "ylength": 0.0, "zlength": 128e3,
                 "resolution": 1e3,
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True, "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    }
    for sec, kv in over.items():
        d.setdefault(sec, {}).update(kv)
    return des.Simulation(des.param_from_dict(d))


def test_pallas_gate():
    sim = make_sim()
    assert pallas2d.pallas_step_applicable(sim.param, sim.ctx)
    # f64 falls back
    sim64 = make_sim(sim={"float_dtype": "float64"})
    assert not pallas2d.pallas_step_applicable(sim64.param, sim64.ctx)
    # misaligned z falls back
    simz = make_sim(mesh={"zlength": 100e3, "resolution": 2e3,
                          "xlength": 16e3})
    assert not pallas2d.pallas_step_applicable(simz.param, simz.ctx)


def test_pallas_matches_grid_step():
    sim = make_sim()
    N = 10  # ends on a dt-refresh step (dynearthsol.cxx:861-871 cadence)
    nx, nz = sim.ctx.sgrid

    gstep = grid2d.make_grid_step(sim.param, sim.ctx, 0.0)
    g = grid2d.state_to_grid(sim.state, nx, nz)
    for _ in range(N):
        g = gstep(sim.ctx, g)
    ref = grid2d.grid_to_state(g, nx, nz)

    old = pallas2d.INTERPRET
    pallas2d.INTERPRET = True
    try:
        run = pallas2d.make_chunk_runner(sim.param, sim.ctx, 0.0, N)
        out = run(sim.ctx, sim.state)
    finally:
        pallas2d.INTERPRET = old

    # force is a small difference of large stress integrals: f32
    # association-order noise accumulates faster there
    tols = {"force": 1e-3}
    for f in ("coord", "vel", "temperature", "stress", "strain",
              "plstrain", "stressyy", "volume", "volume_n", "mass",
              "tmass", "force", "strain_rate", "edvoldt",
              "delta_plstrain", "hmass"):
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        b = np.asarray(getattr(out, f), dtype=np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < tols.get(f, 2e-4), f
    va = np.log(np.asarray(ref.viscosity, dtype=np.float64))
    vb = np.log(np.asarray(out.viscosity, dtype=np.float64))
    # the creep exp() amplifies f32 association-order noise ~e^(arg*eps);
    # bulk agreement is tight, outliers sit at the visc_min clip edge
    # bulk agreement; outliers are where edot ~ MIN_STRAIN_RATE (log-
    # amplified f32 noise on a diagnostic quantity -- stress above is the
    # load-bearing check)
    assert np.median(np.abs(va - vb)) < 0.02
    assert np.isfinite(vb).all()
    for f in ("dt", "time", "max_global_vel_mag"):
        a, b = float(getattr(ref, f)), float(getattr(out, f))
        assert abs(a - b) <= 1e-5 * max(abs(a), 1e-300), f


def test_resident_gate():
    sim = make_sim()
    assert pallas2d.resident_applicable(sim.param, sim.ctx)
    # time-periodic vbc profile -> targets not chunk-constant
    simp = make_sim(bc={"vbc_period_x0_time_in_yr": [0.0, 1e3],
                        "vbc_period_x0_ratio": [1.0, 0.5]})
    assert not pallas2d.resident_applicable(simp.param, simp.ctx)
    # RSF-style global velocity scaling feeds vmax back per step
    simg = make_sim(control={"use_global_velocity_scaling": True})
    assert not pallas2d.resident_applicable(simg.param, simg.ctx)


def test_resident_matches_tiled_and_grid():
    """The VMEM-resident multi-step kernel must reproduce the per-step
    tiled kernel (same core, same arithmetic) and the grid oracle across
    a dt-refresh boundary (N=25 crosses refreshes at steps 10 and 20)."""
    sim = make_sim()
    N = 25
    nx, nz = sim.ctx.sgrid

    gstep = grid2d.make_grid_step(sim.param, sim.ctx, 0.0)
    g = grid2d.state_to_grid(sim.state, nx, nz)
    for _ in range(N):
        g = gstep(sim.ctx, g)
    ref = grid2d.grid_to_state(g, nx, nz)

    old = pallas2d.INTERPRET
    pallas2d.INTERPRET = True
    try:
        run_t = pallas2d.make_chunk_runner(sim.param, sim.ctx, 0.0, N)
        tiled = run_t(sim.ctx, sim.state)
        run_r = pallas2d.make_resident_chunk_runner(sim.param, sim.ctx,
                                                    0.0, N)
        res = run_r(sim.ctx, sim.state)
    finally:
        pallas2d.INTERPRET = old

    # resident vs tiled: identical core arithmetic per step.  The EVP
    # min-select (rheology.cxx:869-879) is a discontinuous branch: at
    # near-tie cells (svII ~ spII) one-ULP compile-context differences
    # flip it — the tied stresses agree, but the branch-selected
    # stressyy/plstrain/viscosity fields show the flip at ~1e-5.
    select_tol = {"stressyy": 5e-5, "plstrain": 5e-5,
                  "delta_plstrain": 5e-4, "viscosity": 5e-4}
    for f in ("coord", "vel", "temperature", "stress", "strain",
              "plstrain", "stressyy", "volume", "volume_n", "mass",
              "tmass", "force", "strain_rate", "edvoldt",
              "delta_plstrain", "hmass", "viscosity"):
        a = np.asarray(getattr(tiled, f), dtype=np.float64)
        b = np.asarray(getattr(res, f), dtype=np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < select_tol.get(f, 1e-6), f
    for f in ("dt", "time", "max_global_vel_mag", "global_dt_min",
              "steps"):
        a, b = float(getattr(tiled, f)), float(getattr(res, f))
        assert abs(a - b) <= 1e-6 * max(abs(a), 1e-300), f

    # resident vs grid oracle: f32 association drift grows with N (the
    # tiled kernel shows the IDENTICAL drift at N=25: vel/stress 3e-4,
    # force 1e-3 — measured side by side)
    tols = {"force": 2e-3, "vel": 1e-3, "stress": 1e-3, "plstrain": 5e-4}
    for f in ("coord", "vel", "temperature", "stress", "strain",
              "plstrain", "volume", "mass"):
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        b = np.asarray(getattr(res, f), dtype=np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < tols.get(f, 2e-4), f
