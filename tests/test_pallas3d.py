"""Fused 3D Pallas plane-step (ops/pallas3d.py) vs the XLA grid3d step.

Same contract as tests/test_pallas.py: grid3d (validated against the
generic step) is the oracle; the Pallas kernel runs in interpreter mode
on CPU and must reproduce it to f32 roundoff.

Unlike the 2D case, the 3D EVP weak-zone setup is chaotically sensitive:
perturbing the oracle's own initial stress by 1e-7 relative diverges its
10-step trajectory by ~8-13% (measured; the plastic/viscous min-select
of rheology.cxx:908-935 is bistable at f32 roundoff near the yield
surface, and the 5-tet mesh has ~2x fewer nodes per element to average
over than the 2D quad split).  So the long-trajectory gate runs the
branch-free maxwell rheology (tight), and EVP gets a short-horizon gate
before the chaos amplification overtakes roundoff.
"""

import numpy as np

import dynearthsol_tpu as des
from dynearthsol_tpu.ops import grid3d, pallas3d


def make_sim(**over):
    d = {
        "sim": {"ndims": 3, "float_dtype": "float32",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 128e3, "ylength": 16e3, "zlength": 8e3,
                 "resolution": 1e3,
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True, "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9,
               "vbc_y0": 1, "vbc_val_y0": 0.0,
               "vbc_y1": 1, "vbc_val_y1": 0.0,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": False,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    }
    for sec, kv in over.items():
        d.setdefault(sec, {}).update(kv)
    return des.Simulation(des.param_from_dict(d))


def run_both(sim, n):
    """(grid3d oracle, pallas3d interpret) states after n steps."""
    nx, ny, nz = sim.ctx.sgrid
    gstep = grid3d.make_grid_step(sim.param, sim.ctx, 0.0)
    g = grid3d.state_to_grid(sim.state, nx, ny, nz)
    for _ in range(n):
        g = gstep(sim.ctx, g)
    ref = grid3d.grid_to_state(g, nx, ny, nz)

    old = pallas3d.INTERPRET
    pallas3d.INTERPRET = True
    try:
        run = pallas3d.make_chunk_runner(sim.param, sim.ctx, 0.0, n)
        out = run(sim.ctx, sim.state)
    finally:
        pallas3d.INTERPRET = old
    return ref, out


def assert_close(ref, out, fields, tols, default_tol):
    for f in fields:
        a = np.asarray(getattr(ref, f), dtype=np.float64)
        b = np.asarray(getattr(out, f), dtype=np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        err = np.abs(a - b).max() / scale
        assert err < tols.get(f, default_tol), (f, err)


FIELDS = ("coord", "vel", "temperature", "stress", "strain",
          "plstrain", "volume", "volume_n", "mass",
          "tmass", "hmass", "force", "strain_rate", "edvoldt",
          "delta_plstrain", "volume_old")


def test_pallas3d_gate():
    sim = make_sim()
    assert pallas3d.pallas3d_step_applicable(sim.param, sim.ctx)
    # f64 falls back
    sim64 = make_sim(sim={"float_dtype": "float64"})
    assert not pallas3d.pallas3d_step_applicable(sim64.param, sim64.ctx)
    # misaligned x (nxc % 128 != 0) falls back
    simx = make_sim(mesh={"xlength": 64e3})
    assert not pallas3d.pallas3d_step_applicable(simx.param, simx.ctx)
    # free y faces (lithostatic sidewall tractions) fall back
    simy = make_sim(bc={"vbc_y0": 0, "vbc_y1": 0})
    assert not pallas3d.pallas3d_step_applicable(simy.param, simy.ctx)


def test_pallas3d_matches_grid_step_maxwell():
    """10-step trajectory gate on the branch-free maxwell rheology.

    Measured agreement is ~2e-6 on a single-device backend (and on the
    real TPU chip); under the suite's 8-virtual-device CPU backend the
    ORACLE's own f32 reduction order changes enough that the trajectory
    difference grows to ~4e-4 (the same run bit-reproduces across x64
    on/off, so it's backend scheduling, not the kernel).  The tight
    per-step gate is test_pallas3d_single_step below."""
    sim = make_sim(mat={"rheology_type": "maxwell"},
                   ic={"weakzone_option": 0})
    # N=10 ends on a dt-refresh step (dynearthsol.cxx:861-871 cadence)
    ref, out = run_both(sim, 10)
    assert_close(ref, out, FIELDS, {"force": 5e-3}, 1e-3)
    assert np.isfinite(np.asarray(out.viscosity)).all()
    for f in ("dt", "time", "max_global_vel_mag", "l2_residual"):
        a, b = float(getattr(ref, f)), float(getattr(out, f))
        assert abs(a - b) <= 1e-3 * max(abs(a), 1e-300), f


def test_pallas3d_single_step_evp():
    """Single-step EVP gate at roundoff tolerance: exercises the full
    plasticity (eig3) + min-select branch logic before either chaos
    (the oracle's 1e-7-perturbed trajectory diverges 6% by step TWO,
    measured) or backend reduction-order noise can accumulate."""
    sim = make_sim()
    ref, out = run_both(sim, 1)
    assert_close(ref, out, FIELDS, {"force": 1e-3}, 1e-4)
    va = np.log(np.asarray(ref.viscosity, dtype=np.float64))
    vb = np.log(np.asarray(out.viscosity, dtype=np.float64))
    # the creep exp() amplifies f32 association-order noise; bulk
    # agreement is the check (stress above is load-bearing)
    assert np.median(np.abs(va - vb)) < 0.02
    assert np.isfinite(vb).all()


def _multimat_over():
    """Two-layer, two-material overrides (crust/mantle contrast):
    exercises the const-property-plane pack + in-kernel material loops
    (matprops.cxx:115-144 mixtures in the hot loop)."""
    return dict(
        mat={"num_materials": 2,
             "rho0": [2700.0, 3300.0],
             "bulk_modulus": [40e9, 120e9],
             "shear_modulus": [24e9, 70e9],
             "heat_capacity": [1000.0, 1200.0],
             "therm_cond": [2.5, 3.3],
             "alpha": [3e-5, 2e-5],
             "visc_coefficient": [1e2, 1e3],
             "visc_activation_energy": [3.0e5, 4.0e5],
             "cohesion0": [4e7, 6e7],
             "friction_angle0": [30.0, 25.0],
             "visc_max": 1e24, "visc_min": 1e19},
        ic={"num_mattype_layers": 2, "layer_mattypes": [0, 1],
            "mattype_layer_depths": [0.4]},
        markers={"markers_per_element": 4, "random_seed": 11})


def test_pallas3d_gate_multimat():
    sim = make_sim(**_multimat_over())
    assert len(sim.param.mat.rho0) == 2
    assert np.asarray(sim.state.emw).shape[1] == 2
    # marker mixing produced genuinely mixed elements near the interface
    emw = np.asarray(sim.state.emw)
    w = emw / emw.sum(axis=1, keepdims=True)
    assert ((w[:, 0] > 0.01) & (w[:, 1] > 0.01)).any()
    assert pallas3d.pallas3d_step_applicable(sim.param, sim.ctx)


def test_pallas3d_matches_grid_step_maxwell_multimat():
    """10-step multi-material maxwell gate: const-property planes
    (bulkm/shearm/kappa/rho/buoyancy/cp/hm mixtures) + the in-kernel
    viscosity material loop against the grid3d oracle."""
    over = _multimat_over()
    over["mat"]["rheology_type"] = "maxwell"
    sim = make_sim(**over)
    ref, out = run_both(sim, 10)
    # vel: the gravity-residual cancellation amplifies the f32
    # const-pack association noise ~1000x (see the EVP test's note);
    # round 5's element-0-mixture IC fix warms the mantle profile and
    # pushes the 10-step amplified value from ~8e-4 to a measured
    # 1.55e-3 — both paths still agree to f32-cancellation accuracy
    assert_close(ref, out, FIELDS, {"force": 5e-3, "vel": 5e-3}, 1e-3)
    assert np.isfinite(np.asarray(out.viscosity)).all()
    for f in ("dt", "time", "max_global_vel_mag", "l2_residual"):
        a, b = float(getattr(ref, f)), float(getattr(out, f))
        assert abs(a - b) <= 1e-3 * max(abs(a), 1e-300), f


def test_pallas3d_single_step_evp_multimat():
    """Single-step multi-material EVP gate: the plastic-weakening
    material loop (weighted cohesion/friction/dilation mixing).

    Tolerance structure (measured): the const pack linearizes
    rho(T) = rhoA - rhoB*TinC per element, which is ALGEBRAICALLY equal
    to the oracle's sum(w*rho0*(1-alpha*TinC))/n but f32-association
    different at ~2-4e-7 in mass/tmass/hmass; that roundoff then
    amplifies ~1000x through gravity-residual cancellation into
    vel/force/stress (measured max 1.5e-4/1.8e-4/3.1e-4).  The
    branch-outcome fields — viscosity, temperature, plstrain,
    delta_plstrain — agree BIT-EXACTLY, which is the real correctness
    signal; the mixtures themselves gate at 1e-6."""
    sim = make_sim(**_multimat_over())
    ref, out = run_both(sim, 1)
    # mixtures: tight (validates the const-property planes themselves)
    assert_close(ref, out,
                 ("mass", "tmass", "hmass", "volume", "volume_n",
                  "coord", "strain", "strain_rate", "edvoldt"), {}, 1e-6)
    # cancellation-amplified fields: measured headroom x3
    assert_close(ref, out, ("vel", "force", "stress"), {}, 1e-3)
    # branch outcomes: bit-exact
    for f in ("viscosity", "temperature", "plstrain", "delta_plstrain"):
        a = np.asarray(getattr(ref, f))
        b = np.asarray(getattr(out, f))
        assert (a == b).all(), f
    vb = np.log(np.asarray(out.viscosity, dtype=np.float64))
    assert np.isfinite(vb).all()


def test_pallas3d_gate_accepts_winkler_water():
    sim = make_sim(bc={"has_winkler_foundation": True,
                       "has_water_loading": True,
                       "winkler_delta_rho": 100.0})
    assert sim.ctx.sbc.n_grav > 0
    assert pallas3d.pallas3d_step_applicable(sim.param, sim.ctx)
    spec = pallas3d._grav_facets_structured_3d(sim.param, sim.ctx)
    assert spec["winkler"] and spec["water"]
    for name in ("bottom", "top"):
        for pv in (0, 1):
            assert len(spec[name][pv]) == 2


def test_pallas3d_matches_grid_step_winkler_water_maxwell():
    """10-step trajectory gate with in-kernel Winkler + water tractions
    (apply_stress_bcs parity): branch-free maxwell rheology so roundoff
    does not amplify through the plastic min-select."""
    sim = make_sim(mat={"rheology_type": "maxwell"},
                   control={"surf_base_level": 10.0},
                   bc={"has_winkler_foundation": True,
                       "has_water_loading": True,
                       "winkler_delta_rho": 100.0})
    ref, out = run_both(sim, 10)
    assert_close(ref, out, FIELDS, {"force": 5e-3}, 1e-3)


def test_pallas3d_single_step_winkler_water_evp():
    """Single-step EVP gate with tractions at roundoff tolerance."""
    sim = make_sim(control={"surf_base_level": 10.0},
                   bc={"has_winkler_foundation": True,
                       "has_water_loading": True,
                       "winkler_delta_rho": 100.0})
    ref, out = run_both(sim, 1)
    assert_close(ref, out, FIELDS, {"force": 1e-3}, 1e-4)


# ---- in-kernel surface processes (round 4: production3d on pallas3d) ----

def _surf_over():
    return {"surface_process_option": 1, "surface_diffusivity": 1e-6,
            "has_surface_correction": True}


def test_pallas3d_gate_accepts_surface():
    sim = make_sim(control=_surf_over())
    assert pallas3d.pallas3d_step_applicable(sim.param, sim.ctx)
    # options 11/101/102 need host machinery -> grid3d path
    sim2 = make_sim(control={"surface_process_option": 102})
    assert not pallas3d.pallas3d_step_applicable(sim2.param, sim2.ctx)
    # the facet->triangle map covers every top facet
    tri, nid = pallas3d._surf_maps(sim.ctx, *sim.ctx.sgrid)
    assert tri.shape[0] == int(sim.ctx.surf.etop)
    nx, ny, nz = sim.ctx.sgrid
    assert tri.sum() * 2 == tri.shape[0]  # half slot 0, half slot 1


def test_pallas3d_matches_grid_step_surface_maxwell():
    """10-step trajectory gate with in-kernel facet-FEM surface
    diffusion (surface_dh_3d parity, bc.cxx:920-1050) + surface element
    correction: branch-free maxwell rheology so the dh cancellations
    (slopes of a near-flat surface) stay roundoff-dominated.  Measured
    agreement round 4: fields ~1e-4, dhacc/edvacc ~1.5e-3."""
    sim = make_sim(mat={"rheology_type": "maxwell"},
                   control=_surf_over())
    ref, out = run_both(sim, 10)
    assert_close(ref, out, FIELDS, {"force": 5e-3}, 1e-3)
    assert_close(ref, out, ("dhacc", "edvacc_surf"), {}, 5e-3)
    assert float(np.abs(np.asarray(ref.dhacc)).max()) > 0.0


def test_pallas3d_single_step_production3d_evp():
    """Single-step EVP gate on the FULL production-3D feature set:
    crust/mantle markers + Winkler + water loading + surface diffusion
    + surface correction — the bench `production3d` configuration on
    the fused kernel.  dhacc/edvacc are excluded: the plastic
    min-select amplifies a 1e-7 stress perturbation of the ORACLE
    ITSELF to 15%/84% on those near-cancelling accumulators (measured
    round 4); they are gated on the maxwell variant above instead."""
    over = _multimat_over()
    over["control"] = {**_surf_over(), "surf_base_level": 10.0}
    over["bc"] = {"has_winkler_foundation": True,
                  "has_water_loading": True,
                  "winkler_delta_rho": 100.0}
    sim = make_sim(**over)
    assert pallas3d.pallas3d_step_applicable(sim.param, sim.ctx)
    ref, out = run_both(sim, 1)
    assert_close(ref, out, FIELDS, {"force": 1e-3}, 1e-3)


def test_pallas3d_surface_multimat_maxwell():
    """Surface diffusion + const-property-plane pack together (the two
    mechanisms share the widened H=5 halo and the nodal slot layout).

    dhacc/edvacc tolerances: the surface slopes of a near-flat surface
    are catastrophic cancellations, and the crust/mantle density step
    amplifies f32 noise through them — the ORACLE's own dhacc moves
    2.4e-2 relative at 10 steps under a 1e-7 input perturbation
    (measured round 4).  The mechanism gate is the step-1 check (6e-6
    measured); the 10-step gate only bounds the amplification."""
    over = _multimat_over()
    over["mat"]["rheology_type"] = "maxwell"
    over["control"] = _surf_over()
    sim = make_sim(**over)
    ref1, out1 = run_both(sim, 1)
    assert_close(ref1, out1, ("dhacc", "edvacc_surf"), {}, 5e-5)
    ref, out = run_both(sim, 10)
    # vel 5e-3: same amplified-cancellation bound as the multimat
    # maxwell gate above (measured 1.55e-3 after the round-5 IC fix)
    assert_close(ref, out, FIELDS, {"force": 5e-3, "vel": 5e-3}, 1e-3)
    assert_close(ref, out, ("dhacc", "edvacc_surf"), {}, 2e-1)
