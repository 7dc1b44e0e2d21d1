"""Analytic physics benchmarks (the reference's accuracy contracts).

- Maxwell viscoelastic relaxation (benchmarks/maxwell.cfg + maxwell.diff's
  analytic solution: szz = 2 eps eta (1 - exp(-mu t / eta))).
- Oedometer Mohr-Coulomb loading (benchmarks/oedometer-2d.cfg +
  oedometer-2d-plot.py analytical()).
"""

import math

import numpy as np
import pytest

import dynearthsol_tpu as des


def _maxwell_param(resolution=0.1):
    return des.param_from_dict({
        "sim": {"max_steps": 10000},
        "mesh": {"meshing_option": 1, "xlength": 1.0, "ylength": 1.0,
                 "zlength": 1.0, "resolution": resolution,
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 0.0, "characteristic_speed": 1e-14,
                    "inertial_scaling": 1e6,
                    "has_thermal_diffusion": False,
                    # disable the reference's correct_surface_element quirk
                    # (bc.cxx:1613-1665, replicated by default): it zeroes
                    # the volumetric dv of surface elements, breaking the
                    # textbook homogeneous state this gate checks.  The
                    # reference-faithful behavior is gated instead by
                    # tests/test_golden_vs_reference.py.
                    "has_surface_correction": False},
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0,
               "vbc_x1": 100, "vbc_val_x1": -1e-14,
               "vbc_z0": 100, "vbc_val_z0": 1e-14,
               "vbc_z1": 1, "vbc_val_z1": 0.0,
               "has_winkler_foundation": False, "has_water_loading": False,
               "surface_temperature": 273.0, "mantle_temperature": 273.0},
        "mat": {"rheology_type": "maxwell", "bulk_modulus": [1e12],
                "shear_modulus": [1e10], "visc_max": 1e22,
                "visc_min": 1e22},
    })


def test_maxwell_relaxation_analytic():
    """Gate for SURVEY §7.3 stage 3: the minimal end-to-end slice."""
    p = _maxwell_param(resolution=0.1)
    sim = des.Simulation(p)
    s = sim.run_steps(10000, chunk=1000)

    eta, mu, eps = 1e22, 1e10, 1e-14
    t = float(s.time)
    ana = 2 * eps * eta * (1 - math.exp(-mu * t / eta))
    szz = float(np.asarray(s.stress)[:, 1].mean())
    rel = abs(szz - ana) / ana
    assert rel < 2e-3, f"szz={szz} analytic={ana} rel={rel}"
    # the in-plane normal stress must relax to -szz (pure shear), xz ~ 0
    sxx = float(np.asarray(s.stress)[:, 0].mean())
    assert abs(sxx + szz) / szz < 2e-2
    # NaN audit (cf. utils.hpp:283-354 check_nan)
    for name in ("coord", "vel", "stress", "strain"):
        assert np.isfinite(np.asarray(getattr(s, name))).all(), name


def _oedometer_analytic(nsteps, vx=1e-5):
    """Transcription of oedometer-2d-plot.py analytical()."""
    K = mu = 200e6
    coh = 1e6
    phi = psi = math.radians(10.0)
    ten = 5.67e6
    e1 = K + 4 * mu / 3
    e2 = K - 2 * mu / 3
    nf = (1 + math.sin(phi)) / (1 - math.sin(phi))
    npp = (1 + math.sin(psi)) / (1 - math.sin(psi))
    rl = (e1 - e2 * nf) / ((e1 + e2) * nf * npp - 2 * e2 * (nf + npp)
                           + 2 * e1)
    step1 = 2 * coh * math.sqrt(nf) / ((e1 - e2 * nf) * vx)
    disp = vx * np.arange(nsteps + 1, dtype=float)
    sxx = np.zeros(nsteps + 1)
    for i in range(1, nsteps + 1):
        de = vx / (1 - disp[i])
        if i < step1:
            sxx[i] = sxx[i - 1] + e1 * de
        else:
            sxx[i] = sxx[i - 1] + de * (e1 + 2 * rl * (e2 * npp - e1))
    return disp, sxx


def test_oedometer_mohr_coulomb_analytic():
    """Gate for SURVEY §7.3 stage 4: plasticity."""
    p = des.load_config("/root/reference/benchmarks/oedometer-2d.cfg")
    sim = des.Simulation(p)

    nsteps = 2000
    checkpoints = [500, 1000, 1500, 2000]
    disp_ana, sxx_ana = _oedometer_analytic(nsteps)

    done = 0
    for cp in checkpoints:
        s = sim.run_steps(cp - done, chunk=250)
        done = cp
        sxx_num = abs(float(np.asarray(s.stress)[:, 0].mean()))
        rel = abs(sxx_num - sxx_ana[cp]) / sxx_ana[cp]
        assert rel < 5e-3, f"step {cp}: sxx={sxx_num} ana={sxx_ana[cp]} rel={rel}"
    # plastic yielding must actually have happened
    assert float(np.asarray(s.plstrain).max()) > 0


def test_bench_budget_skips_legibly():
    """bench.py run_suite honors BENCH_BUDGET_S: with no budget left it
    emits {'skipped': 'budget'} entries and a final superset summary
    line instead of overrunning the driver's timeout (VERDICT r3 #1)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, BENCH_BUDGET_S="0", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--no-probe"],
        capture_output=True, text=True, timeout=120, env=env, cwd=repo)
    assert r.returncode == 0, r.stderr[-500:]
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    # per-case skip lines flushed incrementally + the final summary
    assert len(lines) >= 2
    for ln in lines[:-1]:
        d = json.loads(ln)
        assert d.get("skipped") == "budget", d
    summary = json.loads(lines[-1])
    assert "cases" in summary and len(summary["cases"]) == 8
    assert all(c.get("skipped") == "budget"
               for c in summary["cases"].values())
