"""Terzaghi consolidation benchmark gates on the reference's own
benchmark configs (benchmarks/1d-consolidation-*.cfg), replacing the
single-mode decay check of test_hydraulic.py with the full loading
problem: instantaneous surface load (or uniform excess-pore-pressure
IC), undrained Skempton response, then drainage following the analytic
series solution

  p(z, t) = p0 * sum_j (4/pi) (-1)^j/(2j+1) cos((2j+1) pi z / (2H))
                 * exp(-((2j+1) pi / 2)^2 Cv t / H^2)

with Cv = (k/eta) / (phi beta_w + alpha (alpha + phi - alpha phi)
/ (lambda + 2 mu)) — the reference's own acceptance surface
(benchmarks/1d_consolidation-plot.ipynb; kernels fields.cxx:297-406,
PT loop dynearthsol.cxx:779-840).

The runs are the benchmark cfgs themselves (quasi-static + PT at 1e-12
relative tolerance, traction/IC loading, drained top hbc_z1=1) loaded
unchanged; the gate samples the bottom-node excess pore pressure across
the whole drainage horizon (Tv 0 -> ~2.4, i.e. >99% dissipated).
Measured max |err|/p0: 0.0078 (2D traction, 29 samples); tolerance 2e-2
gives ~2.5x headroom.
"""

import numpy as np

import dynearthsol_tpu as des

YEAR = 86400 * 365.25
P0 = 1e5
H = 10.0


def _cv(p):
    """Consolidation coefficient from the cfg's own material table."""
    perm = p.mat.hydraulic_perm[0]
    eta = p.mat.fluid_visc[0]
    phi = p.mat.porosity[0]
    bw = 1.0 / p.mat.fluid_bulk_modulus[0]
    K = p.mat.bulk_modulus[0]
    G = p.mat.shear_modulus[0]
    al = p.mat.biot_coeff[0]
    lam = K - 2.0 * G / 3.0
    return (perm / eta) / (phi * bw + al * (al + phi - al * phi)
                           / (lam + 2.0 * G))


def _series(t, cv, z=0.0, terms=200):
    j = np.arange(terms)
    return P0 * np.sum(
        (4 / np.pi) * ((-1.0) ** j) / (2 * j + 1)
        * np.cos((2 * j + 1) * np.pi * z / (2 * H))
        * np.exp(-((2 * j + 1) * np.pi / 2) ** 2 * cv * t / H ** 2))


def _drainage_curve(cfg, chunk=100):
    """Run the benchmark cfg to its max_time; return [(t, excess, ana)]
    sampled at the bottom node every `chunk` steps."""
    p = des.load_config(cfg)
    sim = des.Simulation(p)
    tmax = p.sim.max_time_in_yr * YEAR
    cv = _cv(p)
    gw = p.mat.fluid_rho0[0] * p.control.gravity
    c = np.asarray(sim.state.coord)
    zcol = c[:, sim.param.sim.ndims - 1]
    i = int(np.argmin(zcol))
    rows = []
    while float(sim.state.time) < tmax:
        sim.run_steps(chunk, chunk=chunk)
        t = float(sim.state.time)
        pp = np.asarray(sim.state.ppressure)
        excess = pp[i] + gw * zcol[i]          # hydrostatic datum
        rows.append((t, excess, _series(t, cv)))
    return rows


def _check(rows, tol):
    assert len(rows) >= 10
    # the curve must actually drain (ends near zero) and start near p0
    assert rows[0][1] > 0.5 * P0
    assert rows[-1][2] < 0.05 * P0
    err = max(abs(ex - a) for _, ex, a in rows) / P0
    assert err < tol, f"drainage-curve error {err:.4f}"


def test_terzaghi_2d_traction():
    """Surface-load variant: stress_bc_z1=3 at -1e5 Pa; the undrained
    response then drains along the series (measured err 0.0078)."""
    rows = _drainage_curve(
        "/root/reference/benchmarks/1d-consolidation-des2d_traction.cfg")
    _check(rows, 2e-2)


def test_terzaghi_2d_water_loading():
    """Uniform excess-pore-pressure IC variant (ic.excess_pore_pressure
    = 1e5, ic.cxx:462 analog): same series, pure drainage."""
    rows = _drainage_curve(
        "/root/reference/benchmarks/"
        "1d-consolidation-des2d_water_loading.cfg")
    _check(rows, 2e-2)


def test_terzaghi_3d_traction():
    """3D column variant on the tetrahedral path."""
    rows = _drainage_curve(
        "/root/reference/benchmarks/1d-consolidation-des3d_traction.cfg",
        chunk=200)
    _check(rows, 2e-2)
