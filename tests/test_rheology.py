"""Constitutive-model unit tests against scalar transcriptions of
rheology.cxx."""

import math

import numpy as np
import jax.numpy as jnp

from dynearthsol_tpu.ops import rheology as R


def test_elastic_increment_2d():
    K, G = 1e9, 5e8
    de = np.array([[1e-4, -2e-4, 3e-5]])
    s0 = np.array([[1e6, 2e6, -5e5]])
    out = np.asarray(R.elastic(jnp.full(1, K), jnp.full(1, G),
                               jnp.asarray(de), jnp.asarray(s0)))
    lam = K - 2 / 3 * G
    dev = de[0, 0] + de[0, 1]
    exp = s0.copy()
    exp[0, 0] += 2 * G * de[0, 0] + lam * dev
    exp[0, 1] += 2 * G * de[0, 1] + lam * dev
    exp[0, 2] += 2 * G * de[0, 2]
    np.testing.assert_allclose(out, exp, rtol=1e-14)


def test_maxwell_single_element_relaxation():
    """Deviatoric stress under constant pure shear follows
    s(t) = 2 eps eta (1 - exp(-G t / eta)) — the discrete maxwell() update
    (rheology.cxx:264-281) must track it closely for dt << eta/G."""
    K, G, eta = 1e12, 1e10, 1e22
    eps = 1e-14
    dt = 1e6
    n_steps = 20000
    de = jnp.asarray([[-eps * dt, eps * dt, 0.0]])
    bulk = jnp.full(1, K)
    shear = jnp.full(1, G)
    visc = jnp.full(1, eta)
    dv = jnp.zeros(1)

    import jax

    def body(s, _):
        return R.maxwell(bulk, shear, visc, dt, dv, de, s), None

    s, _ = jax.lax.scan(body, jnp.zeros((1, 3)), length=n_steps)
    t = n_steps * dt
    ana = 2 * eps * eta * (1 - math.exp(-G * t / eta))
    assert abs(float(s[0, 1]) - ana) / ana < 1e-3


def _ep2d_scalar(K, G, amc, anphi, anpsi, hardn, ten_max, de, s, syy):
    """Direct scalar transcription of elasto_plastic2d (rheology.cxx:459-674)
    used as the oracle."""
    a1 = K + 4 / 3 * G
    a2 = K - 2 / 3 * G
    sxx = s[0] + de[1] * a2 + de[0] * a1
    szz = s[1] + de[0] * a2 + de[1] * a1
    sxz = s[2] + de[2] * 2 * G
    syy = syy + (de[0] + de[1]) * a2

    s0 = 0.5 * (sxx + szz)
    rad = 0.5 * math.sqrt((sxx - szz) ** 2 + 4 * sxz * sxz)
    si, sii = s0 - rad, s0 + rad
    if rad > 1e-15:
        cos2t = 0.5 * (szz - sxx) / rad
        sin2t = -sxz / rad
    else:
        cos2t, sin2t = 1.0, 0.0
    if syy > sii:
        n1, n2, n3 = 0, 1, 2
        p = [si, sii, syy]
    elif syy < si:
        n1, n2, n3 = 1, 2, 0
        p = [syy, si, sii]
    else:
        n1, n2, n3 = 0, 2, 1
        p = [si, syy, sii]

    depls = 0.0
    if p[0] >= ten_max:
        return [ten_max, ten_max, 0.0], ten_max, 0.0
    if p[1] >= ten_max:
        p[1] = p[2] = ten_max
    elif p[2] >= ten_max:
        p[2] = ten_max

    fs = p[0] - p[2] * anphi + amc
    if fs >= 0.0:
        return [sxx, szz, sxz], syy, 0.0

    alams = fs / (a1 - a2 * anpsi + a1 * anphi * anpsi - a2 * anphi + hardn)
    p[0] -= alams * (a1 - a2 * anpsi)
    p[1] -= alams * (a2 - a2 * anpsi)
    p[2] -= alams * (a2 - a1 * anpsi)
    depls = 0.5 * abs(alams + alams * anpsi)

    if p[0] >= ten_max:
        return [ten_max, ten_max, 0.0], ten_max, depls
    if p[1] >= ten_max:
        p[1] = p[2] = ten_max
    elif p[2] >= ten_max:
        p[2] = ten_max

    dc2 = (p[n1] - p[n2]) * cos2t
    dss = p[n1] + p[n2]
    return ([0.5 * (dss + dc2), 0.5 * (dss - dc2),
             0.5 * (p[n1] - p[n2]) * sin2t], p[n3], depls)


def test_elasto_plastic2d_matches_scalar_oracle():
    rng = np.random.default_rng(42)
    K, G = 200e6, 200e6
    phi = psi = math.radians(10.0)
    anphi = (1 + math.sin(phi)) / (1 - math.sin(phi))
    anpsi = (1 + math.sin(psi)) / (1 - math.sin(psi))
    coh = 1e6
    amc = 2 * coh * math.sqrt(anphi)
    ten_max = 5.67e6
    hardn = 0.0

    n = 500
    # stress states around the yield surface, strains large enough to yield
    s = rng.normal(scale=3e6, size=(n, 3))
    syy = rng.normal(scale=3e6, size=n)
    de = rng.normal(scale=2e-3, size=(n, 3))

    out_s, out_syy, out_depls, _ = R.elasto_plastic2d(
        jnp.full(n, K), jnp.full(n, G), jnp.full(n, amc), jnp.full(n, anphi),
        jnp.full(n, anpsi), jnp.full(n, hardn), jnp.full(n, ten_max),
        jnp.asarray(de), jnp.asarray(s), jnp.asarray(syy))
    out_s = np.asarray(out_s)
    out_syy = np.asarray(out_syy)
    out_depls = np.asarray(out_depls)

    n_yield = 0
    for i in range(n):
        es, esyy, edepls = _ep2d_scalar(K, G, amc, anphi, anpsi, hardn,
                                        ten_max, de[i], s[i], syy[i])
        np.testing.assert_allclose(out_s[i], es, rtol=1e-10, atol=1e-3)
        np.testing.assert_allclose(out_syy[i], esyy, rtol=1e-10, atol=1e-3)
        np.testing.assert_allclose(out_depls[i], edepls, rtol=1e-10,
                                   atol=1e-15)
        if edepls > 0:
            n_yield += 1
    assert n_yield > 50  # the sample must actually exercise the return map


def test_elasto_plastic_3d_consistency():
    """3D principal return map: uniaxial compression past yield must land on
    the Mohr-Coulomb surface fs = p0 - p2*anphi + amc = 0."""
    K, G = 1e9, 1e9
    phi = math.radians(30.0)
    anphi = (1 + math.sin(phi)) / (1 - math.sin(phi))
    anpsi = 1.0
    coh = 1e6
    amc = 2 * coh * math.sqrt(anphi)
    ten_max = 1e9
    n = 1
    de0 = -5e-3
    de = jnp.asarray([[de0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    s0 = jnp.zeros((n, 6))
    s_new, depls, fmode = R.elasto_plastic(
        jnp.full(n, K), jnp.full(n, G), jnp.full(n, amc), jnp.full(n, anphi),
        jnp.full(n, anpsi), jnp.zeros(n), jnp.full(n, ten_max), de, s0)
    assert float(depls[0]) > 0
    assert int(fmode[0]) == 10

    # hand-computed return map (rheology.cxx:298-457): trial p =
    # (a1*de0, a2*de0, a2*de0); shear correction with the unsorted mapped
    # pair (the reference does not re-sort after the correction).
    a1 = K + 4 / 3 * G
    a2 = K - 2 / 3 * G
    p0, p1, p2 = a1 * de0, a2 * de0, a2 * de0
    fs = p0 - p2 * anphi + amc
    alam = fs / (a1 - a2 * anpsi + a1 * anphi * anpsi - a2 * anphi)
    exp = np.array([p0 - alam * (a1 - a2 * anpsi),
                    p1 - alam * (a2 - a2 * anpsi),
                    p2 - alam * (a2 - a1 * anpsi)])
    got = np.sort(np.asarray(s_new)[0, :3])
    np.testing.assert_allclose(got, np.sort(exp), rtol=1e-9)
    # mapped pair sits exactly on the yield surface
    fs_new = exp[0] - exp[2] * anphi + amc
    assert abs(fs_new) < 1e-6 * coh
