"""Constitutive stress updates, vectorized over all elements.

Reference: rheology.cxx.  Every function here is the branch-free (masked)
re-expression of the per-element switch in ``update_stress``
(rheology.cxx:676-991): elastic (235), maxwell (264), viscous (284),
Mohr-Coulomb return map ``elasto_plastic`` (298-457) and the geoFLAC
plane-strain variant ``elasto_plastic2d`` (459-674), and the EVP selection
rule (min of viscoelastic vs elastoplastic deviatoric magnitude, 869-879).

All element-level control flow becomes jnp.where masks so the whole update
compiles to a single fused elementwise XLA kernel (VPU-bound on TPU).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .tensor import second_invariant2, trace

_EPS = 1e-15


def elastic2_c(bulkm, shearm, de, s, dpp=None):
    """Componentwise 2D incremental elasticity (rheology.cxx:235-261).
    de/s are (xx, zz, xz) tuples of same-shape arrays — any shape works
    ((nelem,) columns or structured-grid planes)."""
    lam = bulkm - 2.0 / 3.0 * shearm
    diag_inc = lam * (de[0] + de[1]) + (0.0 if dpp is None else dpp)
    return (s[0] + 2.0 * shearm * de[0] + diag_inc,
            s[1] + 2.0 * shearm * de[1] + diag_inc,
            s[2] + 2.0 * shearm * de[2])


def elastic(bulkm, shearm, de, s, dpp=None):
    """Incremental linear elasticity (rheology.cxx:235-246); with the
    effective-stress pore-pressure increment on the diagonal when dpp is
    given (rheology.cxx:250-261)."""
    ndims = 2 if s.shape[-1] == 3 else 3
    if ndims == 2:
        out = elastic2_c(bulkm, shearm,
                         (de[:, 0], de[:, 1], de[:, 2]),
                         (s[:, 0], s[:, 1], s[:, 2]), dpp)
        return jnp.stack(out, axis=1)
    out = elastic3_c(bulkm, shearm, tuple(de[:, i] for i in range(6)),
                     tuple(s[:, i] for i in range(6)), dpp)
    return jnp.stack(out, axis=1)


def elastic3_c(bulkm, shearm, de, s, dpp=None):
    """Componentwise 3D incremental elasticity (rheology.cxx:235-261).
    de/s are 6-tuples (xx, yy, zz, xy, xz, yz) of same-shape arrays."""
    lam = bulkm - 2.0 / 3.0 * shearm
    diag_inc = lam * (de[0] + de[1] + de[2]) \
        + (0.0 if dpp is None else dpp)
    return (s[0] + 2.0 * shearm * de[0] + diag_inc,
            s[1] + 2.0 * shearm * de[1] + diag_inc,
            s[2] + 2.0 * shearm * de[2] + diag_inc,
            s[3] + 2.0 * shearm * de[3],
            s[4] + 2.0 * shearm * de[4],
            s[5] + 2.0 * shearm * de[5])


def maxwell3_c(bulkm, shearm, viscosity, dt, dv, de, s):
    """Componentwise 3D Maxwell viscoelasticity (rheology.cxx:264-281)."""
    tmp = 0.5 * dt * shearm / viscosity
    f1 = 1.0 - tmp
    f2 = 1.0 / (1.0 + tmp)
    dev = (de[0] + de[1] + de[2]) / 3.0
    s0 = (s[0] + s[1] + s[2]) / 3.0
    bdv = bulkm * dv
    iso = tuple(((s[i] - s0) * f1 + 2.0 * shearm * (de[i] - dev)) * f2
                + s0 + bdv for i in range(3))
    dev_c = tuple((s[i] * f1 + 2.0 * shearm * de[i]) * f2
                  for i in range(3, 6))
    return iso + dev_c


def viscous3_c(bulkm, viscosity, total_dv, edot):
    """Componentwise 3D viscous flow (rheology.cxx:284-296)."""
    dev = (edot[0] + edot[1] + edot[2]) / 3.0
    return tuple(2.0 * viscosity * (edot[i] - dev) + bulkm * total_dv
                 for i in range(3)) \
        + tuple(2.0 * viscosity * edot[i] for i in range(3, 6))


def elasto_plastic3_c(bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                      de, s, dpp=None):
    """Componentwise 3D Mohr-Coulomb return map in principal axes
    (rheology.cxx:298-457) using the branch-free analytic eigensolver
    (eig3.py; the reference uses dsyevh3).  de/s are 6-tuples.
    Returns (s_new 6-tuple, depls, failure_mode)."""
    from .eig3 import eigh3_c

    st = elastic3_c(bulkm, shearm, de, s, dpp)
    (pmin, pmid, pmax), (v0, v1, v2) = eigh3_c(*st)

    a1 = bulkm + 4.0 / 3.0 * shearm
    a2 = bulkm - 2.0 / 3.0 * shearm

    fs = pmin - pmax * anphi + amc
    ft = pmax - ten_max
    no_fail = (fs > 0.0) & (ft < 0.0)

    pa = jnp.sqrt(1.0 + anphi * anphi) + anphi
    ps = ten_max * anphi - amc
    h = pmax - ten_max + pa * (pmin - ps)
    shear_fail = h < 0.0

    alam_s = fs / (a1 - a2 * anpsi + a1 * anphi * anpsi - a2 * anphi
                   + 2.0 * jnp.sqrt(anphi) * hardn)
    alam_t = ft / a1
    alam = jnp.where(shear_fail, alam_s, alam_t)

    dpls_shear = jnp.abs(alam) * jnp.sqrt((7.0 + 4.0 * anpsi
                                           + 7.0 * anpsi * anpsi) / 18.0)
    # python-level sqrt: jnp.sqrt on a python scalar makes an f64
    # constant under global x64, which Mosaic (the fused 3D Pallas
    # kernel, ops/pallas3d.py) refuses to lower
    dpls_tens = jnp.abs(alam) * math.sqrt(7.0 / 18.0)
    depls = jnp.where(no_fail, 0.0,
                      jnp.where(shear_fail, dpls_shear, dpls_tens))

    d_min = jnp.where(shear_fail, alam * (a1 - a2 * anpsi), alam * a2)
    d_mid = jnp.where(shear_fail, alam * (a2 - a2 * anpsi), alam * a2)
    d_max = jnp.where(shear_fail, alam * (a2 - a1 * anpsi), alam * a1)
    p_new = (pmin - d_min, pmid - d_mid, pmax - d_max)

    # rotate back: ss_ab = sum_k p_k v_k[a] v_k[b]
    vs = (v0, v1, v2)

    def rec(a, b):
        return sum(p_new[k] * vs[k][a] * vs[k][b] for k in range(3))

    ret = (rec(0, 0), rec(1, 1), rec(2, 2), rec(0, 1), rec(0, 2),
           rec(1, 2))
    s_new = tuple(jnp.where(no_fail, t, r) for t, r in zip(st, ret))
    failure_mode = jnp.where(no_fail, 0, jnp.where(shear_fail, 10, 1))
    return s_new, depls, failure_mode


def maxwell2_c(bulkm, shearm, viscosity, dt, dv, de, s):
    """Componentwise 2D Maxwell viscoelasticity (rheology.cxx:264-281)."""
    tmp = 0.5 * dt * shearm / viscosity
    f1 = 1.0 - tmp
    f2 = 1.0 / (1.0 + tmp)
    dev = (de[0] + de[1]) / 2.0
    s0 = (s[0] + s[1]) / 2.0
    bdv = bulkm * dv
    return (((s[0] - s0) * f1 + 2.0 * shearm * (de[0] - dev)) * f2 + s0
            + bdv,
            ((s[1] - s0) * f1 + 2.0 * shearm * (de[1] - dev)) * f2 + s0
            + bdv,
            (s[2] * f1 + 2.0 * shearm * de[2]) * f2)


def maxwell(bulkm, shearm, viscosity, dt, dv, de, s):
    """Maxwell viscoelasticity (rheology.cxx:264-281)."""
    ndims = 2 if s.shape[-1] == 3 else 3
    if ndims == 2:
        out = maxwell2_c(bulkm, shearm, viscosity, dt, dv,
                         (de[:, 0], de[:, 1], de[:, 2]),
                         (s[:, 0], s[:, 1], s[:, 2]))
        return jnp.stack(out, axis=1)
    out = maxwell3_c(bulkm, shearm, viscosity, dt, dv,
                     tuple(de[:, i] for i in range(6)),
                     tuple(s[:, i] for i in range(6)))
    return jnp.stack(out, axis=1)


def viscous2_c(bulkm, viscosity, total_dv, edot):
    """Componentwise 2D viscous flow (rheology.cxx:284-296)."""
    dev = (edot[0] + edot[1]) / 2.0
    return (2.0 * viscosity * (edot[0] - dev) + bulkm * total_dv,
            2.0 * viscosity * (edot[1] - dev) + bulkm * total_dv,
            2.0 * viscosity * edot[2])


def viscous(bulkm, viscosity, total_dv, edot, s):
    """Pure viscous with bulk-modulus incompressibility penalty
    (rheology.cxx:284-296)."""
    ndims = 2 if s.shape[-1] == 3 else 3
    if ndims == 2:
        out = viscous2_c(bulkm, viscosity, total_dv,
                         (edot[:, 0], edot[:, 1], edot[:, 2]))
        return jnp.stack(out, axis=1)
    out = viscous3_c(bulkm, viscosity, total_dv,
                     tuple(edot[:, i] for i in range(6)))
    return jnp.stack(out, axis=1)


def principal_stresses2(s):
    """2D principal stresses from the Mohr circle (rheology.cxx:72-105).
    Returns p0 <= p1 and (cos2t, sin2t)."""
    s0 = 0.5 * (s[:, 0] + s[:, 1])
    rad = jnp.sqrt(0.25 * (s[:, 0] - s[:, 1]) ** 2 + s[:, 2] ** 2)
    p0 = s0 - rad
    p1 = s0 + rad
    a = 0.5 * (s[:, 0] - s[:, 1])
    b = -rad
    ok = b < -_EPS
    safe_b = jnp.where(ok, b, 1.0)
    cos2t = jnp.where(ok, a / safe_b, 1.0)
    sin2t = jnp.where(ok, s[:, 2] / safe_b, 0.0)
    return p0, p1, cos2t, sin2t


def principal_stresses3(s):
    """3D principal stresses and directions via the branch-free analytic
    symmetric eigensolver (rheology.cxx:13-70 uses Kopp's dsyevh3; eig3.py
    is the TPU-native equivalent — jnp.linalg.eigh lowers to an iterative
    QR custom call that neither tiles nor fuses).  Eigenvalues ascend."""
    from .eig3 import eigh3_c

    (l0, l1, l2), (v0, v1, v2) = eigh3_c(
        s[:, 0], s[:, 1], s[:, 2], s[:, 3], s[:, 4], s[:, 5])
    p = jnp.stack([l0, l1, l2], axis=1)
    # v[:, comp, k] = component `comp` of eigenvector k (eigh convention)
    v = jnp.stack([jnp.stack(vk, axis=1) for vk in (v0, v1, v2)], axis=2)
    return p, v


def elasto_plastic(bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                   de, s, dpp=None):
    """Mohr-Coulomb return map in principal axes (rheology.cxx:298-457).

    Works for 2D (NSTR=3) and 3D (NSTR=6).  Returns (s_new, depls,
    failure_mode).
    """
    nstr = s.shape[-1]
    ndims = 2 if nstr == 3 else 3
    if ndims == 3:
        out, depls, fmode = elasto_plastic3_c(
            bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
            tuple(de[:, i] for i in range(6)),
            tuple(s[:, i] for i in range(6)), dpp)
        return jnp.stack(out, axis=1), depls, fmode

    s_trial = elastic(bulkm, shearm, de, s, dpp)

    a1 = bulkm + 4.0 / 3.0 * shearm
    a2 = bulkm - 2.0 / 3.0 * shearm

    p0, p1, cos2t, sin2t = principal_stresses2(s_trial)
    pmin, pmax = p0, p1

    fs = pmin - pmax * anphi + amc
    ft = pmax - ten_max
    no_fail = (fs > 0.0) & (ft < 0.0)

    pa = jnp.sqrt(1.0 + anphi * anphi) + anphi
    ps = ten_max * anphi - amc
    h = pmax - ten_max + pa * (pmin - ps)
    shear_fail = h < 0.0

    alam_s = fs / (a1 - a2 * anpsi + a1 * anphi * anpsi - a2 * anphi
                   + 2.0 * jnp.sqrt(anphi) * hardn)
    alam_t = ft / a1
    alam = jnp.where(shear_fail, alam_s, alam_t)

    dpls_shear = jnp.abs(alam) * jnp.sqrt((3.0 + 2.0 * anpsi
                                           + 3.0 * anpsi * anpsi) / 8.0)
    dpls_tens = jnp.abs(alam) * math.sqrt(3.0 / 8.0)  # see 3D note above
    depls = jnp.where(no_fail, 0.0,
                      jnp.where(shear_fail, dpls_shear, dpls_tens))

    d_min = jnp.where(shear_fail, alam * (a1 - a2 * anpsi), alam * a2)
    d_max = jnp.where(shear_fail, alam * (a2 - a1 * anpsi), alam * a1)
    pmin_new = pmin - d_min
    pmax_new = pmax - d_max

    dc2 = (pmin_new - pmax_new) * cos2t
    dss = pmin_new + pmax_new
    s_ret = jnp.stack([0.5 * (dss + dc2),
                       0.5 * (dss - dc2),
                       0.5 * (pmin_new - pmax_new) * sin2t], axis=1)

    s_new = jnp.where(no_fail[:, None], s_trial, s_ret)
    failure_mode = jnp.where(no_fail, 0, jnp.where(shear_fail, 10, 1))
    return s_new, depls, failure_mode


def elasto_plastic2d(bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                     de, s, syy, dpp=None):
    """geoFLAC plane-strain Mohr-Coulomb return map (rheology.cxx:459-674).

    Three principal stresses; syy (out-of-plane) carried separately.
    Returns (s_new (N,3), syy_new, depls, failure_mode).
    """
    out, syy_n, depls, fmode = elasto_plastic2d_c(
        bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
        (de[:, 0], de[:, 1], de[:, 2]),
        (s[:, 0], s[:, 1], s[:, 2]), syy, dpp)
    return jnp.stack(out, axis=1), syy_n, depls, fmode


def elasto_plastic2d_c(bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                       de, s, syy, dpp=None):
    """Componentwise geoFLAC plane-strain Mohr-Coulomb return map
    (rheology.cxx:459-674).  de/s are (xx, zz, xz) tuples of same-shape
    arrays (flat element columns or structured-grid planes).
    Returns ((sxx, szz, sxz), syy_new, depls, failure_mode)."""
    a1 = bulkm + 4.0 / 3.0 * shearm
    a2 = bulkm - 2.0 / 3.0 * shearm
    sxx = s[0] + de[1] * a2 + de[0] * a1
    szz = s[1] + de[0] * a2 + de[1] * a1
    sxz = s[2] + de[2] * 2.0 * shearm
    syy_t = syy + (de[0] + de[1]) * a2
    if dpp is not None:
        sxx = sxx + dpp
        syy_t = syy_t + dpp
        szz = szz + dpp

    s0 = 0.5 * (sxx + szz)
    rad = 0.5 * jnp.sqrt((sxx - szz) ** 2 + 4.0 * sxz * sxz)
    si = s0 - rad
    sii = s0 + rad
    ok = rad > _EPS
    # typed scalar branches: weak python-float scalars in where() become
    # f64 scalar constants + truncf under x64, which Mosaic rejects
    one = jnp.asarray(1.0, dtype=rad.dtype)
    zero = jnp.asarray(0.0, dtype=rad.dtype)
    safe_rad = jnp.where(ok, rad, one)
    cos2t = jnp.where(ok, 0.5 * (szz - sxx) / safe_rad, one)
    sin2t = jnp.where(ok, -sxz / safe_rad, zero)

    # sort syy into the (si, sii) pair -> sorted p[0..2] and the positions of
    # the in-plane pair and syy within it (rheology.cxx:537-568)
    caseA = syy_t > sii  # syy is largest
    caseB = syy_t < si   # syy is smallest
    p0 = jnp.where(caseA, si, jnp.where(caseB, syy_t, si))
    p1 = jnp.where(caseA, sii, jnp.where(caseB, si, syy_t))
    p2 = jnp.where(caseA, syy_t, jnp.where(caseB, sii, sii))
    # sorted-slot indices of si / sii / syy: keep everything int32
    # explicitly -- weak python ints promote to int64 under x64, which the
    # Pallas TPU trace path cannot convert (infinite recursion in
    # convert_element_type), and Mosaic has no int64 anyway
    def _i(v):
        return jnp.asarray(v, dtype=jnp.int32)

    idx_si = jnp.where(caseA, _i(0), jnp.where(caseB, _i(1), _i(0)))
    idx_sii = jnp.where(caseA, _i(1), jnp.where(caseB, _i(2), _i(2)))
    idx_syy = jnp.where(caseA, _i(2), jnp.where(caseB, _i(0), _i(1)))

    fmode = jnp.zeros_like(sxx, dtype=jnp.int32)

    # tensile scenario 1: p0 >= ten_max -> everything capped, done
    # (rheology.cxx:587-592)
    t1 = p0 >= ten_max

    # tensile scenarios 2/3 (rheology.cxx:597-608)
    t2 = (~t1) & (p1 >= ten_max)
    t3 = (~t1) & (~t2) & (p2 >= ten_max)
    p1 = jnp.where(t2, ten_max, p1)
    p2 = jnp.where(t2 | t3, ten_max, p2)
    fmode = fmode + jnp.where(t1, _i(1), _i(0)) \
        + jnp.where(t2, _i(2), _i(0)) + jnp.where(t3, _i(3), _i(0))

    # shear yield (rheology.cxx:611-631)
    fs = p0 - p2 * anphi + amc
    elastic_out = (~t1) & (fs >= 0.0)  # keep trial stress

    shear = (~t1) & (fs < 0.0)
    alams = fs / (a1 - a2 * anpsi + a1 * anphi * anpsi - a2 * anphi + hardn)
    p0s = p0 - alams * (a1 - a2 * anpsi)
    p1s = p1 - alams * (a2 - a2 * anpsi)
    p2s = p2 - alams * (a2 - a1 * anpsi)
    depls = jnp.where(shear, 0.5 * jnp.abs(alams + alams * anpsi), 0.0)
    fmode = fmode + jnp.where(shear, _i(10), _i(0))

    # post-shear tensile recheck (rheology.cxx:640-661)
    u1 = shear & (p0s >= ten_max)
    u2 = shear & (~u1) & (p1s >= ten_max)
    u3 = shear & (~u1) & (~u2) & (p2s >= ten_max)
    p1s = jnp.where(u2, ten_max, p1s)
    p2s = jnp.where(u2 | u3, ten_max, p2s)
    fmode = fmode + jnp.where(u1 | u2 | u3, _i(20), _i(0))

    # rotate principal stresses back (rheology.cxx:665-673).  idx is in
    # {0,1,2}: a two-level select stays elementwise (a 3-wide
    # take_along_axis lowers to a per-element gather on TPU)
    def pick(idx):
        return jnp.where(idx == 0, p0s, jnp.where(idx == 1, p1s, p2s))

    pn1 = pick(idx_si)
    pn2 = pick(idx_sii)
    pn3 = pick(idx_syy)
    dc2 = (pn1 - pn2) * cos2t
    dss = pn1 + pn2
    sxx_r = 0.5 * (dss + dc2)
    szz_r = 0.5 * (dss - dc2)
    sxz_r = 0.5 * (pn1 - pn2) * sin2t
    syy_r = pn3

    # full-cap outcome (t1 before shear, u1 after)
    cap = t1 | u1
    sxx_n = jnp.where(cap, ten_max, jnp.where(elastic_out, sxx, sxx_r))
    szz_n = jnp.where(cap, ten_max, jnp.where(elastic_out, szz, szz_r))
    sxz_n = jnp.where(cap, 0.0, jnp.where(elastic_out, sxz, sxz_r))
    syy_n = jnp.where(cap, ten_max, jnp.where(elastic_out, syy_t, syy_r))
    depls = jnp.where(cap & t1, 0.0, depls)

    return (sxx_n, szz_n, sxz_n), syy_n, depls, fmode


def slip_rate2(s, vmean):
    """Slip-rate magnitude: project element-mean velocity onto the maximum
    shear direction from the Mohr circle (rheology.cxx:107-148
    compute_slip_rate2)."""
    rad = second_invariant2(s) ** 0.5
    a = 0.5 * (s[:, 0] - s[:, 1])
    b = -rad
    ok = b < -_EPS
    safe_b = jnp.where(ok, b, 1.0)
    cos2t = jnp.where(ok, a / safe_b, 1.0)
    sin2t = jnp.where(ok, s[:, 2] / safe_b, 0.0)
    theta_shear = 0.5 * jnp.arctan2(sin2t, cos2t)
    dx = jnp.cos(theta_shear + jnp.pi / 4)
    dz = jnp.sin(theta_shear + jnp.pi / 4)
    return jnp.abs(vmean[:, 0] * dx + vmean[:, 1] * dz)


def slip_rate3(s, vmean):
    """3D slip rate: velocity projected onto the two shear directions of the
    maximum-shear plane from the principal frame (rheology.cxx:151-194
    compute_slip_rate3)."""
    p, v = principal_stresses3(s)  # ascending eigenvalues, columns of v
    tau1 = 0.5 * jnp.abs(p[:, 2] - p[:, 1])
    tau2 = 0.5 * jnp.abs(p[:, 2] - p[:, 0])
    tau3 = 0.5 * jnp.abs(p[:, 1] - p[:, 0])
    idx = jnp.where((tau2 >= tau1) & (tau2 >= tau3), 1,
                    jnp.where((tau3 >= tau1) & (tau3 >= tau2), 2, 0))
    i1 = (idx + 1) % 3
    i2 = (idx + 2) % 3
    d1 = jnp.take_along_axis(v, i1[:, None, None].repeat(3, axis=1), axis=2
                             )[..., 0]
    d2 = jnp.take_along_axis(v, i2[:, None, None].repeat(3, axis=1), axis=2
                             )[..., 0]
    m1 = (vmean * d1).sum(axis=1)
    m2 = (vmean * d2).sum(axis=1)
    return jnp.sqrt(m1 * m1 + m2 * m2)
