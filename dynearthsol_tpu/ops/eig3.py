"""Branch-free closed-form symmetric 3x3 eigensolver.

The reference computes principal stresses with Kopp's dsyevh3 (3x3-C/,
called from rheology.cxx:13-70).  On TPU, batched `jnp.linalg.eigh` lowers
to an iterative QR custom call that neither tiles nor fuses; this module
is the TPU-native equivalent: a fully vectorized, branch-free (masked)
analytic eigensolver in the style of Eberly's "A Robust Eigensolver for
3x3 Symmetric Matrices" — trigonometric Cardano eigenvalues + cross-product
eigenvectors with degenerate-case selection done via jnp.where.

All functions are componentwise: inputs are the 6 unique components as
same-shape arrays (any shape: flat element columns or grid planes), so the
whole solve fuses into the surrounding stress-update kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

_TINY = 1e-30

# Abramowitz & Stegun 4.4.46 acos minimax coefficients, |err| <= 2e-8
_ACOS_C = (1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
           0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911)


def _acos(x):
    """acos(x) for x in [-1, 1] via sqrt(1-x)*poly(x) (A&S 4.4.46,
    |err| <= 2e-8 — exact at f32).  Mosaic (Pallas TPU) lowers cos/sin
    but none of the inverse trig primitives, and the eigensolver runs
    inside the fused 3D Pallas plasticity (ops/pallas3d.py)."""
    ax = jnp.abs(x)
    p = jnp.asarray(_ACOS_C[-1], x.dtype)
    for c in _ACOS_C[-2::-1]:
        p = p * ax + c
    y = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0, jnp.pi - y, y)


def eigvals3_c(axx, ayy, azz, axy, axz, ayz):
    """Eigenvalues (ascending) of symmetric 3x3 via trigonometric Cardano
    (dsyevc3, 3x3-C/dsyevc3.c).  Returns (l0, l1, l2) with l0<=l1<=l2."""
    q = (axx + ayy + azz) / 3.0
    bxx, byy, bzz = axx - q, ayy - q, azz - q
    p2 = (bxx * bxx + byy * byy + bzz * bzz
          + 2.0 * (axy * axy + axz * axz + ayz * ayz)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _TINY))
    # det(B)/2 with B = (A - qI)/p
    ip = 1.0 / p
    cxx, cyy, czz = bxx * ip, byy * ip, bzz * ip
    cxy, cxz, cyz = axy * ip, axz * ip, ayz * ip
    half_det = 0.5 * (cxx * (cyy * czz - cyz * cyz)
                      - cxy * (cxy * czz - cyz * cxz)
                      + cxz * (cxy * cyz - cyy * cxz))
    r = jnp.clip(half_det, -1.0, 1.0)
    phi = _acos(r) / 3.0
    # l2 >= l1 >= l0 by the cosine ordering
    l2 = q + 2.0 * p * jnp.cos(phi)
    l0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l1 = 3.0 * q - l0 - l2
    iso = p2 <= (1e-28 * jnp.maximum(q * q, 1.0))  # (near-)isotropic
    return (jnp.where(iso, q, l0), jnp.where(iso, q, l1),
            jnp.where(iso, q, l2))


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _normalize(x, y, z):
    n2 = x * x + y * y + z * z
    inv = 1.0 / jnp.sqrt(jnp.maximum(n2, _TINY))
    return x * inv, y * inv, z * inv, n2


def _eigvec_for(axx, ayy, azz, axy, axz, ayz, lam):
    """Eigenvector of the MOST separated eigenvalue lam: largest-norm cross
    product of two rows of (A - lam I), selected branch-free."""
    r0 = (axx - lam, axy, axz)
    r1 = (axy, ayy - lam, ayz)
    r2 = (axz, ayz, azz - lam)
    c01 = _cross(*r0, *r1)
    c02 = _cross(*r0, *r2)
    c12 = _cross(*r1, *r2)
    n01 = c01[0] ** 2 + c01[1] ** 2 + c01[2] ** 2
    n02 = c02[0] ** 2 + c02[1] ** 2 + c02[2] ** 2
    n12 = c12[0] ** 2 + c12[1] ** 2 + c12[2] ** 2
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = (~use01) & (n02 >= n12)
    vx = jnp.where(use01, c01[0], jnp.where(use02, c02[0], c12[0]))
    vy = jnp.where(use01, c01[1], jnp.where(use02, c02[1], c12[1]))
    vz = jnp.where(use01, c01[2], jnp.where(use02, c02[2], c12[2]))
    nmax = jnp.maximum(jnp.maximum(n01, n02), n12)
    # rank-deficient (degenerate eigenvalue): fall back to +x; corrected by
    # the caller's orthogonalization
    bad = nmax <= _TINY
    vx = jnp.where(bad, 1.0, vx)
    vy = jnp.where(bad, 0.0, vy)
    vz = jnp.where(bad, 0.0, vz)
    x, y, z, _ = _normalize(vx, vy, vz)
    return x, y, z


def eigh3_c(axx, ayy, azz, axy, axz, ayz):
    """Full eigendecomposition: returns ((l0, l1, l2), V) with ascending
    eigenvalues and V = ((v0x, v0y, v0z), (v1x, ...), (v2x, ...)) an
    orthonormal eigenbasis (dsyevv3 equivalent, branch-free)."""
    l0, l1, l2 = eigvals3_c(axx, ayy, azz, axy, axz, ayz)

    # anchor on the most separated extreme eigenvalue for stability
    sep0 = l1 - l0
    sep2 = l2 - l1
    use_l0 = sep0 >= sep2
    lam_a = jnp.where(use_l0, l0, l2)
    wa = _eigvec_for(axx, ayy, azz, axy, axz, ayz, lam_a)

    # orthonormal complement {u, v} of wa, branch-free
    ux_a, uy_a, uz_a, _ = _normalize(-wa[1], wa[0],
                                     jnp.zeros_like(wa[0]))
    ux_b, uy_b, uz_b, _ = _normalize(jnp.zeros_like(wa[0]), -wa[2], wa[1])
    pick = jnp.abs(wa[2]) <= jnp.abs(wa[0])
    ux = jnp.where(pick, ux_a, ux_b)
    uy = jnp.where(pick, uy_a, uy_b)
    uz = jnp.where(pick, uz_a, uz_b)
    vx, vy, vz = _cross(*wa, ux, uy, uz)

    # middle eigenvector from the 2x2 projection of A onto span{u, v}
    def amul(x, y, z):
        return (axx * x + axy * y + axz * z,
                axy * x + ayy * y + ayz * z,
                axz * x + ayz * y + azz * z)

    au = amul(ux, uy, uz)
    av = amul(vx, vy, vz)
    muu = ux * au[0] + uy * au[1] + uz * au[2] - l1
    mvv = vx * av[0] + vy * av[1] + vz * av[2] - l1
    muv = ux * av[0] + uy * av[1] + uz * av[2]
    # null vector of [[muu, muv], [muv, mvv]]: use the larger row
    row0 = (muu * muu + muv * muv) >= (mvv * mvv + muv * muv)
    ct = jnp.where(row0, -muv, -mvv)
    st = jnp.where(row0, muu, muv)
    nrm = jnp.sqrt(jnp.maximum(ct * ct + st * st, _TINY))
    degenerate = (ct * ct + st * st) <= _TINY
    ct = jnp.where(degenerate, 1.0, ct / nrm)
    st = jnp.where(degenerate, 0.0, st / nrm)
    w1 = (ct * ux + st * vx, ct * uy + st * vy, ct * uz + st * vz)

    wb = _cross(*wa, *w1)
    # order back: wa belongs to l0 (if use_l0) else l2; wb to the other end
    v0 = tuple(jnp.where(use_l0, a, b) for a, b in zip(wa, wb))
    v2 = tuple(jnp.where(use_l0, a, b) for a, b in zip(wb, wa))
    return (l0, l1, l2), (v0, w1, v2)
