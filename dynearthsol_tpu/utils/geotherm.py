"""Analytic geotherm helpers (utils/geotherm.py in the reference).

Used to cross-check the initial-temperature options of ic.py
(half-space cooling, layered radiogenic conduction) and for
post-processing.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erf

MYRS2SEC = 86400 * 365.2425e6


def half_space_cooling_T(z, T0, Tm, age_in_myrs, alpha):
    """T(z) of a cooling half space (utils/geotherm.py:8-13)."""
    return T0 + (Tm - T0) * erf(z / np.sqrt(4 * alpha * age_in_myrs
                                            * MYRS2SEC))


def _h_integral(z, hr, rhoH0):
    return rhoH0 * hr ** 2 * (1.0 - np.exp(-z / hr))


def continental_radiogenic_T(z, T0, hr, k, qm, rhoH0):
    """Single-layer conductive geotherm with exponentially folded
    radiogenic heating (utils/geotherm.py:15-17)."""
    return T0 + qm / k * z + _h_integral(z, hr, rhoH0) / k


def layered_radiogenic_T(z, T0, Tm, bdy, k, rhoH0, hr):
    """Multi-layer conductive geotherm, the analytic counterpart of
    ic.cxx:907-1010 / ic._layered_radiogenic_geotherm.  ``z`` is depth
    (positive down); returns (T, qm)."""
    bdy = np.asarray(bdy, dtype=float)
    k = np.asarray(k, dtype=float)
    rhoH0 = np.asarray(rhoH0, dtype=float)
    thick = bdy[1:] - bdy[:-1]
    dTh = _h_integral(thick, hr, rhoH0) / k
    qm = (Tm - T0 - dTh.sum()) / thick.sum() \
        * (thick.sum() / (thick / k).sum())
    dt_layer = np.concatenate([[0.0], np.cumsum(dTh + thick * qm / k)])

    z = np.asarray(z, dtype=float)
    T = np.full_like(z, Tm)
    for j in range(len(k)):
        sel = (z >= bdy[j]) & (z <= bdy[j + 1])
        T[sel] = (T0 + dt_layer[j] + qm * (z[sel] - bdy[j]) / k[j]
                  + _h_integral(z[sel] - bdy[j], hr, rhoH0[j]) / k[j])
    T[z <= bdy[0]] = T0
    return T, qm
