"""Free-air / Bouguer gravity from 2D model output
(utils/gravity.py in the reference), fully vectorized.
"""

from __future__ import annotations

import numpy as np

G = 6.67e-11


def elem_area(ecoord):
    """(nelem, 3, 2) corner coords -> triangle areas."""
    ab = ecoord[:, 1, :] - ecoord[:, 0, :]
    ac = ecoord[:, 2, :] - ecoord[:, 0, :]
    return 0.5 * np.abs(ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])


def freeair(points, coord, conn, rho):
    """Vertical gravity at ``points`` (n, 2) from element densities
    (line-mass approximation per element, utils/gravity.py:24-36)."""
    ecoord = coord[conn]
    a = elem_area(ecoord)
    cen = ecoord.mean(axis=1)
    dv = points[:, None, :] - cen[None, :, :]  # (np, ne, 2)
    dr = (dv ** 2).sum(axis=2)
    return 2.0 * G * ((dv[:, :, 1] * a / dr) * rho).sum(axis=1)


def bouguer(points, coord, conn, rho, rho_ref=2670.0, height=3000.0):
    """Bouguer anomaly: free-air minus the slab effect of topography
    above sea level (utils/gravity.py:38-60)."""
    g = freeair(points, coord, conn, rho)
    ecoord = coord[conn]
    cen = ecoord.mean(axis=1)
    above = cen[:, 1] > 0.0
    if above.any():
        a = elem_area(ecoord[above])
        dv = points[:, None, :] - cen[None, above, :]
        dr = (dv ** 2).sum(axis=2)
        g = g - 2.0 * G * rho_ref * (dv[:, :, 1] * a / dr).sum(axis=1)
    return g
