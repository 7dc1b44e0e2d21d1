"""Standalone terrigenous-sedimentation preview
(utils/terrigenous.py in the reference): one increment of the
depth-dependent diffusion over a given surface profile.
"""

from __future__ import annotations

import numpy as np


def terrig(xi, zi, S0, C0, C1, is_strip=False):
    """dh over the surface nodes (utils/terrigenous.py:5-31).  Only the
    submerged (z < 0) nodes receive sediment."""
    xi = np.asarray(xi, dtype=float)
    zi = np.asarray(zi, dtype=float)
    ind = zi < 0
    x, z = xi[ind], zi[ind]
    if x.size < 2:
        return np.zeros_like(xi)
    si = np.concatenate([[0.0], np.diff(z) / np.diff(x), [0.0]])
    si[0] = si[1] - S0 / C0
    si[-1] = si[-2]
    dh = C0 * np.exp(-C1 * z) * np.diff(si) / np.gradient(x)
    if is_strip:
        is_terrig = True
        for i in range(len(dh)):
            if is_terrig:
                if dh[i] <= 0:
                    is_terrig = False
                elif i > 0 and dh[i] > dh[i - 1]:
                    dh[i] = dh[i - 1]
            else:
                dh[i] = 0.0
    out = np.zeros_like(xi)
    out[ind] = dh
    return out
