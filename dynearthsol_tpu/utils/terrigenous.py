"""Standalone terrigenous-sedimentation preview.

Same physics as the reference's utility of the same name
(utils/terrigenous.py:5-31): one increment of depth-dependent diffusive
sedimentation over a surface profile, used to preview the [control]
terrig_* parameters before a full run.  Re-derived and vectorized here;
the in-step implementation lives in ops/surface.py (terrigenous_dh).
"""

from __future__ import annotations

import numpy as np


def terrig(xi, zi, S0, C0, C1, is_strip=False):
    """Sedimentation-rate profile dh/dt over surface nodes.

    Only submerged nodes (z < 0) receive sediment.  The rate is the
    divergence of a depth-amplified diffusive flux C0*exp(-C1*z) acting on
    the surface slope, with a source flux S0 entering from the left edge
    (encoded as a slope jump S0/C0 at the first submerged node).

    ``is_strip`` restricts deposition to the contiguous strip attached to
    the source: rates are clamped to be non-increasing along the strip
    (running minimum) and cut to zero past the first non-positive rate.
    """
    xi = np.asarray(xi, dtype=float)
    zi = np.asarray(zi, dtype=float)
    wet = zi < 0
    x, z = xi[wet], zi[wet]
    out = np.zeros_like(xi)
    if x.size < 2:
        return out

    # node-centred slope divergence: pad the segment slopes with ghost
    # values (left ghost carries the source flux, right ghost mirrors)
    slope = np.empty(x.size + 1)
    slope[1:-1] = np.diff(z) / np.diff(x)
    slope[0] = slope[1] - S0 / C0
    slope[-1] = slope[-2]
    rate = C0 * np.exp(-C1 * z) * np.diff(slope) / np.gradient(x)

    if is_strip:
        # strip mode: non-increasing along the strip, zero past the first
        # non-positive rate (the strip detaches from the source there)
        nonpos = rate <= 0
        cut = np.argmax(nonpos) if nonpos.any() else rate.size
        rate = np.where(np.arange(rate.size) <= cut,
                        np.minimum.accumulate(rate), 0.0)

    out[wet] = rate
    return out
