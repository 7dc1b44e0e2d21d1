"""Flattened symmetric tensor helpers.

Component order matches the reference (fields.cxx:408-483):
  2D: [xx, zz, xz]          (NSTR = 3)
  3D: [xx, yy, zz, xy, xz, yz]  (NSTR = 6)
Reference: trace / second_invariant2 / second_invariant (utils.hpp:172-201).
"""

from __future__ import annotations

import jax.numpy as jnp


def ndims_of(nstr: int) -> int:
    return 2 if nstr == 3 else 3


def trace(t: jnp.ndarray) -> jnp.ndarray:
    """Trace of flattened symmetric tensors, shape (..., NSTR)."""
    nstr = t.shape[-1]
    if nstr == 3:
        return t[..., 0] + t[..., 1]
    return t[..., 0] + t[..., 1] + t[..., 2]


def second_invariant2(t: jnp.ndarray) -> jnp.ndarray:
    """Squared second invariant of the deviatoric part (utils.hpp:183-193)."""
    nstr = t.shape[-1]
    if nstr == 3:
        return 0.25 * (t[..., 0] - t[..., 1]) ** 2 + t[..., 2] ** 2
    a = (t[..., 0] + t[..., 1] + t[..., 2]) / 3.0
    return (0.5 * ((t[..., 0] - a) ** 2 + (t[..., 1] - a) ** 2 +
                   (t[..., 2] - a) ** 2)
            + t[..., 3] ** 2 + t[..., 4] ** 2 + t[..., 5] ** 2)


def second_invariant(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(second_invariant2(t))
