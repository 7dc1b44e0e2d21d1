"""P1 shape-function gradients and element volumes, vectorized over elements.

Reference: get_local_shape_fn (fields.cxx:11-54), triangle_area /
tetrahedron_volume / compute_volume (geometry.cxx:35-200).

The reference recomputes the shape-function gradients inside four separate
kernels each step (update_temperature, update_strain_rate, update_force,
rotate_stress).  Here they are computed once per step and reused — that alone
removes ~3 full element passes of HBM traffic.
"""

from __future__ import annotations

import jax.numpy as jnp

from .fastidx import take_rows


def compute_volume_slots(d: jnp.ndarray) -> jnp.ndarray:
    """Volume from pre-gathered corner coords (nelem, npe, ndims)."""
    ndims = d.shape[2]
    if ndims == 2:
        ab = d[:, 1] - d[:, 0]
        ac = d[:, 2] - d[:, 0]
        return 0.5 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    d1 = d[:, 1] - d[:, 0]
    d2 = d[:, 2] - d[:, 0]
    d3 = d[:, 3] - d[:, 0]
    return jnp.einsum("ij,ij->i", d1, jnp.cross(d2, d3)) / 6.0


def compute_volume(coord: jnp.ndarray, conn: jnp.ndarray) -> jnp.ndarray:
    """Triangle area (2D) / tet volume (3D); positive for valid orientation
    (geometry.cxx:135-200)."""
    ndims = coord.shape[1]
    x = take_rows(coord, conn)  # (nelem, npe, ndims)
    if ndims == 2:
        ab = x[:, 1] - x[:, 0]
        ac = x[:, 2] - x[:, 0]
        return 0.5 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    d1 = x[:, 1] - x[:, 0]
    d2 = x[:, 2] - x[:, 0]
    d3 = x[:, 3] - x[:, 0]
    return jnp.einsum("ej,ej->e", d1, jnp.cross(d2, d3)) / 6.0


def shape_fn_gradients(coord: jnp.ndarray, conn: jnp.ndarray,
                       volume: jnp.ndarray) -> jnp.ndarray:
    """Gradients dN_i/dx_d of the P1 shape functions (nodal-array entry;
    gathers corners then calls the slot variant)."""
    return shape_fn_gradients_slots(take_rows(coord, conn), volume)


def shape_fn_gradients_slots(d: jnp.ndarray,
                             volume: jnp.ndarray) -> jnp.ndarray:
    """Gradients dN_i/dx_d of the P1 shape functions from pre-gathered
    corner coordinates d (nelem, npe, ndims).

    Returns (nelem, npe, ndims).  Matches get_local_shape_fn
    (fields.cxx:11-54) exactly (2D: iv = 1/(2A); 3D: iv = 1/(6V)).
    """
    ndims = d.shape[2]
    if ndims == 2:
        iv = 1.0 / (2.0 * volume)
        # shpdx[i] = iv * (z[i+1] - z[i+2]) cyclic; shpdz[i] = iv * (x[i+2] - x[i+1])
        z = d[..., 1]
        x = d[..., 0]
        shpdx = jnp.stack([z[:, 1] - z[:, 2],
                           z[:, 2] - z[:, 0],
                           z[:, 0] - z[:, 1]], axis=1) * iv[:, None]
        shpdz = jnp.stack([x[:, 2] - x[:, 1],
                           x[:, 0] - x[:, 2],
                           x[:, 1] - x[:, 0]], axis=1) * iv[:, None]
        return jnp.stack([shpdx, shpdz], axis=2)

    iv = 1.0 / (6.0 * volume)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    def diff(a, i, j):
        return a[:, i] - a[:, j]

    x01, x02, x03 = diff(x, 0, 1), diff(x, 0, 2), diff(x, 0, 3)
    x12, x13, x23 = diff(x, 1, 2), diff(x, 1, 3), diff(x, 2, 3)
    y01, y02, y03 = diff(y, 0, 1), diff(y, 0, 2), diff(y, 0, 3)
    y12, y13, y23 = diff(y, 1, 2), diff(y, 1, 3), diff(y, 2, 3)
    z01, z02, z03 = diff(z, 0, 1), diff(z, 0, 2), diff(z, 0, 3)
    z12, z13, z23 = diff(z, 1, 2), diff(z, 1, 3), diff(z, 2, 3)

    shpdx = jnp.stack([y13 * z12 - y12 * z13,
                       y02 * z23 - y23 * z02,
                       y13 * z03 - y03 * z13,
                       y01 * z02 - y02 * z01], axis=1) * iv[:, None]
    shpdy = jnp.stack([z13 * x12 - z12 * x13,
                       z02 * x23 - z23 * x02,
                       z13 * x03 - z03 * x13,
                       z01 * x02 - z02 * x01], axis=1) * iv[:, None]
    shpdz = jnp.stack([x13 * y12 - x12 * y13,
                       x02 * y23 - x23 * y02,
                       x13 * y03 - x03 * y13,
                       x01 * y02 - x02 * y01], axis=1) * iv[:, None]
    return jnp.stack([shpdx, shpdy, shpdz], axis=2)
