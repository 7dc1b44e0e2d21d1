"""Velocity and stress boundary conditions.

Reference: bc.cxx.  ``apply_vbcs`` (bc.cxx:201-630) is a per-node switch over
the vbc type of each boundary; here the types are *static* config so the
switch unrolls at trace time into a handful of masked jnp.where updates.
Order matters and is preserved: X faces first, (Y faces in 3D), inclined N
boundaries, then Z last (bc.cxx:563 "Z, must be dealt last") so corner nodes
get the reference's precedence.

vbc type meanings (bc.cxx:206-214):
  0: all components free
  1: normal fixed, shear free
  2: normal free, shear fixed at 0
  3: normal fixed, shear fixed at 0
  4: tangential prescribed, normal 0 (2D); one tangential fixed + vz=0 (3D)
  5: normal 0, in-plane shear prescribed, vz=0 (3D only)
  6: normal prescribed + lateral shear prescribed
  7: normal prescribed, lateral shear 0 (3D)
  100: v_axis = value * own coordinate along axis — uniform-strain-rate
       loading used by the Maxwell analytic benchmark (benchmarks/maxwell.diff)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (BOUNDX0, BOUNDX1, BOUNDY0, BOUNDY1, BOUNDZ0, BOUNDZ1,
                        YEAR2SEC)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["x0", "x1", "y0", "y1", "z0", "z1",
                 "div_frac_x0", "div_frac_x1", "ratio_x0", "ratio_x1",
                 "period_time_x0", "period_ratio_x0",
                 "period_time_x1", "period_ratio_x1"],
    meta_fields=["ndims", "types", "values", "values_lateral",
                 "bottom_shear_zone_thickness", "vbc_val_z1_loading_period"])
@dataclass(frozen=True)
class VBCSpec:
    """Static velocity-BC description (types/values from Param.bc;
    node masks from Topology.bcflag)."""

    ndims: int
    # boolean node masks
    x0: jnp.ndarray
    x1: jnp.ndarray
    y0: jnp.ndarray
    y1: jnp.ndarray
    z0: jnp.ndarray
    z1: jnp.ndarray
    types: Tuple[int, ...]  # order: x0 x1 y0 y1 z0 z1
    values: Tuple[float, ...]
    values_lateral: Tuple[float, ...]  # x0 x1 y0 y1
    # vertical profile tables for 2D X faces
    div_frac_x0: np.ndarray  # (4,)
    div_frac_x1: np.ndarray
    ratio_x0: np.ndarray  # (4,)
    ratio_x1: np.ndarray
    period_time_x0: np.ndarray
    period_ratio_x0: np.ndarray
    period_time_x1: np.ndarray
    period_ratio_x1: np.ndarray
    bottom_shear_zone_thickness: float
    vbc_val_z1_loading_period: float

    @staticmethod
    def from_param(param, bcflag: np.ndarray) -> "VBCSpec":
        bc = param.bc
        flags = np.asarray(bcflag)

        def mask(bit):
            return jnp.asarray((flags & bit) != 0)

        return VBCSpec(
            ndims=param.sim.ndims,
            x0=mask(BOUNDX0), x1=mask(BOUNDX1),
            y0=mask(BOUNDY0), y1=mask(BOUNDY1),
            z0=mask(BOUNDZ0), z1=mask(BOUNDZ1),
            types=(bc.vbc_x0, bc.vbc_x1, bc.vbc_y0, bc.vbc_y1,
                   bc.vbc_z0, bc.vbc_z1),
            values=(bc.vbc_val_x0, bc.vbc_val_x1, bc.vbc_val_y0,
                    bc.vbc_val_y1, bc.vbc_val_z0, bc.vbc_val_z1),
            values_lateral=(bc.vbc_val_x0_l, bc.vbc_val_x1_l,
                            bc.vbc_val_y0_l, bc.vbc_val_y1_l),
            div_frac_x0=np.array([0.0, bc.vbc_val_division_x0_min,
                                  bc.vbc_val_division_x0_max, 1.0]),
            div_frac_x1=np.array([0.0, bc.vbc_val_division_x1_min,
                                  bc.vbc_val_division_x1_max, 1.0]),
            ratio_x0=np.array([bc.vbc_val_x0_ratio0, bc.vbc_val_x0_ratio1,
                               bc.vbc_val_x0_ratio2, bc.vbc_val_x0_ratio3]),
            ratio_x1=np.array([bc.vbc_val_x1_ratio0, bc.vbc_val_x1_ratio1,
                               bc.vbc_val_x1_ratio2, bc.vbc_val_x1_ratio3]),
            period_time_x0=np.asarray(bc.vbc_period_x0_time_in_yr),
            period_ratio_x0=np.asarray(bc.vbc_period_x0_ratio),
            period_time_x1=np.asarray(bc.vbc_period_x1_time_in_yr),
            period_ratio_x1=np.asarray(bc.vbc_period_x1_ratio),
            bottom_shear_zone_thickness=bc.bottom_shear_zone_thickness,
            vbc_val_z1_loading_period=bc.vbc_val_z1_loading_period,
        )


def find_max_vbc(bc, ndims: int) -> float:
    """Max |boundary velocity| over faces with active normal values
    (bc.cxx:66-92)."""
    m = 1e-12  # 0.03 mm/yr floor
    pairs = [(bc.vbc_x0, bc.vbc_val_x0), (bc.vbc_x1, bc.vbc_val_x1),
             (bc.vbc_y0, bc.vbc_val_y0), (bc.vbc_y1, bc.vbc_val_y1),
             (bc.vbc_z0, bc.vbc_val_z0), (bc.vbc_z1, bc.vbc_val_z1)]
    for t, v in pairs:
        if t % 2 == 1 or t == 4:
            m = max(m, abs(v))
    for t, v in [(bc.vbc_n0, bc.vbc_val_n0), (bc.vbc_n1, bc.vbc_val_n1),
                 (bc.vbc_n2, bc.vbc_val_n2), (bc.vbc_n3, bc.vbc_val_n3)]:
        if t % 2 == 1:
            m = max(m, abs(v))
    return m


def _interp1(xp, fp, q):
    return jnp.interp(q, jnp.asarray(xp), jnp.asarray(fp))


def _masked_minmax(values, mask):
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    vmax = jnp.max(jnp.where(mask, values, -big))
    vmin = jnp.min(jnp.where(mask, values, big))
    return vmin, vmax


def apply_vbcs(spec: VBCSpec, vel, coord, time):
    """Apply velocity BCs in the reference's order (bc.cxx:201-630)."""
    if spec.ndims == 3:
        return _apply_vbcs_3d(spec, vel, coord, time)
    return _apply_vbcs_2d(spec, vel, coord, time)


def _set(vel, mask, comp, value):
    """vel[mask, comp] = value (value scalar or per-node array)."""
    value = jnp.asarray(value, dtype=vel.dtype)
    col = jnp.where(mask, value, vel[:, comp])
    return vel.at[:, comp].set(col)


def _apply_vbcs_2d(spec: VBCSpec, vel, coord, time):
    t_now = time / YEAR2SEC
    applied_x0 = spec.values[0] * _interp1(spec.period_time_x0,
                                           spec.period_ratio_x0, t_now)
    applied_x1 = spec.values[1] * _interp1(spec.period_time_x1,
                                           spec.period_ratio_x1, t_now)

    z = coord[:, 1]
    x = coord[:, 0]
    # vertical profile divisions from current boundary extent (bc.cxx:229-278)
    bx0min, bx0max = _masked_minmax(z, spec.x0)
    bx1min, bx1max = _masked_minmax(z, spec.x1)
    w0 = bx0max - bx0min
    # NOTE: the reference computes BOTH faces' divisions from the X0 extent
    # (bc.cxx:275-277); replicated faithfully.
    div0 = jnp.asarray(spec.div_frac_x0) * w0 - bx0max
    div1 = jnp.asarray(spec.div_frac_x1) * w0 - bx0max
    exact_x0 = applied_x0 * jnp.interp(-z, div0, jnp.asarray(spec.ratio_x0))
    exact_x1 = applied_x1 * jnp.interp(-z, div1, jnp.asarray(spec.ratio_x1))

    zmin = jnp.minimum(jnp.min(z), 0.0)

    tx0, tx1, _, _, tz0, tz1 = spec.types
    vx0, vx1, _, _, vz0, vz1 = spec.values
    vx0_l, vx1_l = spec.values_lateral[0], spec.values_lateral[1]

    # --- X0 (bc.cxx:405-434) ---
    m = spec.x0
    if tx0 == 1:
        vel = _set(vel, m, 0, exact_x0)
    elif tx0 == 2:
        vel = _set(vel, m, 1, 0.0)
    elif tx0 == 3:
        v0 = exact_x0
        if spec.bottom_shear_zone_thickness > 0:
            dz = z - zmin
            scale = jnp.clip(dz / spec.bottom_shear_zone_thickness, 0.0, 1.0)
            v0 = v0 * scale
        vel = _set(vel, m, 0, v0)
        vel = _set(vel, m, 1, 0.0)
    elif tx0 == 4:
        vel = _set(vel, m, 0, 0.0)
        vel = _set(vel, m, 1, vx0)
    elif tx0 == 6:
        vel = _set(vel, m, 0, exact_x0)
        vel = _set(vel, m, 1, vx0_l)
    elif tx0 == 100:
        vel = _set(vel, m, 0, vx0 * x)

    # --- X1 (bc.cxx:436-462) ---
    m = spec.x1
    if tx1 == 1:
        vel = _set(vel, m, 0, exact_x1)
    elif tx1 == 2:
        vel = _set(vel, m, 1, 0.0)
    elif tx1 == 3:
        vel = _set(vel, m, 0, exact_x1)
        vel = _set(vel, m, 1, 0.0)
    elif tx1 == 4:
        vel = _set(vel, m, 0, 0.0)
        vel = _set(vel, m, 1, vx1)
    elif tx1 == 6:
        vel = _set(vel, m, 0, exact_x1)
        vel = _set(vel, m, 1, vx1_l)
    elif tx1 == 100:
        vel = _set(vel, m, 0, vx1 * x)

    # --- Z last (bc.cxx:563-629) ---
    m = spec.z0
    if tz0 == 1:
        vel = _set(vel, m, 1, vz0)
    elif tz0 == 2:
        vel = _set(vel, m, 0, 0.0)
    elif tz0 == 3:
        vel = _set(vel, m, 0, 0.0)
        vel = _set(vel, m, 1, vz0)
    elif tz0 == 4:
        vel = _set(vel, m, 0, vz0)
        vel = _set(vel, m, 1, 0.0)
    elif tz0 == 100:
        vel = _set(vel, m, 1, vz0 * z)

    # z1 deactivates after the loading period (bc.cxx:316)
    z1_active = time <= spec.vbc_val_z1_loading_period
    m = spec.z1 & z1_active
    if tz1 == 1:
        vel = _set(vel, m, 1, vz1)
    elif tz1 == 2:
        vel = _set(vel, m, 0, 0.0)
    elif tz1 == 3:
        vel = _set(vel, m, 0, 0.0)
        vel = _set(vel, m, 1, vz1)
    elif tz1 == 4:
        vel = _set(vel, m, 0, vz1)
        vel = _set(vel, m, 1, 0.0)
    elif tz1 == 100:
        vel = _set(vel, m, 1, vz1 * z)

    return vel


def _apply_vbcs_3d(spec: VBCSpec, vel, coord, time):
    """3D lateral faces via the unified handler (bc.cxx:383-403), then Z."""
    tx0, tx1, ty0, ty1, tz0, tz1 = spec.types
    vx0, vx1, vy0, vy1, vz0, vz1 = spec.values
    lx0, lx1, ly0, ly1 = spec.values_lateral

    faces = [
        (spec.x0, 0, 1, tx0, vx0, lx0),
        (spec.x1, 0, 1, tx1, vx1, lx1),
        (spec.y0, 1, 0, ty0, vy0, ly0),
        (spec.y1, 1, 0, ty1, vy1, ly1),
    ]
    for m, ni, li, typ, val, val_l in faces:
        if typ == 0:
            continue
        if typ == 1:
            vel = _set(vel, m, ni, val)
        elif typ == 2:
            vel = _set(vel, m, li, 0.0)
            vel = _set(vel, m, 2, 0.0)
        elif typ == 3:
            vel = _set(vel, m, ni, val)
            vel = _set(vel, m, li, 0.0)
            vel = _set(vel, m, 2, 0.0)
        elif typ == 4:
            vel = _set(vel, m, li, val)
            vel = _set(vel, m, 2, 0.0)
        elif typ == 5:
            vel = _set(vel, m, ni, 0.0)
            vel = _set(vel, m, li, val)
            vel = _set(vel, m, 2, 0.0)
        elif typ == 6:
            vel = _set(vel, m, ni, val)
            vel = _set(vel, m, li, val_l)
        elif typ == 7:
            vel = _set(vel, m, ni, val)
            vel = _set(vel, m, li, 0.0)
        elif typ == 100:
            vel = _set(vel, m, ni, val * coord[:, ni])

    z = coord[:, 2]
    m = spec.z0
    if tz0 == 1:
        vel = _set(vel, m, 2, vz0)
    elif tz0 == 2:
        vel = _set(vel, m, 0, 0.0)
        vel = _set(vel, m, 1, 0.0)
    elif tz0 == 3:
        vel = _set(vel, m, 0, 0.0)
        vel = _set(vel, m, 1, 0.0)
        vel = _set(vel, m, 2, vz0)
    elif tz0 == 100:
        vel = _set(vel, m, 2, vz0 * z)

    z1_active = time <= spec.vbc_val_z1_loading_period
    m = spec.z1 & z1_active
    if tz1 == 1:
        vel = _set(vel, m, 2, vz1)
    elif tz1 == 2:
        vel = _set(vel, m, 0, 0.0)
        vel = _set(vel, m, 1, 0.0)
    elif tz1 == 3:
        vel = _set(vel, m, 0, 0.0)
        vel = _set(vel, m, 1, 0.0)
        vel = _set(vel, m, 2, vz1)
    elif tz1 == 4:
        vel = _set(vel, m, 0, vz1)
        vel = _set(vel, m, 1, 0.0)
        vel = _set(vel, m, 2, 0.0)
    elif tz1 == 100:
        vel = _set(vel, m, 2, vz1 * z)

    return vel


def pp_bc_mask(bc, bcflag: np.ndarray) -> np.ndarray:
    """Pore-pressure Dirichlet mask: node on boundary i with hbc type 1
    (is_boundary_node_for_pp, fields.cxx:286-294)."""
    from .constants import (BOUNDX0, BOUNDX1, BOUNDY0, BOUNDY1, BOUNDZ0,
                            BOUNDZ1)

    bits = (BOUNDX0, BOUNDX1, BOUNDY0, BOUNDY1, BOUNDZ0, BOUNDZ1)
    types = (bc.hbc_x0, bc.hbc_x1, bc.hbc_y0, bc.hbc_y1, bc.hbc_z0,
             bc.hbc_z1)
    mask = np.zeros(bcflag.shape[0], dtype=bool)
    for bit, t in zip(bits, types):
        if t == 1:
            mask |= (bcflag & bit) != 0
    return mask
