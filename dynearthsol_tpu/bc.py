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

import dataclasses
import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (BOUNDX0, BOUNDX1, BOUNDY0, BOUNDY1, BOUNDZ0, BOUNDZ1,
                        IBOUNDN0, IBOUNDN3, NBDRYTYPES, YEAR2SEC, dim)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["bcflag"],
    meta_fields=["normals", "values", "all_types", "edge_vecs", "present"])
@dataclass(frozen=True)
class InclinedVBC:
    """Inclined (BOUNDN0-3) velocity BCs: planar boundaries with an
    arbitrary unit normal (bc.cxx:462-560; normals and boundary-pair edge
    vectors from create_boundary_normals, bc.cxx:94-198)."""

    bcflag: jnp.ndarray          # (nnode,) uint32
    normals: tuple               # 4 tuples of ndims floats (n0..n3)
    values: tuple                # 4 floats
    all_types: tuple             # vbc type of each of the 10 boundaries
    edge_vecs: tuple             # ((i, j, (ndims floats)), ...)
    present: tuple               # 4 bools


def compute_boundary_normals(topo, coord: np.ndarray):
    """Unit outward normal of each boundary (from its first facet; inclined
    boundaries are planar by contract) and intersection edge vectors
    (bc.cxx:94-198)."""
    ndims = coord.shape[1]
    d = dim(ndims)
    nof = np.asarray(d.node_of_facet)
    normals = np.zeros((NBDRYTYPES, ndims))
    have = np.zeros(NBDRYTYPES, dtype=bool)
    for i in range(NBDRYTYPES):
        bf = topo.bfacets[i]
        if len(bf) == 0:
            continue
        e, f = bf[0]
        idx = topo.connectivity[e][nof[f]]
        fc = coord[idx]
        if ndims == 2:
            v01 = fc[1] - fc[0]
            n = np.array([v01[1], -v01[0]])
        else:
            n = 0.5 * np.cross(fc[1] - fc[0], fc[2] - fc[0])
        n = n / max(np.linalg.norm(n), 1e-300)
        normals[i] = n
        have[i] = True
    edge_vecs = []
    eps = 1e-15
    for i in range(NBDRYTYPES):
        if not have[i]:
            continue
        for j in range(i + 1, NBDRYTYPES):
            if not have[j]:
                continue
            if ndims == 2:
                sv = np.array([0.0, 1.0])
            elif abs(normals[i][-1]) < eps and abs(normals[j][-1]) < eps:
                sv = np.array([0.0, 0.0, 1.0])
            else:
                sv = np.cross(normals[i], normals[j])
            edge_vecs.append((i, j, tuple(float(x) for x in sv)))
    return normals, have, edge_vecs


def _apply_inclined(spec, vel):
    """Inclined-boundary vbcs (bc.cxx:462-560): applied after the lateral
    faces and before Z, sequentially n0..n3 like the reference."""
    inc = spec.incl
    flags = inc.bcflag
    ndims = spec.ndims
    for ib in range(IBOUNDN0, IBOUNDN3 + 1):
        k = ib - IBOUNDN0
        if not inc.present[k]:
            continue
        ti = inc.all_types[ib]
        if ti not in (1, 3, 11, 13):
            continue
        n = np.asarray(inc.normals[k])
        val = inc.values[k]
        bit = np.uint32(1 << ib)
        on = (flags & bit) != 0
        exact = flags == bit
        nvec = jnp.asarray(n, dtype=vel.dtype)
        if ti == 3:
            vel = jnp.where(on[:, None], val * nvec[None, :], vel)
            continue
        if ti == 13:
            fac = 1.0 / np.sqrt(max(1.0 - n[-1] * n[-1], 1e-30))
            tgt = np.zeros(ndims)
            tgt[:ndims - 1] = val * fac * n[:ndims - 1]
            vel = jnp.where(on[:, None],
                            jnp.asarray(tgt, dtype=vel.dtype)[None, :],
                            vel)
            continue
        # types 1 / 11: set the (horizontal) normal velocity component
        if ti == 1:
            nd = ndims
            fac = 1.0
        else:
            nd = ndims - 1
            fac = 1.0 / np.sqrt(max(1.0 - n[-1] * n[-1], 1e-30))

        def project(v):
            vn = sum(v[:, dd] * float(n[dd]) for dd in range(nd))
            upd = v
            for dd in range(nd):
                upd = upd.at[:, dd].add((val * fac - vn) * float(n[dd]))
            return upd

        vel = jnp.where((on & exact)[:, None], project(vel), vel)
        # intersections with lower-numbered boundaries (bc.cxx:479-506)
        for ic in range(0, ib):
            tc = inc.all_types[ic]
            m_ic = on & (~exact) & ((flags & np.uint32(1 << ic)) != 0)
            if tc == 0:
                vel = jnp.where(m_ic[:, None], project(vel), vel)
            elif tc == 1:
                ev = None
                for (ei, ej, e) in inc.edge_vecs:
                    if ei == ic and ej == ib:
                        ev = np.asarray(e)
                if ev is None:
                    continue
                ve = sum(vel[:, dd] * float(ev[dd]) for dd in range(ndims))
                proj = jnp.stack([ve * float(ev[dd])
                                  for dd in range(ndims)], axis=1)
                vel = jnp.where(m_ic[:, None], proj, vel)
    return vel


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["x0", "x1", "y0", "y1", "z0", "z1",
                 "div_frac_x0", "div_frac_x1", "ratio_x0", "ratio_x1",
                 "period_time_x0", "period_ratio_x0",
                 "period_time_x1", "period_ratio_x1", "incl"],
    meta_fields=["ndims", "types", "values", "values_lateral",
                 "bottom_shear_zone_thickness", "vbc_val_z1_loading_period",
                 "axis"])
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
    incl: object = None  # InclinedVBC when BOUNDN boundaries exist
    # shard_map axis name when the node masks are sharded windows
    # (parallel/halo_step.py): boundary-extent reductions then ride
    # pmin/pmax so shards without boundary nodes don't see empty minima
    axis: object = None

    @staticmethod
    def from_param(param, bcflag: np.ndarray, topo=None,
                   coord: np.ndarray = None) -> "VBCSpec":
        bc = param.bc
        flags = np.asarray(bcflag)

        incl = None
        n_bits = sum(1 << ib for ib in range(IBOUNDN0, IBOUNDN3 + 1))
        if topo is not None and coord is not None \
                and (flags & np.uint32(n_bits)).any():
            normals, have, edge_vecs = compute_boundary_normals(topo, coord)
            all_types = (bc.vbc_x0, bc.vbc_x1, bc.vbc_y0, bc.vbc_y1,
                         bc.vbc_z0, bc.vbc_z1, bc.vbc_n0, bc.vbc_n1,
                         bc.vbc_n2, bc.vbc_n3)
            incl = InclinedVBC(
                bcflag=jnp.asarray(flags.astype(np.uint32)),
                normals=tuple(tuple(float(x)
                                    for x in normals[IBOUNDN0 + k])
                              for k in range(4)),
                values=(bc.vbc_val_n0, bc.vbc_val_n1, bc.vbc_val_n2,
                        bc.vbc_val_n3),
                all_types=all_types,
                edge_vecs=tuple(edge_vecs),
                present=tuple(bool(have[IBOUNDN0 + k]) for k in range(4)))

        def mask(bit):
            return jnp.asarray((flags & bit) != 0)

        return VBCSpec(
            incl=incl,
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
    """Piecewise-linear interp with constant extrapolation, like
    jnp.interp, but branchless: y = f0 + sum_k slope_k * clip(q-x_k, seg_k).

    jnp.interp lowers searchsorted to a vmapped while-loop on TPU, which
    serializes inside the step scan; the segment-sum form is m-1 fused
    elementwise terms (m is tiny: BC profile tables, bc.cxx:229-278)."""
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    if fp.shape[0] == 1:
        return jnp.broadcast_to(fp[0], jnp.shape(q)).astype(fp.dtype)
    dx = xp[1:] - xp[:-1]
    slope = jnp.where(dx != 0, (fp[1:] - fp[:-1]) / jnp.where(dx == 0, 1, dx),
                      0.0)
    q = jnp.asarray(q)
    seg = jnp.clip(q[..., None] - xp[:-1], 0.0, dx)
    return fp[0] + (slope * seg).sum(axis=-1)


def _masked_minmax(values, mask, axis=None):
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    vmax = jnp.max(jnp.where(mask, values, -big))
    vmin = jnp.min(jnp.where(mask, values, big))
    if axis is not None:
        vmax = jax.lax.pmax(vmax, axis)
        vmin = jax.lax.pmin(vmin, axis)
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
    bx0min, bx0max = _masked_minmax(z, spec.x0, spec.axis)
    bx1min, bx1max = _masked_minmax(z, spec.x1, spec.axis)
    w0 = bx0max - bx0min
    # NOTE: the reference computes BOTH faces' divisions from the X0 extent
    # (bc.cxx:275-277); replicated faithfully.
    div0 = jnp.asarray(spec.div_frac_x0) * w0 - bx0max
    div1 = jnp.asarray(spec.div_frac_x1) * w0 - bx0max
    exact_x0 = applied_x0 * _interp1(div0, jnp.asarray(spec.ratio_x0), -z)
    exact_x1 = applied_x1 * _interp1(div1, jnp.asarray(spec.ratio_x1), -z)

    zmin = jnp.minimum(jnp.min(z), 0.0)
    if spec.axis is not None:
        zmin = jax.lax.pmin(zmin, spec.axis)

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

    # --- inclined N boundaries (bc.cxx:462-560) ---
    if spec.incl is not None:
        vel = _apply_inclined(spec, vel)

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

    # inclined N boundaries before Z (bc.cxx:462-563 ordering)
    if spec.incl is not None:
        vel = _apply_inclined(spec, vel)

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


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["facet_nodes", "facet_elem", "kind",
                 "neu_facet_nodes", "neu_dir", "neu_val", "z0_mask",
                 "grav_mask", "neu_mask"],
    meta_fields=["n_grav", "n_neu"])
@dataclasses.dataclass(frozen=True)
class StressBCSpec:
    """Static facet tables for traction boundary conditions
    (apply_stress_bcs / apply_stress_bcs_neumann, bc.cxx:632-875).

    kind: 0 = Winkler foundation (bottom), 1 = hydrostatic water loading
    (top), 2 = lithostatic sidewall.
    """

    n_grav: int
    n_neu: int
    facet_nodes: jnp.ndarray   # (n_grav, npf) int32
    facet_elem: jnp.ndarray    # (n_grav,) int32
    kind: jnp.ndarray          # (n_grav,) int32
    neu_facet_nodes: jnp.ndarray  # (n_neu, npf) int32
    neu_dir: jnp.ndarray       # (n_neu,) int32 force component
    neu_val: jnp.ndarray       # (n_neu,) traction value
    z0_mask: jnp.ndarray       # (nnode,) bool, elastic-foundation nodes
    # padded-row indicators for per-shard facet tables (halo path); None
    # on a single device where no padding exists
    grav_mask: jnp.ndarray | None = None   # (n_grav,) 1/0
    neu_mask: jnp.ndarray | None = None    # (n_neu,) 1/0

    @staticmethod
    def from_topo(param, topo) -> "StressBCSpec":
        from .constants import IBOUNDZ0, IBOUNDZ1, dim

        ndims = topo.ndims
        d = dim(ndims)
        nof = d.node_of_facet
        npf = d.nodes_per_facet
        bc = param.bc
        vbc_types = [bc.vbc_x0, bc.vbc_x1, bc.vbc_y0, bc.vbc_y1,
                     bc.vbc_z0, bc.vbc_z1]
        sbc_types = [bc.stress_bc_x0, bc.stress_bc_x1, bc.stress_bc_y0,
                     bc.stress_bc_y1, bc.stress_bc_z0, bc.stress_bc_z1]
        sbc_vals = [bc.stress_val_x0, bc.stress_val_x1, bc.stress_val_y0,
                    bc.stress_val_y1, bc.stress_val_z0, bc.stress_val_z1]

        fnodes, felem, kind = [], [], []
        for i in range(6):
            # gravity-induced tractions on free/shear boundaries
            # (bc.cxx:653-657)
            if vbc_types[i] not in (0, 2, 4):
                continue
            if i == IBOUNDZ0 and not bc.has_winkler_foundation:
                continue
            if i == IBOUNDZ1 and not bc.has_water_loading:
                continue
            k = 0 if i == IBOUNDZ0 else (1 if i == IBOUNDZ1 else 2)
            for e, f in topo.bfacets[i]:
                fnodes.append(topo.connectivity[e, list(nof[f])])
                felem.append(e)
                kind.append(k)

        nnodes, ndir, nval = [], [], []
        for i in range(6):
            t = sbc_types[i]
            if t == 0:
                continue
            if ndims == 2:
                comp = {1: 0, 3: 1}.get(t)
            else:
                comp = {1: 0, 2: 1, 3: 2}.get(t)
            if comp is None:
                continue
            for e, f in topo.bfacets[i]:
                nnodes.append(topo.connectivity[e, list(nof[f])])
                ndir.append(comp)
                nval.append(sbc_vals[i])

        def arr(a, dtype, shape):
            return (np.asarray(a, dtype=dtype) if a
                    else np.zeros(shape, dtype=dtype))

        z0_mask = np.zeros(topo.nnode, dtype=bool)
        if bc.has_elastic_foundation:
            z0_mask[topo.bnodes[IBOUNDZ0]] = True

        return StressBCSpec(
            n_grav=len(felem), n_neu=len(ndir),
            facet_nodes=jnp.asarray(arr(fnodes, np.int32, (0, npf))),
            facet_elem=jnp.asarray(arr(felem, np.int32, (0,))),
            kind=jnp.asarray(arr(kind, np.int32, (0,))),
            neu_facet_nodes=jnp.asarray(arr(nnodes, np.int32, (0, npf))),
            neu_dir=jnp.asarray(arr(ndir, np.int32, (0,))),
            neu_val=jnp.asarray(arr(nval, np.float64, (0,))),
            z0_mask=jnp.asarray(z0_mask))


def _facet_normal(fc):
    """Outward normal scaled by facet area + facet z center
    (normal_vector_of_facet, bc.cxx:24-54)."""
    if fc.shape[-1] == 2:
        v01 = fc[:, 1] - fc[:, 0]
        normal = jnp.stack([v01[:, 1], -v01[:, 0]], axis=1)
        zc = fc[:, :, 1].mean(axis=1)
    else:
        v01 = fc[:, 1] - fc[:, 0]
        v02 = fc[:, 2] - fc[:, 0]
        normal = 0.5 * jnp.cross(v01, v02)
        zc = fc[:, :, 2].mean(axis=1)
    return normal, zc


def apply_stress_bcs(param, spec: StressBCSpec, coord, force, rho_eff,
                     compensation_pressure, coord0, halo_exchange=None):
    """Gravity-induced boundary tractions: Winkler foundation, water
    loading, lithostatic sidewalls, elastic foundation (bc.cxx:632-790).

    Under the halo-sharded step (``halo_exchange`` set), facet tables are
    per-shard subsets (padded rows zeroed via ``spec.grav_mask``): facet
    contributions scatter into a ZERO buffer which is overlap-exchanged
    before adding, so overlap force rows receive both shards' facet
    contributions and stay bit-identical across copies.  The elastic
    foundation term is nodal/elementwise — identical on every window row
    already — so it adds directly, never exchanged."""
    ctrl = param.control
    if ctrl.gravity == 0:
        return force
    ndims = coord.shape[1]
    npf = ndims  # nodes per facet
    if spec.n_grav > 0:
        fc = coord[spec.facet_nodes]
        normal, zc = _facet_normal(fc)
        rho_f = rho_eff[spec.facet_elem]
        p_wink = (compensation_pressure
                  - (rho_f + param.bc.winkler_delta_rho) * ctrl.gravity
                  * (zc + param.mesh.zlength))
        p_water = jnp.where(
            zc < ctrl.surf_base_level,
            1030.0 * ctrl.gravity * (ctrl.surf_base_level - zc), 0.0)
        # sidewalls: reference lithostatic pressure (matprops.cxx:148-169)
        mat = param.mat
        if ctrl.has_hydraulic_diffusion:
            rho_ref = (mat.rho0[mat.mattype_ref]
                       * (1 - mat.porosity[mat.mattype_ref])
                       + 1000.0 * mat.porosity[mat.mattype_ref])
        else:
            rho_ref = mat.rho0[mat.mattype_ref]
        p_side = rho_ref * ctrl.gravity * jnp.maximum(-zc, 0.0)
        p = jnp.where(spec.kind == 0, p_wink,
                      jnp.where(spec.kind == 1, p_water, p_side))
        contrib = -(p[:, None, None] * normal[:, None, :]) / npf
        if spec.grav_mask is not None:
            contrib = contrib * spec.grav_mask[:, None, None]
        if halo_exchange is None:
            force = force.at[spec.facet_nodes].add(contrib)
        else:
            buf = jnp.zeros_like(force).at[spec.facet_nodes].add(contrib)
            force = force + halo_exchange(buf)

    if param.bc.has_elastic_foundation:
        dz = coord[:, ndims - 1] - coord0[:, ndims - 1]
        force = force.at[:, ndims - 1].add(
            jnp.where(spec.z0_mask,
                      -param.bc.elastic_foundation_constant * dz, 0.0))
    return force


def apply_stress_bcs_neumann(spec: StressBCSpec, coord, force,
                             halo_exchange=None):
    """General traction (Neumann) BCs (bc.cxx:792-875).  See
    apply_stress_bcs for the halo_exchange contract."""
    if spec.n_neu == 0:
        return force
    ndims = coord.shape[1]
    npf = ndims
    fc = coord[spec.neu_facet_nodes]
    normal, _ = _facet_normal(fc)
    nd = jnp.take_along_axis(normal, spec.neu_dir[:, None], axis=1)[:, 0]
    add = spec.neu_val * nd / npf  # (n_neu,)
    # traction applies only to component neu_dir (bc.cxx:836-860)
    onehot = jax.nn.one_hot(spec.neu_dir, ndims, dtype=force.dtype)
    contrib = jnp.broadcast_to(add[:, None, None] * onehot[:, None, :],
                               (spec.n_neu, npf, ndims))
    if spec.neu_mask is not None:
        contrib = contrib * spec.neu_mask[:, None, None]
    if halo_exchange is None:
        return force.at[spec.neu_facet_nodes].add(contrib)
    buf = jnp.zeros_like(force).at[spec.neu_facet_nodes].add(contrib)
    return force + halo_exchange(buf)
