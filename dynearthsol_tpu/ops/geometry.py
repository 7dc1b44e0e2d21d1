"""Geometry kernels: anti-mesh-locking volumetric smoothing, NMD pressure
smoothing, CFL time step, (pseudo-)mass matrices, element quality.

Reference: geometry.cxx.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fastidx import take_rows

from .assembly import node_sum
from .tensor import trace


# named scopes surface each kernel phase in jax.profiler traces (SURVEY §5.1:
# the reference's NVTX ranges per kernel)
@jax.named_scope("compute_dvoldt")
def compute_dvoldt(strain_rate, volume, volume_n, conn, asm):
    """Volume-weighted volumetric strain rate lumped onto nodes
    (geometry.cxx:202-243)."""
    etmp = trace(strain_rate) * volume  # (nelem,)
    npe = conn.shape[1]
    contrib = jnp.repeat(etmp[:, None], npe, axis=1)
    # the reference adds each supporting element's *full* etmp to the node
    dvoldt = asm(contrib)
    return dvoldt / volume_n


@jax.named_scope("compute_edvoldt")
def compute_edvoldt(dvoldt, conn):
    """Node-averaged (smoothed) dvoldt back on elements
    (geometry.cxx:246-276)."""
    return dvoldt[conn].mean(axis=1)


@jax.named_scope("nmd_stress")
def nmd_stress(stress, dpressure, volume, volume_n, conn, asm, gather=None):
    """Nodal-mixed-discretization pressure smoothing (geometry.cxx:279-331)."""
    ndims = 2 if stress.shape[-1] == 3 else 3
    npe = conn.shape[1]
    etmp = dpressure * volume
    dp_nd = asm(jnp.repeat(etmp[:, None], npe, axis=1)) / volume_n
    dp_el = (gather(dp_nd) if gather is not None
             else dp_nd[conn]).mean(axis=1)
    ddp = (dp_el - dpressure) / ndims
    return stress.at[:, :ndims].add(ddp[:, None])


def elem_min_height(coord, conn, volume):
    """Min altitude of each element (geometry.cxx:830-852):
    2D: 2*A / longest edge; 3D: 3*V / largest facet area.
    Pass conn=None when coord is already corner slots (nelem,npe,ndims)."""
    x = take_rows(coord, conn) if conn is not None else coord
    ndims = x.shape[2]
    if ndims == 2:
        d01 = ((x[:, 0] - x[:, 1]) ** 2).sum(axis=1)
        d12 = ((x[:, 1] - x[:, 2]) ** 2).sum(axis=1)
        d02 = ((x[:, 0] - x[:, 2]) ** 2).sum(axis=1)
        maxl = jnp.sqrt(jnp.maximum(jnp.maximum(d01, d12), d02))
        return 2.0 * volume / maxl

    def tri_area(a, b, c):
        ab = b - a
        ac = c - a
        cr = jnp.cross(ab, ac)
        return 0.5 * jnp.sqrt((cr * cr).sum(axis=1))

    a, b, c, d = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    maxa = jnp.maximum(
        jnp.maximum(tri_area(a, b, c), tri_area(a, b, d)),
        jnp.maximum(tri_area(c, d, a), tri_area(c, d, b)))
    return 3.0 * volume / maxa


def elem_quality(coord, conn, volume):
    """Element quality in (0, 1]; 1 = equilateral (geometry.cxx:1157-1195)."""
    ndims = coord.shape[1]
    x = take_rows(coord, conn)
    if ndims == 2:
        d01 = ((x[:, 0] - x[:, 1]) ** 2).sum(axis=1)
        d12 = ((x[:, 1] - x[:, 2]) ** 2).sum(axis=1)
        d02 = ((x[:, 0] - x[:, 2]) ** 2).sum(axis=1)
        return 4.0 * jnp.sqrt(3.0) * volume / (d01 + d12 + d02)

    def tri_area(a, b, c):
        cr = jnp.cross(b - a, c - a)
        return 0.5 * jnp.sqrt((cr * cr).sum(axis=1))

    a, b, c, d = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    area_sum = (tri_area(a, b, c) + tri_area(a, b, d)
                + tri_area(c, d, a) + tri_area(c, d, b))
    return 216.0 * jnp.sqrt(3.0) * volume * volume / area_sum ** 3


@jax.named_scope("compute_dt")
def compute_dt(coord, conn, volume, vel, shearm_e, rho_e, visc_min,
               therm_diff_max, hydro_diff_max, max_vbc_val,
               *, fixed_dt: float, dt_fraction: float,
               inertial_scaling: float, is_quasi_static: bool,
               has_thermal_diffusion: bool, has_hydraulic_diffusion: bool,
               use_global_velocity_scaling: bool,
               bulk_modulus_ref: float, rho0_ref: float,
               axis_name=None, elem_mask=None):
    """CFL time step (geometry.cxx:756-923).

    Returns (dt, max_global_vel_mag, global_dt_min).  All limits are global
    min-reductions; they stay on-device inside the step scan.
    """
    big = jnp.asarray(jnp.finfo(volume.dtype).max, dtype=volume.dtype)

    def _emask(arr, fill):
        # padded elements must not win min/max reductions (SURVEY §7.5.2)
        if elem_mask is None:
            return arr
        return jnp.where(elem_mask > 0, arr, fill)

    def _pmin(x):
        import jax

        return jax.lax.pmin(x, axis_name) if axis_name is not None else x

    def _pmax(x):
        import jax

        return jax.lax.pmax(x, axis_name) if axis_name is not None else x

    v_slots = take_rows(vel, conn) if conn is not None else vel
    if fixed_dt != 0.0:
        vmag = jnp.sqrt((v_slots.mean(axis=1) ** 2).sum(axis=1))
        vmax = _pmax(jnp.maximum(_emask(vmag, 0.0).max(), max_vbc_val))
        return jnp.asarray(fixed_dt, dtype=volume.dtype), vmax, \
            jnp.asarray(fixed_dt, dtype=volume.dtype)

    minh = elem_min_height(coord, conn, volume)
    minl = _pmin(_emask(minh, big).min())

    v_el = v_slots.mean(axis=1)  # (nelem, ndims)
    vmag = jnp.sqrt((v_el ** 2).sum(axis=1))
    global_max_vem = _pmax(jnp.maximum(_emask(vmag, 0.0).max(),
                                       max_vbc_val))

    dt_maxwell = _pmin((0.5 * visc_min / (1e-40 + shearm_e)).min())
    dt_diffusion = _pmin(_emask(0.5 * minh * minh / therm_diff_max,
                                big).min()) \
        if has_thermal_diffusion else big
    if has_hydraulic_diffusion:
        dt_hydro = jnp.where(hydro_diff_max > 0,
                             _pmin(_emask(0.5 * minh * minh, big).min())
                             / hydro_diff_max, big)
    else:
        dt_hydro = big

    swave = jnp.sqrt(shearm_e / rho_e)
    global_dt_min = _pmin(_emask(minl / swave / 5.0, big).min())

    if use_global_velocity_scaling:
        dt_advection = 0.5 * minl / global_max_vem
        if is_quasi_static:
            dt_elastic = 0.5 * minl / (global_max_vem * inertial_scaling)
        else:
            dt_elastic = 0.5 * minl / jnp.sqrt(bulk_modulus_ref / rho0_ref)
        dt_elastic = jnp.maximum(dt_elastic, global_dt_min)
    else:
        dt_advection = 0.5 * minl / max_vbc_val
        if is_quasi_static:
            dt_elastic = 0.5 * minl / (max_vbc_val * inertial_scaling)
        else:
            dt_elastic = 0.5 * minl / jnp.sqrt(bulk_modulus_ref / rho0_ref)

    dt = jnp.minimum(jnp.minimum(jnp.minimum(dt_elastic, dt_maxwell),
                                 jnp.minimum(dt_advection, dt_diffusion)),
                     dt_hydro) * dt_fraction
    return dt, global_max_vem, global_dt_min


@jax.named_scope("compute_mass")
def compute_mass(volume, conn, bulkm_e, shearm_e, rho_e, cp_e, phi_e,
                 alpha_biot_e, beta_fluid_e, asm,
                 *, pseudo_speed, pseudo_speed_atp, is_quasi_static: bool,
                 use_global_velocity_scaling: bool,
                 has_hydraulic_diffusion: bool, has_thermal_diffusion: bool,
                 ndims: int):
    """(Pseudo-)mass matrices (geometry.cxx:1020-1154).

    Quasi-static runs use a pseudo-density bulkm/speed^2 (mass-scaled dynamic
    relaxation); dynamic runs the true density.  Also lumps nodal volume,
    thermal mass, hydraulic mass and a Young's-modulus mass for Rayleigh
    damping.  Returns (volume_n, mass, tmass, hmass, ymass).
    """
    npe = conn.shape[1]
    if use_global_velocity_scaling:
        apparent = jnp.minimum(pseudo_speed_atp, jnp.sqrt(shearm_e / rho_e))
        rho_q = bulkm_e / (apparent * apparent)
    else:
        rho_q = bulkm_e / (pseudo_speed * pseudo_speed)
    if is_quasi_static:
        rho_m = rho_q
    else:
        rho_m = rho_e
        if has_hydraulic_diffusion:
            rho_m = rho_e * (1.0 - phi_e) + 1000.0 * phi_e

    if ndims == 2:
        bulk_comp = 1.0 / (bulkm_e + shearm_e / 3.0)  # lambda + G
    else:
        bulk_comp = 1.0 / bulkm_e
    hm_coeff = alpha_biot_e + phi_e - alpha_biot_e * phi_e

    m = rho_m * volume / npe
    tm = rho_e * cp_e * volume / npe
    hm = (hm_coeff * bulk_comp + phi_e * beta_fluid_e) * volume / npe
    ym = 9.0 * bulkm_e * shearm_e / (3.0 * bulkm_e + shearm_e) / npe

    contrib = jnp.stack(
        [jnp.repeat(volume[:, None], npe, axis=1),
         jnp.repeat(m[:, None], npe, axis=1),
         jnp.repeat(tm[:, None], npe, axis=1),
         jnp.repeat(hm[:, None], npe, axis=1),
         jnp.repeat(ym[:, None], npe, axis=1)], axis=2)
    sums = asm(contrib)
    volume_n, mass, tmass, hmass, ymass = (sums[:, i] for i in range(5))
    return volume_n, mass, tmass, hmass, ymass
