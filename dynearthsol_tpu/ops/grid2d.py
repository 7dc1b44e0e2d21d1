"""Structured-grid 2D step: the TPU production path.

The generic step (simulation.make_step_fn) works on AoS element arrays
((nelem, NSTR) etc.).  On TPU those shapes tile as T(1,128)/T(2,128) —
most of each (8,128) vector register is padding — and corner reductions
run cross-lane, so the step is ~10x off HBM-bandwidth-bound.  This module
re-expresses the SAME step (same op order, same formulas, shared
componentwise cores from rheology.py/matprops.py) on grid-SoA *planes*:

  element field  -> (2, nxc, nzc)  [tri-in-cell, cell-i, cell-j]
  tensor field   -> (NSTR, 2, nxc, nzc)
  emw            -> (2, nxc, nzc, nmat)
  nodal fields   -> unchanged (nnode, ...) — the nodal kernels
                    (bc.apply_vbcs, damping, velocity) are reused as-is.

For the flagship meshes nxc, nzc are multiples of (8, 128), so every
elementwise op runs fully tiled; element<->node transfers are shifted
slices / padded adds (no gathers, cf. structured.py); corner sums are
plane adds (no cross-lane reductions).  Conversion AoS<->planes happens
once per scan chunk (simulation.run_steps), not per step.

Feature coverage is gated by `grid_step_applicable`; unsupported configs
fall back to the generic step.  Reference parity: the per-step kernel
sequence of dynearthsol.cxx:746-956 (see simulation.py docstring).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import bc as bc_mod
from ..config import (RH_ELASTIC, RH_EP, RH_EVP, RH_MAXWELL, RH_VISCOUS,
                      Param)
from . import fields as F
from . import matprops as M
from . import rheology as R
from . import surface as SP
from .matprops import MIN_STRAIN_RATE

# State element fields converted to plane layout: scalars (nelem,) and
# flattened-symmetric tensors (nelem, 3)
E_SCALARS = ("volume", "volume_old", "stressyy", "old_mean_stress",
             "plstrain", "delta_plstrain", "viscosity", "dpressure",
             "edvoldt", "radiogenic_source", "dyn_fric_coeff",
             "state_variable", "delta_plstrain_avg")
E_TENSORS = ("stress", "strain", "strain_rate", "stress_avg", "strain_avg0")


@functools.lru_cache(maxsize=None)
def _parity(nx: int, nz: int):
    # numpy, not jnp: a cached jnp array created inside a jit trace
    # leaks a tracer into later traces (UnexpectedTracerError)
    i = np.arange(nx - 1)[:, None]
    j = np.arange(nz - 1)[None, :]
    return (i + j) % 2 == 0  # (nxc, nzc)


def state_to_grid(s, nx: int, nz: int):
    """Replace element fields of a State with plane-layout arrays."""
    nxc, nzc = nx - 1, nz - 1

    def e2p(a):  # (nelem,) -> (2, nxc, nzc)
        return a.reshape(nxc, nzc, 2).transpose(2, 0, 1)

    def t2p(a):  # (nelem, k) -> (k, 2, nxc, nzc)
        return a.reshape(nxc, nzc, 2, a.shape[1]).transpose(3, 2, 0, 1)

    upd = {f: e2p(getattr(s, f)) for f in E_SCALARS}
    upd.update({f: t2p(getattr(s, f)) for f in E_TENSORS})
    upd["emw"] = s.emw.reshape(nxc, nzc, 2, s.emw.shape[1]) \
        .transpose(2, 0, 1, 3)
    return dataclasses.replace(s, **upd)


def grid_to_state(g, nx: int, nz: int):
    """Inverse of state_to_grid."""
    nxc, nzc = nx - 1, nz - 1
    nelem = nxc * nzc * 2

    def p2e(p):
        return p.transpose(1, 2, 0).reshape(nelem)

    def p2t(p):
        return p.transpose(2, 3, 1, 0).reshape(nelem, p.shape[0])

    upd = {f: p2e(getattr(g, f)) for f in E_SCALARS}
    upd.update({f: p2t(getattr(g, f)) for f in E_TENSORS})
    upd["emw"] = g.emw.transpose(1, 2, 0, 3).reshape(nelem,
                                                     g.emw.shape[3])
    return dataclasses.replace(g, **upd)


def grid_step_applicable(param: Param, ctx) -> bool:
    """Static gate: True when the structured plane step covers the model's
    feature set (else simulation falls back to the generic step)."""
    ctrl = param.control
    rheol = param.mat.rheol_type
    return (ctx.sgrid is not None and ctx.axis is None and ctx.ndims == 2
            and not ctrl.has_hydraulic_diffusion
            and not ctrl.has_PT
            and rheol in (RH_ELASTIC, RH_VISCOUS, RH_MAXWELL, RH_EP,
                          RH_EVP)
            and (rheol not in (RH_EP, RH_EVP) or param.mat.is_plane_strain))


def make_grid_step(param: Param, ctx, compensation_pressure: float = 0.0):
    """Build step(gstate) -> gstate on plane-layout State (2D structured).

    Mirrors make_step_fn's step() line-for-line for the supported feature
    set (dynearthsol.cxx:746-956 kernel order)."""
    ctrl = param.control
    mat = param.mat
    nx, nz = ctx.sgrid
    max_vbc_val = ctx.max_vbc_val
    visc_min = ctx.mat.visc_min
    therm_diff_max = ctx.mat.therm_diff_max
    nxc, nzc = nx - 1, nz - 1
    nnode = nx * nz
    P = _parity(nx, nz)
    rheol = mat.rheol_type
    pseudo_speed = max_vbc_val * ctrl.inertial_scaling
    npe = 3.0

    # ---- element<->node stencil transfers ----
    def gather(nodal):
        """(nnode,) -> 3 slot planes, each (2, nxc, nzc)."""
        g = nodal.reshape(nx, nz)
        c00 = g[:-1, :-1]
        c10 = g[1:, :-1]
        c01 = g[:-1, 1:]
        c11 = g[1:, 1:]
        s0 = jnp.stack([c00, jnp.where(P, c00, c10)])
        s1 = jnp.stack([c10, c11])
        s2 = jnp.stack([jnp.where(P, c11, c01), c01])
        return s0, s1, s2

    def asm(c0, c1, c2):
        """Transpose of gather: 3 slot planes -> nodal sums (nnode,).
        Slot->cell-corner map (see structured.py scatter_corners_2d):
        tri0: s0->c00, s1->c10, s2->(P? c11 : c01);
        tri1: s0->(P? c00 : c10), s1->c11, s2->c01."""
        zero = jnp.zeros((), dtype=c0.dtype)
        a00 = c0[0] + jnp.where(P, c0[1], zero)
        a10 = c1[0] + jnp.where(P, zero, c0[1])
        a11 = jnp.where(P, c2[0], zero) + c1[1]
        a01 = jnp.where(P, zero, c2[0]) + c2[1]
        out = jnp.zeros((nx, nz), dtype=c0.dtype)
        out = (out.at[:-1, :-1].add(a00).at[1:, :-1].add(a10)
                  .at[1:, 1:].add(a11).at[:-1, 1:].add(a01))
        return out.reshape(nnode)

    def asm_equal(v):
        """asm() when all 3 slots carry the same per-element value."""
        zero = jnp.zeros((), dtype=v.dtype)
        a00 = v[0] + jnp.where(P, v[1], zero)
        a10 = v[0] + jnp.where(P, zero, v[1])
        a11 = jnp.where(P, v[0], zero) + v[1]
        a01 = jnp.where(P, zero, v[0]) + v[1]
        out = jnp.zeros((nx, nz), dtype=v.dtype)
        out = (out.at[:-1, :-1].add(a00).at[1:, :-1].add(a10)
                  .at[1:, 1:].add(a11).at[:-1, 1:].add(a01))
        return out.reshape(nnode)

    def shape_fn(xs, zs, vol):
        """P1 gradients from coord slot planes (fields.cxx:11-54)."""
        iv = 1.0 / (2.0 * vol)
        dndx = (iv * (zs[1] - zs[2]), iv * (zs[2] - zs[0]),
                iv * (zs[0] - zs[1]))
        dndz = (iv * (xs[2] - xs[1]), iv * (xs[0] - xs[2]),
                iv * (xs[1] - xs[0]))
        return dndx, dndz

    def volume_of(xs, zs):
        """Triangle area from slot planes (geometry.cxx:135-200)."""
        return 0.5 * ((xs[1] - xs[0]) * (zs[2] - zs[0])
                      - (zs[1] - zs[0]) * (xs[2] - xs[0]))

    def min_height(xs, zs, vol):
        """2*A / longest edge (geometry.cxx:830-852)."""
        d01 = (xs[0] - xs[1]) ** 2 + (zs[0] - zs[1]) ** 2
        d12 = (xs[1] - xs[2]) ** 2 + (zs[1] - zs[2]) ** 2
        d02 = (xs[0] - xs[2]) ** 2 + (zs[0] - zs[2]) ** 2
        dmax = jnp.maximum(jnp.maximum(d01, d12), d02)
        return 2.0 * vol / jnp.sqrt(dmax)

    def compute_dt_planes(xs, zs, vol, vxs, vzs, shearm, rho_e,
                          hydro_diff_max):
        """CFL dt (geometry.cxx:756-923) on planes; mirrors
        geometry.compute_dt with elem_mask=None, axis=None."""
        dtype = vol.dtype
        big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)
        vx_m = (vxs[0] + vxs[1] + vxs[2]) / npe
        vz_m = (vzs[0] + vzs[1] + vzs[2]) / npe
        vmag = jnp.sqrt(vx_m * vx_m + vz_m * vz_m)
        vmax = jnp.maximum(vmag.max(), max_vbc_val)
        if ctrl.fixed_dt != 0.0:
            fdt = jnp.asarray(ctrl.fixed_dt, dtype=dtype)
            return fdt, vmax, fdt
        minh = min_height(xs, zs, vol)
        minl = minh.min()
        dt_maxwell = (0.5 * visc_min / (1e-40 + shearm)).min()
        dt_diffusion = (0.5 * minh * minh / therm_diff_max).min() \
            if ctrl.has_thermal_diffusion else big
        dt_hydro = big
        swave = jnp.sqrt(shearm / rho_e)
        gdtmin = (minl / swave / 5.0).min()
        if ctrl.use_global_velocity_scaling:
            dt_advection = 0.5 * minl / vmax
            if ctrl.is_quasi_static:
                dt_elastic = 0.5 * minl / (vmax * ctrl.inertial_scaling)
            else:
                dt_elastic = 0.5 * minl / np.sqrt(
                    mat.bulk_modulus[mat.mattype_ref]
                    / mat.rho0[mat.mattype_ref])
            dt_elastic = jnp.maximum(dt_elastic, gdtmin)
        else:
            dt_advection = 0.5 * minl / max_vbc_val
            if ctrl.is_quasi_static:
                dt_elastic = 0.5 * minl / (max_vbc_val
                                           * ctrl.inertial_scaling)
            else:
                dt_elastic = 0.5 * minl / np.sqrt(
                    mat.bulk_modulus[mat.mattype_ref]
                    / mat.rho0[mat.mattype_ref])
        dt = jnp.minimum(jnp.minimum(jnp.minimum(dt_elastic, dt_maxwell),
                                     jnp.minimum(dt_advection,
                                                 dt_diffusion)),
                         dt_hydro) * ctrl.dt_fraction
        return dt, vmax, gdtmin

    def update_stress_planes(tab, s, de, edot, strain_rate_planes,
                             bulkm, shearm, temp_e, dt):
        """Constitutive switch on planes (rheology.cxx:676-991); mirrors
        simulation._update_stress for the gated feature set."""
        stress = (s.stress[0], s.stress[1], s.stress[2])
        old_tr = stress[0] + stress[1]
        stressyy = s.stressyy
        plstrain, delta_plstrain = s.plstrain, s.delta_plstrain
        viscosity = s.viscosity

        def creep_visc():
            s0 = (stress[0] + stress[1]) / 2.0
            rII2 = (0.25 * (strain_rate_planes[0]
                            - strain_rate_planes[1]) ** 2
                    + strain_rate_planes[2] ** 2)
            edot = jnp.maximum(jnp.sqrt(rII2), MIN_STRAIN_RATE)
            return M.visc_core(tab, s.emw, temp_e, s0, edot)

        if rheol == RH_ELASTIC:
            stress = R.elastic2_c(bulkm, shearm, de, stress)
        elif rheol == RH_VISCOUS:
            viscosity = creep_visc()
            strain_new = (s.strain[0] + de[0], s.strain[1] + de[1],
                          s.strain[2] + de[2])
            total_dv = strain_new[0] + strain_new[1]
            stress = R.viscous2_c(bulkm, viscosity, total_dv, edot)
        elif rheol == RH_MAXWELL:
            viscosity = creep_visc()
            dv = s.volume / s.volume_old - 1.0
            stress = R.maxwell2_c(bulkm, shearm, viscosity, dt, dv, de,
                                  stress)
        elif rheol == RH_EP:
            amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                tab, s.emw, s.plstrain)
            stress, stressyy, depls, _ = R.elasto_plastic2d_c(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, stress, s.stressyy)
            plstrain = s.plstrain + depls
            delta_plstrain = depls
        elif rheol == RH_EVP:
            viscosity = creep_visc()
            dv = s.volume / s.volume_old - 1.0
            sv = R.maxwell2_c(bulkm, shearm, viscosity, dt, dv, de,
                              stress)
            svII = 0.25 * (sv[0] - sv[1]) ** 2 + sv[2] ** 2
            amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                tab, s.emw, s.plstrain)
            sp, spyy, depls, _ = R.elasto_plastic2d_c(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, stress, s.stressyy)
            spII = 0.25 * (sp[0] - sp[1]) ** 2 + sp[2] ** 2
            use_v = svII < spII
            stress = tuple(jnp.where(use_v, a, b) for a, b in zip(sv, sp))
            stressyy = jnp.where(use_v, s.stressyy, spyy)
            plstrain = jnp.where(use_v, s.plstrain, s.plstrain + depls)
            delta_plstrain = jnp.where(use_v, s.delta_plstrain, depls)
        else:  # pragma: no cover - gated by grid_step_applicable
            raise ValueError(f"grid step: unsupported rheology {rheol}")
        if ctrl.is_using_mixed_stress:
            dpressure = stress[0] + stress[1] - old_tr
        else:
            dpressure = s.dpressure
        return (stress, stressyy, plstrain, delta_plstrain, viscosity,
                dpressure)

    def step(ctx, s):
        tab = ctx.mat
        dt = s.dt
        steps = s.steps + 1
        time = s.time + s.dt

        # corner slot planes (one stencil "gather" per nodal field)
        xs = gather(s.coord[:, 0])
        zs = gather(s.coord[:, 1])
        vxs = gather(s.vel[:, 0])
        vzs = gather(s.vel[:, 1])
        ts = gather(s.temperature)

        vol = s.volume
        dndx, dndz = shape_fn(xs, zs, vol)
        temp_e = (ts[0] + ts[1] + ts[2]) / npe
        bulkm = M.bulkm(tab, s.emw)
        shearm = M.shearm(tab, s.emw)
        rho_e = M.rho_from_T(tab, s.emw, temp_e)

        temperature = s.temperature
        if ctrl.has_thermal_diffusion:
            kappa = M.therm_cond(tab, s.emw)
            source = s.radiogenic_source * vol * rho_e / npe
            kv = kappa * vol
            gtx = dndx[0] * ts[0] + dndx[1] * ts[1] + dndx[2] * ts[2]
            gtz = dndz[0] * ts[0] + dndz[1] * ts[1] + dndz[2] * ts[2]
            contrib = tuple(kv * (dndx[i] * gtx + dndz[i] * gtz) - source
                            for i in range(3))
            tdot = asm(*contrib)
            temperature = jnp.where(
                ctx.top_mask, param.bc.surface_temperature,
                s.temperature - s.dt * tdot / s.tmass)

        # strain rate (fields.cxx:408-483)
        lxx = vxs[0] * dndx[0] + vxs[1] * dndx[1] + vxs[2] * dndx[2]
        lzz = vzs[0] * dndz[0] + vzs[1] * dndz[1] + vzs[2] * dndz[2]
        lxz = 0.5 * (vxs[0] * dndz[0] + vxs[1] * dndz[1]
                     + vxs[2] * dndz[2]
                     + vzs[0] * dndx[0] + vzs[1] * dndx[1]
                     + vzs[2] * dndx[2])
        sr = (lxx, lzz, lxz)

        # anti-mesh-locking dvoldt/edvoldt (geometry.cxx:202-276)
        etmp = (lxx + lzz) * vol
        dvoldt = asm_equal(etmp) / s.volume_n
        dvs = gather(dvoldt)
        edvoldt = (dvs[0] + dvs[1] + dvs[2]) / npe

        # strain-rate anti-locking fix (rheology.cxx:755-763)
        adj = (edvoldt - (lxx + lzz)) / 2.0
        edot = (lxx + adj, lzz + adj, lxz)
        de = (edot[0] * dt, edot[1] * dt, edot[2] * dt)
        strain = jnp.stack([s.strain[0] + de[0], s.strain[1] + de[1],
                            s.strain[2] + de[2]])
        strain_rate = jnp.stack(edot)

        s_mid = dataclasses.replace(s, edvoldt=edvoldt)
        (stress_c, stressyy, plstrain, delta_plstrain, viscosity,
         dpressure) = update_stress_planes(tab, s_mid, de, edot, sr,
                                           bulkm, shearm, temp_e, dt)

        if ctrl.is_using_mixed_stress:
            # NMD pressure smoothing (geometry.cxx:279-331)
            dp_nd = asm_equal(dpressure * vol) / s.volume_n
            dps = gather(dp_nd)
            ddp = ((dps[0] + dps[1] + dps[2]) / npe - dpressure) / 2.0
            stress_c = (stress_c[0] + ddp, stress_c[1] + ddp, stress_c[2])
        stress = jnp.stack(stress_c)

        # force assembly (fields.cxx:612-703)
        phi_e = M.phi_porosity(tab, s.emw)
        if ctrl.gravity != 0:
            buoy = (rho_e * (1.0 - phi_e) + 1000.0 * phi_e) \
                * ctrl.gravity / npe
        else:
            buoy = jnp.zeros_like(vol)
        fx = tuple((stress_c[0] * dndx[i] + stress_c[2] * dndz[i]) * vol
                   for i in range(3))
        fz = tuple((stress_c[2] * dndx[i] + stress_c[1] * dndz[i] + buoy)
                   * vol for i in range(3))
        force = jnp.stack([-asm(*fx), -asm(*fz)], axis=1)
        l2_res = F.residual_l2(force)

        rho_eff = rho_e
        if ctrl.gravity != 0:
            # boundary tractions need flat per-element densities (tiny
            # facet-indexed op, bc.cxx:632-790)
            rho_flat = rho_eff.transpose(1, 2, 0).reshape(-1)
            force = bc_mod.apply_stress_bcs(
                param, ctx.sbc, s.coord, force, rho_flat,
                compensation_pressure, s.coord0)
        force = bc_mod.apply_stress_bcs_neumann(ctx.sbc, s.coord, force)
        force = F.apply_damping(force, s.vel, s.mass, s.ymass,
                                ctrl.damping_option, ctrl.damping_factor)
        vel = F.update_velocity(s.vel, force, s.mass, s.dt)
        vel = bc_mod.apply_vbcs(ctx.vbc, vel, s.coord, time)

        # update_mesh (dynearthsol.cxx:431-473)
        vxs2 = gather(vel[:, 0])
        vzs2 = gather(vel[:, 1])
        dhacc, edvacc_surf = s.dhacc, s.edvacc_surf
        if ctrl.has_moving_mesh:
            coord = F.update_coordinate(s.coord, vel, s.dt)
            if ctrl.surface_process_option != 0 and ctx.surf.etop > 0:
                # in-step surface processes (surface_processes,
                # bc.cxx:1667-1831), same call the generic/flat steps
                # make; the top row moved, so re-gather coordinates
                coord, dhacc, edvacc_surf, _dh = \
                    SP.apply_surface_processes(param, ctx.surf, coord,
                                               s.dt, dhacc, edvacc_surf)
                xs2 = gather(coord[:, 0])
                zs2 = gather(coord[:, 1])
            else:
                xs2 = tuple(xs[i] + vxs2[i] * s.dt for i in range(3))
                zs2 = tuple(zs[i] + vzs2[i] * s.dt for i in range(3))
            volume_old = vol
            volume = volume_of(xs2, zs2)
            # correct_surface_element (bc.cxx:1613-1665), active even with
            # surface_process_option 0: every element touching a top node
            # (= the z-cell row -1, both parities) is rescaled by 1/rdv
            # when it grew, and its pre-swap volume is overwritten so the
            # next step's maxwell dv is zero for surface elements.  The
            # scaling is applied here, before the Jaumann rotation below —
            # identical to the reference order because the rotation is
            # linear in the tensor it rotates.
            if ctrl.has_surface_correction:
                rdv = volume[:, :, -1] / vol[:, :, -1]
                tscale = jnp.where(rdv >= 1.0, 1.0 / rdv, 1.0)
                stress = stress.at[:, :, :, -1].multiply(tscale)
                strain = strain.at[:, :, :, -1].multiply(tscale)
                strain_rate = strain_rate.at[:, :, :, -1].multiply(tscale)
                plstrain = plstrain.at[:, :, -1].multiply(tscale)
                volume_old = vol.at[:, :, -1].set(volume[:, :, -1])
                # surface_plstrain_diffusion (bc.cxx:1591-1611, 2D only):
                # exponential decay at the quality-check cadence, skipped
                # for oceanic-crust-dominated elements
                qcsi = param.mesh.quality_check_step_interval
                lam = SP.LN2 / SP.PLSTRAIN_HALF_LIFE
                dominant = jnp.argmax(s.emw[:, :, -1, :], axis=-1)
                dec = jnp.where(
                    dominant == param.mat.mattype_oceanic_crust,
                    0.0, plstrain[:, :, -1] * lam * s.dt)
                plstrain = plstrain.at[:, :, -1].add(
                    -jnp.where((steps % qcsi) == 0, dec, 0.0))
        else:
            coord, volume_old, volume = s.coord, s.volume_old, vol
            xs2, zs2 = xs, zs

        # CFL dt, refreshed every 10 steps (dynearthsol.cxx:861-871)
        dt_new, vmax, gdtmin = compute_dt_planes(
            xs2, zs2, volume, vxs2, vzs2, shearm, rho_e, s.hydro_diff_max)
        refresh = (steps % 10 == 0) | ctrl.use_global_velocity_scaling
        dt_out = jnp.where(refresh, dt_new, s.dt)

        if ctrl.has_moving_mesh:
            # (pseudo-)mass matrices (geometry.cxx:1020-1154)
            if ctrl.use_global_velocity_scaling:
                apparent = jnp.minimum(s.max_global_vel_mag
                                       * ctrl.inertial_scaling,
                                       jnp.sqrt(shearm / rho_e))
                rho_q = bulkm / (apparent * apparent)
            else:
                rho_q = bulkm / (pseudo_speed * pseudo_speed)
            rho_m = rho_q if ctrl.is_quasi_static else rho_e
            bulk_comp = 1.0 / (bulkm + shearm / 3.0)
            ab_e = M.alpha_biot(tab, s.emw)
            bf_e = M.beta_fluid(tab, s.emw)
            cp_e = M.cp(tab, s.emw)
            hm_coeff = ab_e + phi_e - ab_e * phi_e
            m = rho_m * volume / npe
            tm = rho_e * cp_e * volume / npe
            hm = (hm_coeff * bulk_comp + phi_e * bf_e) * volume / npe
            ym = 9.0 * bulkm * shearm / (3.0 * bulkm + shearm) / npe
            volume_n = asm_equal(volume)
            mass = asm_equal(m)
            tmass = asm_equal(tm)
            hmass = asm_equal(hm)
            ymass = asm_equal(ym)
        else:
            volume_n, mass, tmass, hmass, ymass = (
                s.volume_n, s.mass, s.tmass, s.hmass, s.ymass)

        # Jaumann rotation with post-move geometry (dynearthsol.cxx:853-855)
        if rheol & RH_ELASTIC:
            dndx2, dndz2 = shape_fn(xs2, zs2, volume)
            w2 = 0.5 * ((vzs2[0] * dndx2[0] + vzs2[1] * dndx2[1]
                         + vzs2[2] * dndx2[2])
                        - (vxs2[0] * dndz2[0] + vxs2[1] * dndz2[1]
                           + vxs2[2] * dndz2[2]))
            wdt = w2 * s.dt

            def rot(t):
                return jnp.stack([t[0] - 2.0 * t[2] * wdt,
                                  t[1] + 2.0 * t[2] * wdt,
                                  t[2] + (t[0] - t[1]) * wdt])

            stress = rot(stress)
            strain = rot(strain)

        # averaged-output accumulators (output.cxx:300-340)
        if param.sim.is_outputting_averaged_fields:
            interval = param.mesh.quality_check_step_interval
            reset = (steps % interval) == 1
            stress_avg = jnp.where(reset, stress, s.stress_avg + stress)
            dpls_avg = jnp.where(reset, delta_plstrain,
                                 s.delta_plstrain_avg + delta_plstrain)
            coord_avg0 = jnp.where(reset, coord, s.coord_avg0)
            strain_avg0 = jnp.where(reset, strain, s.strain_avg0)
            time_avg0 = jnp.where(reset, time, s.time_avg0)
        else:
            stress_avg, dpls_avg = s.stress_avg, s.delta_plstrain_avg
            coord_avg0, strain_avg0 = s.coord_avg0, s.strain_avg0
            time_avg0 = s.time_avg0

        return dataclasses.replace(
            s, coord=coord, vel=vel, temperature=temperature,
            dhacc=dhacc, edvacc_surf=edvacc_surf,
            volume=volume, volume_old=volume_old, volume_n=volume_n,
            mass=mass, tmass=tmass, hmass=hmass, ymass=ymass, force=force,
            stress=stress, stressyy=stressyy, strain=strain,
            strain_rate=strain_rate, plstrain=plstrain,
            dpressure=dpressure,
            delta_plstrain=delta_plstrain, viscosity=viscosity,
            edvoldt=edvoldt, stress_avg=stress_avg,
            delta_plstrain_avg=dpls_avg, coord_avg0=coord_avg0,
            strain_avg0=strain_avg0, time_avg0=time_avg0,
            time=time, dt=dt_out, steps=steps, max_global_vel_mag=vmax,
            global_dt_min=gdtmin, l2_residual=l2_res)

    return step
