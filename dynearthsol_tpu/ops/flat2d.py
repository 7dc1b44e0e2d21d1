"""Connectivity-driven 2D step in SoA column layout.

Covers any triangle mesh (it needs only conn + the node_sum support
table): unstructured/post-remesh meshes, and structured meshes whose
feature set (surface processes, hydraulic diffusion, RSF, facet
tractions) falls off the grid/pallas fast-path gates — i.e. the
production-rifting configuration (bench.py --case production).

Why not the generic step: make_step_fn carries rank-3 intermediates
shaped (nelem, npe, ndims) — corner slots, shape-function gradients,
force contributions.  On TPU those tile as (8, 128) on the LAST TWO dims
(npe=3, ndims=2), so every materialization pays a ~170x padding
amplification: a 6 MB logical array writes ~1 GB of HBM.  The generic
step measured 3.1M elem*steps/s on the 262k-element unstructured
flagship (91.5 ms/step); this SoA layout removes that penalty entirely
(bench.py --case unstructured/postremesh/production report the current
measured numbers).

This module re-expresses the SAME step (same op order, same formulas,
same componentwise cores as grid2d.py) on flat SoA columns:

  element scalar   -> (nelem,)                (perfectly tiled)
  element tensor   -> (NSTR, nelem)           (k-major, nelem in lanes)
  corner slots     -> npe separate (nelem, k) static-index gathers,
                      immediately unstacked into (nelem,) columns
  assembly         -> degree-unrolled masked gather-sums over the SAME
                      (nnode, max_degree) support table as
                      ops/assembly.node_sum, with slot ids renumbered to
                      corner-major (slot = corner*nelem + e) so the
                      packed contribution array is 2D (npe*nelem, k),
                      never (nelem, npe, k)

The summation order per node is identical to node_sum's, so this step
reproduces the generic step BIT-FOR-BIT in f64 (tests/test_flat.py).

Feature coverage: all rheologies of the grid paths plus in-step surface
processes, hydraulic (Biot) diffusion, and the pseudo-transient inner
relaxation (dynearthsol.cxx:779-840) — PT configs (the consolidation
benchmarks) ride this path at SoA speed (round 4; was a generic-step
fallback).  Reference kernel order: dynearthsol.cxx:746-956.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import bc as bc_mod
from ..config import (RH_ELASTIC, RH_EP, RH_EP_RSF, RH_EVP,
                      RH_EVP_RSF, RH_MAXWELL, RH_VISCOUS, Param)
from . import band2d
from . import fields as F
from . import matprops as M
from . import rheology as R
from . import surface as SP
from .matprops import MIN_STRAIN_RATE

# element tensor fields stored k-major (NSTR, nelem) in the flat layout
E_TENSORS = ("stress", "strain", "strain_rate", "stress_avg",
             "strain_avg0")


def state_to_flat(s):
    """Transpose element tensor fields to (NSTR, nelem)."""
    return dataclasses.replace(
        s, **{f: getattr(s, f).T for f in E_TENSORS})


def flat_to_state(g):
    return dataclasses.replace(
        g, **{f: getattr(g, f).T for f in E_TENSORS})


def flat_step_applicable(param: Param, ctx) -> bool:
    """Static gate.  The flat path needs only conn + gather tables, so it
    applies to structured meshes too: the dispatcher checks the
    grid/pallas paths first, so a structured config lands here exactly
    when its feature set (surface processes, hydraulic diffusion, RSF,
    facet tractions) falls off those paths — previously such configs
    dropped to the ~200x-slower generic gather step."""
    ctrl = param.control
    rheol = param.mat.rheol_type
    return (ctx.axis is None and ctx.ndims == 2
            and rheol in (RH_ELASTIC, RH_VISCOUS, RH_MAXWELL, RH_EP,
                          RH_EVP, RH_EP_RSF, RH_EVP_RSF)
            and (rheol == RH_MAXWELL or rheol == RH_VISCOUS
                 or rheol == RH_ELASTIC or param.mat.is_plane_strain))


def make_flat_step(param: Param, ctx, compensation_pressure: float = 0.0):
    """Build step(ctx, fstate) -> fstate on flat SoA state (2D
    unstructured).  Mirrors grid2d.make_grid_step / make_step_fn."""
    ctrl = param.control
    mat = param.mat
    nelem = int(ctx.nelem)
    nnode = int(ctx.nnode)
    max_vbc_val = ctx.max_vbc_val
    visc_min = ctx.mat.visc_min
    therm_diff_max = ctx.mat.therm_diff_max
    rheol = mat.rheol_type
    pseudo_speed = max_vbc_val * ctrl.inertial_scaling
    npe = 3.0

    max_deg = int(np.asarray(ctx.gather_idx).shape[1])

    # index tables are read from the RUNTIME ctx argument inside step —
    # NOT baked in as closure constants.  XLA only cross-program-
    # prefetches entry *parameters* into VMEM; a gather whose index
    # vector is an embedded constant runs ~100x slower (measured on
    # v5e: 2.7 ms vs 0.024 ms for one 277k-row gather).  The cell is
    # (re)bound at the top of step from the traced ctx.
    _tables = {}

    # the banded MXU engine replaces XLA's dynamic-gather custom-calls
    # (~2-3 ms EACH at 277k elements) with supernode-window Pallas
    # kernels (~1.5 ms per fused multi-field call); Pallas on
    # accelerators, the equivalent pure-jnp formulation under CPU
    # testing.  f32 only: the one-hot matmul reassociates sums, and the
    # f64 bit-exact contract (vs the generic step) rides the exact
    # column engine below.
    band_native = jax.default_backend() != "cpu"

    def _band(dtype):
        bt = _tables.get("band")
        return bt if (bt is not None and dtype == jnp.float32) else None

    def cgather(pack):
        """(nnode, k) -> npe tuples of k columns, each (nelem,)."""
        k = pack.shape[1]
        bt = _band(pack.dtype)
        if bt is not None:
            eng = (band2d.gather_corners_tpu if band_native
                   else band2d.gather_corners)
            parts = []
            for j0 in range(0, k, band2d.KF):   # KF fields per call
                kk = min(band2d.KF, k - j0)
                p8 = band2d.pack_nodal(
                    [pack[:, j0 + j] for j in range(kk)], bt)
                parts.append(eng(p8, bt, kk))
            return [sum((p[c] for p in parts), ()) for c in range(3)]
        c_idx = _tables["c_idx"]
        out = []
        for c in range(3):
            rows = pack[c_idx[c]]          # (nelem, k) one static gather
            out.append(tuple(rows[:, j] for j in range(k)))
        return out  # [corner][field]

    def asm_pack(slot_cols):
        """[corner][field] columns -> (nnode, k) sums (node_sum order;
        band engine: window-matmul order, f32 tolerance)."""
        k = len(slot_cols[0])
        bt = _band(slot_cols[0][0].dtype)
        if bt is not None:
            eng = (band2d.scatter_corners_tpu if band_native
                   else band2d.scatter_corners)
            return jnp.stack(eng(slot_cols, bt), axis=1)
        g_cols, m_cols = _tables["g_cols"], _tables["m_cols"]
        pack = jnp.stack(
            [jnp.concatenate([slot_cols[c][j] for c in range(3)])
             for j in range(k)], axis=1)    # (3*nelem, k), 2D
        acc = jnp.zeros((nnode, k), dtype=pack.dtype)
        for d in range(max_deg):
            vals = pack[g_cols[d]]          # (nnode, k) static gather
            acc = acc + jnp.where(m_cols[d][:, None], vals, 0.0)
        return acc

    def asm_gather(slot_cols, kg):
        """Fused assembly + immediate corner re-gather of the first
        ``kg`` nodal sums: ((nnode, k) sums, [corner][field<kg]
        (nelem,) columns).  The step's transfer hops (dvoldt, NMD
        pressure smoothing) scatter and immediately re-gather the SAME
        nodal field; on the band engine both phases run in ONE Pallas
        kernel whose gather reads the VMEM-resident accumulator — no
        second kernel launch, no window DMAs for the gather."""
        k = len(slot_cols[0])
        bt = _band(slot_cols[0][0].dtype)
        if bt is not None:
            eng = (band2d.scatter_gather_corners_tpu if band_native
                   else band2d.scatter_gather_corners)
            sums, gath = eng(slot_cols, bt, kg)
            return jnp.stack(sums, axis=1), gath
        pack = asm_pack(slot_cols)
        return pack, cgather(pack[:, :kg])

    def _bind_tables(rctx):
        """Slice the traced gather tables (jit arguments) once per step.

        The support-table slots are renumbered corner-major: the generic
        node_sum numbers slots e*npe + c over an (nelem, npe, k) pack;
        here the pack is concatenate([c0, c1, c2]) -> slot c*nelem + e.
        The per-degree columns preserve node_sum's summation order
        exactly (the f64 bit-exact equivalence gate relies on it)."""
        conn = rctx.conn.astype(jnp.int32)
        _tables["c_idx"] = tuple(conn[:, c] for c in range(3))
        gidx = rctx.gather_idx.astype(jnp.int32)
        gmask = rctx.gather_mask
        gidx_cm = jnp.where(gmask, (gidx % 3) * nelem + gidx // 3, 0)
        _tables["g_cols"] = tuple(gidx_cm[:, d] for d in range(max_deg))
        _tables["m_cols"] = tuple(gmask[:, d] for d in range(max_deg))
        _tables["band"] = getattr(rctx, "band", None)

    def shape_fn(xs, zs, vol):
        iv = 1.0 / (2.0 * vol)
        dndx = (iv * (zs[1] - zs[2]), iv * (zs[2] - zs[0]),
                iv * (zs[0] - zs[1]))
        dndz = (iv * (xs[2] - xs[1]), iv * (xs[0] - xs[2]),
                iv * (xs[1] - xs[0]))
        return dndx, dndz

    def volume_of(xs, zs):
        return 0.5 * ((xs[1] - xs[0]) * (zs[2] - zs[0])
                      - (zs[1] - zs[0]) * (xs[2] - xs[0]))

    def min_height(xs, zs, vol):
        d01 = (xs[0] - xs[1]) ** 2 + (zs[0] - zs[1]) ** 2
        d12 = (xs[1] - xs[2]) ** 2 + (zs[1] - zs[2]) ** 2
        d02 = (xs[0] - xs[2]) ** 2 + (zs[0] - zs[2]) ** 2
        dmax = jnp.maximum(jnp.maximum(d01, d12), d02)
        return 2.0 * vol / jnp.sqrt(dmax)

    def compute_dt_cols(xs, zs, vol, vxs, vzs, shearm, rho_e,
                        hydro_diff_max=None):
        """CFL dt (geometry.cxx:756-923); mirrors grid2d (+ the
        hydraulic diffusion limit when enabled)."""
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
        if ctrl.has_hydraulic_diffusion and hydro_diff_max is not None:
            dt_hydro = jnp.where(hydro_diff_max > 0,
                                 (0.5 * minh * minh).min()
                                 / hydro_diff_max, big)
        else:
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
        dt = jnp.minimum(
            jnp.minimum(jnp.minimum(dt_elastic, dt_maxwell),
                        jnp.minimum(dt_advection, dt_diffusion)),
            dt_hydro) * ctrl.dt_fraction
        return dt, vmax, gdtmin

    is_rsf = rheol in (RH_EP_RSF, RH_EVP_RSF)
    rheol_ep = rheol in (RH_EP, RH_EP_RSF)
    rheol_evp = rheol in (RH_EVP, RH_EVP_RSF)

    def slip_rate2_c(s0, s1, s2, vx_m, vz_m):
        """Column form of R.slip_rate2 (rheology.cxx:107-148)."""
        rad = jnp.sqrt(0.25 * (s0 - s1) ** 2 + s2 ** 2)
        a = 0.5 * (s0 - s1)
        b = -rad
        ok = b < -1e-15
        safe_b = jnp.where(ok, b, 1.0)
        cos2t = jnp.where(ok, a / safe_b, 1.0)
        sin2t = jnp.where(ok, s2 / safe_b, 0.0)
        theta = 0.5 * jnp.arctan2(sin2t, cos2t)
        dx = jnp.cos(theta + jnp.pi / 4)
        dz = jnp.sin(theta + jnp.pi / 4)
        return jnp.abs(vx_m * dx + vz_m * dz)

    def update_stress_cols(tab, s, de, edot, sr, bulkm, shearm, temp_e,
                           dt, dpp=None, vmean=None):
        """Constitutive switch (rheology.cxx:676-991) on columns;
        mirrors grid2d.update_stress_planes (+ the Biot effective-stress
        increment ``dpp``, rheology.cxx:696-755, and the rate-state
        friction variants, rheology.cxx:882-914 + matprops.cxx:532-552).
        ``vmean`` = element-mean pre-update velocity columns (RSF)."""
        stress = (s.stress[0], s.stress[1], s.stress[2])
        old_tr = stress[0] + stress[1]
        stressyy = s.stressyy
        plstrain, delta_plstrain = s.plstrain, s.delta_plstrain
        viscosity = s.viscosity
        dyn_fric_coeff = s.dyn_fric_coeff
        state_variable = s.state_variable

        if is_rsf:
            slip = slip_rate2_c(stress[0], stress[1], stress[2],
                                vmean[0], vmean[1])
            (amc_r, anphi_r, anpsi_r, hardn_r, ten_max_r,
             dyn_fric_coeff, state_variable) = M.plastic_props_rsf(
                tab, s.emw, s.plstrain, slip, s.state_variable, dt,
                param.mat.state_var_model)

        def creep_visc():
            s0 = (stress[0] + stress[1]) / 2.0
            rII2 = 0.25 * (sr[0] - sr[1]) ** 2 + sr[2] ** 2
            ed = jnp.maximum(jnp.sqrt(rII2), MIN_STRAIN_RATE)
            return M.visc_core(tab, s.emw, temp_e, s0, ed)

        if rheol == RH_ELASTIC:
            stress = R.elastic2_c(bulkm, shearm, de, stress, dpp)
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
        elif rheol_ep:
            if is_rsf:
                amc, anphi, anpsi = amc_r, anphi_r, anpsi_r
                hardn, ten_max = hardn_r, ten_max_r
            else:
                amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                    tab, s.emw, s.plstrain)
            stress, stressyy, depls, _ = R.elasto_plastic2d_c(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, stress, s.stressyy, dpp)
            plstrain = s.plstrain + depls
            delta_plstrain = depls
        elif rheol_evp:
            viscosity = creep_visc()
            dv = s.volume / s.volume_old - 1.0
            sv = R.maxwell2_c(bulkm, shearm, viscosity, dt, dv, de,
                              stress)
            svII = 0.25 * (sv[0] - sv[1]) ** 2 + sv[2] ** 2
            if is_rsf:
                amc, anphi, anpsi = amc_r, anphi_r, anpsi_r
                hardn, ten_max = hardn_r, ten_max_r
            else:
                amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                    tab, s.emw, s.plstrain)
            sp, spyy, depls, _ = R.elasto_plastic2d_c(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, stress, s.stressyy, dpp)
            spII = 0.25 * (sp[0] - sp[1]) ** 2 + sp[2] ** 2
            use_v = svII < spII
            stress = tuple(jnp.where(use_v, a, b) for a, b in zip(sv, sp))
            stressyy = jnp.where(use_v, s.stressyy, spyy)
            plstrain = jnp.where(use_v, s.plstrain, s.plstrain + depls)
            delta_plstrain = jnp.where(use_v, s.delta_plstrain, depls)
        else:  # pragma: no cover - gated
            raise ValueError(f"flat step: unsupported rheology {rheol}")
        if ctrl.is_using_mixed_stress:
            dpressure = stress[0] + stress[1] - old_tr
        else:
            dpressure = s.dpressure
        return (stress, stressyy, plstrain, delta_plstrain, viscosity,
                dpressure, dyn_fric_coeff, state_variable)

    def step(ctx, s):
        _bind_tables(ctx)
        tab = ctx.mat
        dt = s.dt
        steps = s.steps + 1
        time = s.time + s.dt

        # ONE packed corner gather (coord, vel, T [, pp, dpp],
        # volume_n), unstacked to columns; volume_n rides along so the
        # dvoldt/NMD transfer hops can divide their re-gathered nodal
        # sums per-corner (elementwise-identical to dividing nodally)
        cols = [s.coord, s.vel, s.temperature[:, None]]
        if ctrl.has_hydraulic_diffusion:
            cols += [s.ppressure[:, None], s.dppressure[:, None]]
        cols.append(s.volume_n[:, None])
        nodal_pack = jnp.concatenate(cols, axis=1)
        iv_vn = nodal_pack.shape[1] - 1
        slots = cgather(nodal_pack)         # [corner][x z vx vz T ...]
        xs = tuple(slots[c][0] for c in range(3))
        zs = tuple(slots[c][1] for c in range(3))
        vxs = tuple(slots[c][2] for c in range(3))
        vzs = tuple(slots[c][3] for c in range(3))
        ts = tuple(slots[c][4] for c in range(3))
        vns = tuple(slots[c][iv_vn] for c in range(3))

        vol = s.volume
        dndx, dndz = shape_fn(xs, zs, vol)
        temp_e = (ts[0] + ts[1] + ts[2]) / npe
        bulkm = M.bulkm(tab, s.emw)
        shearm = M.shearm(tab, s.emw)
        rho_e = M.rho_from_T(tab, s.emw, temp_e)

        # strain rate (fields.cxx:408-483)
        lxx = vxs[0] * dndx[0] + vxs[1] * dndx[1] + vxs[2] * dndx[2]
        lzz = vzs[0] * dndz[0] + vzs[1] * dndz[1] + vzs[2] * dndz[2]
        lxz = 0.5 * (vxs[0] * dndz[0] + vxs[1] * dndz[1]
                     + vxs[2] * dndz[2]
                     + vzs[0] * dndx[0] + vzs[1] * dndx[1]
                     + vzs[2] * dndx[2])
        sr = (lxx, lzz, lxz)

        # thermal diffusion + dvoldt share ONE assembly (k = 1 + 1)
        etmp = (lxx + lzz) * vol
        if ctrl.has_thermal_diffusion:
            kappa = M.therm_cond(tab, s.emw)
            source = s.radiogenic_source * vol * rho_e / npe
            kv = kappa * vol
            gtx = dndx[0] * ts[0] + dndx[1] * ts[1] + dndx[2] * ts[2]
            gtz = dndz[0] * ts[0] + dndz[1] * ts[1] + dndz[2] * ts[2]
            both, gdv = asm_gather([
                (etmp, kv * (dndx[c] * gtx + dndz[c] * gtz) - source)
                for c in range(3)], kg=1)
            tdot = both[:, 1]
            temperature = jnp.where(
                ctx.top_mask, param.bc.surface_temperature,
                s.temperature - s.dt * tdot / s.tmass)
        else:
            _, gdv = asm_gather([(etmp,)] * 3, kg=1)
            temperature = s.temperature

        # anti-mesh-locking dvoldt/edvoldt (geometry.cxx:202-276):
        # the nodal dv sums come back at the corners from the fused
        # kernel; dividing by corner volume_n equals gathering
        # dv_sum/volume_n bit-for-bit
        dvs = [gdv[c][0] / vns[c] for c in range(3)]
        edvoldt = (dvs[0] + dvs[1] + dvs[2]) / npe

        adj = (edvoldt - (lxx + lzz)) / 2.0
        edot = (lxx + adj, lzz + adj, lxz)
        de = (edot[0] * dt, edot[1] * dt, edot[2] * dt)
        strain = jnp.stack([s.strain[0] + de[0], s.strain[1] + de[1],
                            s.strain[2] + de[2]])
        strain_rate = jnp.stack(edot)

        # Biot effective-stress increment from nodal dppressure
        # (rheology.cxx:696-755) + this step's pre-update mean stress
        # for the poroelastic source (fields.cxx:297-406)
        old_mean_stress = s.old_mean_stress
        dpp = None
        if ctrl.has_hydraulic_diffusion:
            old_mean_stress = (s.stress[0] + s.stress[1]) / 2.0
            alpha_b = M.alpha_biot(tab, s.emw)
            dpp = alpha_b * (slots[0][6] + slots[1][6] + slots[2][6]) / npe

        vmean = None
        if is_rsf:
            vmean = ((vxs[0] + vxs[1] + vxs[2]) / npe,
                     (vzs[0] + vzs[1] + vzs[2]) / npe)
        s_mid = dataclasses.replace(s, edvoldt=edvoldt)
        (stress_c, stressyy, plstrain, delta_plstrain, viscosity,
         dpressure, dyn_fric_coeff, state_variable) = update_stress_cols(
            tab, s_mid, de, edot, sr, bulkm, shearm, temp_e, dt, dpp,
            vmean)

        if ctrl.is_using_mixed_stress:
            # NMD pressure smoothing (geometry.cxx:279-331), fused
            # assemble+regather with per-corner volume_n division
            _, gdp = asm_gather([(dpressure * vol,)] * 3, kg=1)
            dps = [gdp[c][0] / vns[c] for c in range(3)]
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
        if ctrl.has_hydraulic_diffusion:
            # pore-pressure diffusion contributions (fields.cxx:297-406)
            # ride the force assembly (k=3): they depend only on the
            # updated stress / pre-move geometry, and the reference
            # applies the pp update after the velocity update
            mean_change = (stress_c[0] + stress_c[1]) / 2.0 \
                - old_mean_stress
            matrix_comp = 1.0 / (bulkm + 4.0 * shearm / 3.0)
            bulk_comp2 = 1.0 / (bulkm + shearm / 3.0)
            gamma_w = 1000.0 * ctrl.gravity
            perm_e = M.perm(tab, s.emw)
            mu_e = M.mu_fluid(tab, s.emw)
            beta_f = M.beta_fluid(tab, s.emw)
            hc = perm_e * gamma_w / mu_e
            kv_h = hc * vol
            diff_e = hc / (phi_e * beta_f + alpha_b * matrix_comp) \
                / gamma_w
            hydro_diff_max = jnp.maximum(diff_e.max(), 1e-38)
            pe_src = alpha_b * mean_change * bulk_comp2 * vol / npe / dt
            heads = tuple(slots[c][5] / gamma_w + zs[c] for c in range(3))
            ghx = sum(dndx[c] * heads[c] for c in range(3))
            ghz = sum(dndz[c] * heads[c] for c in range(3))
            fpack = asm_pack([
                ((stress_c[0] * dndx[c] + stress_c[2] * dndz[c]) * vol,
                 (stress_c[2] * dndx[c] + stress_c[1] * dndz[c] + buoy)
                 * vol,
                 kv_h * (dndx[c] * ghx + dndz[c] * ghz) + pe_src)
                for c in range(3)])
            pp_tdot = fpack[:, 2]
            force = -fpack[:, :2]
        else:
            hydro_diff_max = s.hydro_diff_max
            fpack = asm_pack([
                ((stress_c[0] * dndx[c] + stress_c[2] * dndz[c]) * vol,
                 (stress_c[2] * dndx[c] + stress_c[1] * dndz[c] + buoy)
                 * vol)
                for c in range(3)])
            force = -fpack
        l2_res = F.residual_l2(force)

        if ctrl.gravity != 0:
            force = bc_mod.apply_stress_bcs(
                param, ctx.sbc, s.coord, force, rho_e,
                compensation_pressure, s.coord0)
        force = bc_mod.apply_stress_bcs_neumann(ctx.sbc, s.coord, force)
        force = F.apply_damping(force, s.vel, s.mass, s.ymass,
                                ctrl.damping_option, ctrl.damping_factor)
        vel = F.update_velocity(s.vel, force, s.mass, s.dt)

        # pseudo-transient inner relaxation (dynearthsol.cxx:779-840) in
        # SoA columns: same kernel sequence with ZEROED vbc values
        # (PT_jump, bc.cxx:305-317), surface processes skipped
        # (dynearthsol.cxx:439-444) and hydraulic diffusion suspended
        # (:781-784), iterated until the residual's relative change
        # drops below PT_relative_tolerance
        if ctrl.has_PT:
            vbc0 = dataclasses.replace(ctx.vbc, values=(0.0,) * 6,
                                       values_lateral=(0.0,) * 4)
            sc0 = dataclasses.replace(
                s, vel=vel, stress=stress, stressyy=stressyy,
                strain=strain, strain_rate=strain_rate,
                plstrain=plstrain, delta_plstrain=delta_plstrain,
                viscosity=viscosity, dpressure=dpressure,
                dyn_fric_coeff=dyn_fric_coeff,
                state_variable=state_variable, edvoldt=edvoldt,
                temperature=temperature, l2_residual=l2_res)
            # PT-loop-invariant: the POST-diffusion element temperature
            # (the generic loop gathers s_mid.temperature)
            tsp = cgather(temperature[:, None])
            temp_e_pt = (tsp[0][0] + tsp[1][0] + tsp[2][0]) / npe

            def pt_body(carry):
                sc, res_old, _, k = carry
                velp = bc_mod.apply_vbcs(vbc0, sc.vel, sc.coord, time)
                if ctrl.has_moving_mesh:
                    coordp = F.update_coordinate(sc.coord, velp, sc.dt)
                    gp = cgather(jnp.concatenate([coordp, velp], axis=1))
                    volp_old = sc.volume
                else:
                    coordp = sc.coord
                    gp = cgather(jnp.concatenate([coordp, velp], axis=1))
                xsp = tuple(gp[c][0] for c in range(3))
                zsp = tuple(gp[c][1] for c in range(3))
                vxp = tuple(gp[c][2] for c in range(3))
                vzp = tuple(gp[c][3] for c in range(3))
                if ctrl.has_moving_mesh:
                    volp = volume_of(xsp, zsp)
                    if ctrl.use_global_velocity_scaling:
                        apparent = jnp.minimum(
                            sc.max_global_vel_mag * ctrl.inertial_scaling,
                            jnp.sqrt(shearm / rho_e))
                        rho_q = bulkm / (apparent * apparent)
                    else:
                        rho_q = bulkm / (pseudo_speed * pseudo_speed)
                    rho_m = rho_q if ctrl.is_quasi_static else rho_e
                    bulk_comp_p = 1.0 / (bulkm + shearm / 3.0)
                    ab_p = M.alpha_biot(tab, s.emw)
                    bf_p = M.beta_fluid(tab, s.emw)
                    cp_p = M.cp(tab, s.emw)
                    hm_co = ab_p + phi_e - ab_p * phi_e
                    mpk = asm_pack([(volp, rho_m * volp / npe,
                                     rho_e * cp_p * volp / npe,
                                     (hm_co * bulk_comp_p
                                      + phi_e * bf_p) * volp / npe,
                                     9.0 * bulkm * shearm
                                     / (3.0 * bulkm + shearm) / npe)] * 3)
                    sc = dataclasses.replace(
                        sc, coord=coordp, volume=volp,
                        volume_old=volp_old, volume_n=mpk[:, 0],
                        mass=mpk[:, 1], tmass=mpk[:, 2],
                        hmass=mpk[:, 3], ymass=mpk[:, 4])
                else:
                    volp = sc.volume
                vnp = cgather(sc.volume_n[:, None])
                dndxp, dndzp = shape_fn(xsp, zsp, volp)
                lxxp = (vxp[0] * dndxp[0] + vxp[1] * dndxp[1]
                        + vxp[2] * dndxp[2])
                lzzp = (vzp[0] * dndzp[0] + vzp[1] * dndzp[1]
                        + vzp[2] * dndzp[2])
                lxzp = 0.5 * (vxp[0] * dndzp[0] + vxp[1] * dndzp[1]
                              + vxp[2] * dndzp[2]
                              + vzp[0] * dndxp[0] + vzp[1] * dndxp[1]
                              + vzp[2] * dndxp[2])
                srp = (lxxp, lzzp, lxzp)
                _, gdvp = asm_gather([((lxxp + lzzp) * volp,)] * 3, kg=1)
                dvsp = [gdvp[c][0] / vnp[c][0] for c in range(3)]
                edvp = (dvsp[0] + dvsp[1] + dvsp[2]) / npe
                adjp = (edvp - (lxxp + lzzp)) / 2.0
                edotp = (lxxp + adjp, lzzp + adjp, lxzp)
                dep = (edotp[0] * sc.dt, edotp[1] * sc.dt,
                       edotp[2] * sc.dt)
                strainp = jnp.stack([sc.strain[0] + dep[0],
                                     sc.strain[1] + dep[1],
                                     sc.strain[2] + dep[2]])
                vmeanp = None
                if is_rsf:
                    vmeanp = ((vxp[0] + vxp[1] + vxp[2]) / npe,
                              (vzp[0] + vzp[1] + vzp[2]) / npe)
                sc1 = dataclasses.replace(sc, vel=velp, edvoldt=edvp)
                (stp, syyp, plsp, dplsp, viscp, dprp, dfcp, svp) =                     update_stress_cols(tab, sc1, dep, edotp, srp, bulkm,
                                       shearm, temp_e_pt, sc.dt, None,
                                       vmeanp)
                # NO NMD smoothing inside the PT loop: the reference
                # iteration is update_stress -> update_force only
                # (dynearthsol.cxx:787-800; NMD_stress is a main-loop
                # kernel), and the generic PT loop matches
                fpk = asm_pack([
                    ((stp[0] * dndxp[c] + stp[2] * dndzp[c]) * volp,
                     (stp[2] * dndxp[c] + stp[1] * dndzp[c] + buoy)
                     * volp)
                    for c in range(3)])
                forcep = -fpk
                resp = F.residual_l2(forcep)
                if ctrl.gravity != 0:
                    forcep = bc_mod.apply_stress_bcs(
                        param, ctx.sbc, sc.coord, forcep, rho_e,
                        compensation_pressure, sc.coord0)
                forcep = bc_mod.apply_stress_bcs_neumann(
                    ctx.sbc, sc.coord, forcep)
                forcep = F.apply_damping(forcep, velp, sc.mass, sc.ymass,
                                         ctrl.damping_option,
                                         ctrl.damping_factor)
                velq = F.update_velocity(velp, forcep, sc.mass, sc.dt)
                relp = jnp.abs((resp - res_old)
                               / jnp.where(res_old != 0, res_old, 1.0))
                sc2 = dataclasses.replace(
                    sc1, vel=velq, force=forcep, stress=jnp.stack(stp),
                    stressyy=syyp, strain=strainp,
                    strain_rate=jnp.stack(edotp), plstrain=plsp,
                    delta_plstrain=dplsp, viscosity=viscp,
                    dpressure=dprp, l2_residual=resp,
                    **({"dyn_fric_coeff": dfcp, "state_variable": svp}
                       if dfcp is not None else {}))
                return (sc2, resp, relp, k + 1)

            def pt_cond(carry):
                _, _, rel, k = carry
                return ((k < ctrl.PT_max_iter)
                        & (rel >= ctrl.PT_relative_tolerance))

            s_pt, _, _, _ = jax.lax.while_loop(
                pt_cond, pt_body,
                (sc0, l2_res, jnp.ones((), dtype=vol.dtype), 0))
            (stress, stressyy, strain, strain_rate, plstrain,
             delta_plstrain, viscosity, dpressure) = (
                s_pt.stress, s_pt.stressyy, s_pt.strain,
                s_pt.strain_rate, s_pt.plstrain, s_pt.delta_plstrain,
                s_pt.viscosity, s_pt.dpressure)
            dyn_fric_coeff = s_pt.dyn_fric_coeff
            state_variable = s_pt.state_variable
            vel, force, l2_res, edvoldt = (s_pt.vel, s_pt.force,
                                           s_pt.l2_residual,
                                           s_pt.edvoldt)
            s = dataclasses.replace(
                s, coord=s_pt.coord, volume=s_pt.volume,
                volume_old=s_pt.volume_old, volume_n=s_pt.volume_n,
                mass=s_pt.mass, tmass=s_pt.tmass, hmass=s_pt.hmass,
                ymass=s_pt.ymass)
            vol = s.volume
            stress_c = (stress[0], stress[1], stress[2])

        # pore-pressure update after velocity, before vbcs
        # (dynearthsol.cxx:842-850 order)
        ppressure, dppressure = s.ppressure, s.dppressure
        if ctrl.has_hydraulic_diffusion:
            if ctrl.has_PT:
                # post-PT recompute from the PT-updated stress (the
                # generic step calls F.update_pore_pressure here with
                # the pre-PT shape gradients; mirror exactly)
                from .assembly import make_asm as _make_asm

                dnd_r3 = jnp.stack(
                    [jnp.stack([dndx[c], dndz[c]], axis=-1)
                     for c in range(3)], axis=1)
                ppressure, dppressure, hydro_diff_max =                     F.update_pore_pressure(
                        s.ppressure, s.dppressure, s.coord, ctx.conn,
                        dnd_r3, s.volume, stress.T, old_mean_stress,
                        s.hmass, s.dt, ctrl.gravity,
                        M.perm(tab, s.emw), M.mu_fluid(tab, s.emw),
                        M.alpha_biot(tab, s.emw),
                        M.phi_porosity(tab, s.emw),
                        M.beta_fluid(tab, s.emw), bulkm, shearm,
                        ctx.pp_bc_mask, _make_asm(ctx))
            else:
                upd = jnp.where(
                    s.hmass > 0.0,
                    pp_tdot * s.dt / jnp.where(s.hmass > 0, s.hmass, 1.0),
                    0.0)
                ppressure = jnp.where(ctx.pp_bc_mask, s.ppressure,
                                      s.ppressure - upd)
                dppressure = jnp.where(ctx.pp_bc_mask, s.dppressure, upd)

        vel = bc_mod.apply_vbcs(ctx.vbc, vel, s.coord, time)

        # update_mesh (dynearthsol.cxx:431-473)
        dhacc, edvacc_surf = s.dhacc, s.edvacc_surf
        if ctrl.has_moving_mesh:
            coord = F.update_coordinate(s.coord, vel, s.dt)
            if ctrl.surface_process_option != 0 and ctx.surf.etop > 0:
                # nodal-only surface processes (bc.cxx:1667-1831); the
                # post-update vel gather and the surface-moved coord
                # re-gather ride ONE packed call
                coord, dhacc, edvacc_surf, _dh = \
                    SP.apply_surface_processes(param, ctx.surf, coord,
                                               s.dt, dhacc, edvacc_surf)
                g2 = cgather(jnp.concatenate([vel, coord], axis=1))
                vxs2 = tuple(g2[c][0] for c in range(3))
                vzs2 = tuple(g2[c][1] for c in range(3))
                xs2 = tuple(g2[c][2] for c in range(3))
                zs2 = tuple(g2[c][3] for c in range(3))
            else:
                v2 = cgather(vel)
                vxs2 = tuple(v2[c][0] for c in range(3))
                vzs2 = tuple(v2[c][1] for c in range(3))
                xs2 = tuple(xs[i] + vxs2[i] * s.dt for i in range(3))
                zs2 = tuple(zs[i] + vzs2[i] * s.dt for i in range(3))
            volume_old = vol
            volume = volume_of(xs2, zs2)
            if ctx.surf.etop > 0 and ctrl.has_surface_correction:
                # correct_surface_element (bc.cxx:1613-1665); same math
                # as SP.correct_surface_elements, broadcast over the
                # k-major (NSTR, nelem) tensor layout
                top = ctx.surf.top_elem_mask > 0
                rdv = volume / vol
                tscale = jnp.where(top & (rdv >= 1.0), 1.0 / rdv, 1.0)
                stress = stress * tscale
                strain = strain * tscale
                strain_rate = strain_rate * tscale
                plstrain = plstrain * tscale
                volume_old = jnp.where(top, volume, vol)
                qcsi = param.mesh.quality_check_step_interval
                plstrain = SP.surface_plstrain_decay(
                    ctx.surf, plstrain, s.emw, s.dt,
                    param.mat.mattype_oceanic_crust,
                    apply=(steps % qcsi) == 0)
        else:
            coord, volume_old, volume = s.coord, s.volume_old, vol
            v2 = cgather(vel)
            vxs2 = tuple(v2[c][0] for c in range(3))
            vzs2 = tuple(v2[c][1] for c in range(3))
            xs2, zs2 = xs, zs

        # CFL dt, refreshed every 10 steps (dynearthsol.cxx:861-871)
        dt_new, vmax, gdtmin = compute_dt_cols(
            xs2, zs2, volume, vxs2, vzs2, shearm, rho_e,
            s.hydro_diff_max)
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
            mpack = asm_pack([(volume, m, tm, hm, ym)] * 3)
            volume_n = mpack[:, 0]
            mass = mpack[:, 1]
            tmass = mpack[:, 2]
            hmass = mpack[:, 3]
            ymass = mpack[:, 4]
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
        upd_avg = {}
        if param.sim.is_outputting_averaged_fields:
            interval = param.mesh.quality_check_step_interval
            reset = (steps % interval) == 1
            upd_avg = dict(
                stress_avg=jnp.where(reset, stress, s.stress_avg + stress),
                delta_plstrain_avg=jnp.where(
                    reset, delta_plstrain,
                    s.delta_plstrain_avg + delta_plstrain),
                coord_avg0=jnp.where(reset, coord, s.coord_avg0),
                strain_avg0=jnp.where(reset, strain, s.strain_avg0),
                time_avg0=jnp.where(reset, time, s.time_avg0))

        return dataclasses.replace(
            s, coord=coord, vel=vel, temperature=temperature,
            volume=volume, volume_old=volume_old, volume_n=volume_n,
            mass=mass, tmass=tmass, hmass=hmass, ymass=ymass,
            force=force, stress=stress, stressyy=stressyy, strain=strain,
            strain_rate=strain_rate, plstrain=plstrain,
            delta_plstrain=delta_plstrain, viscosity=viscosity,
            dpressure=dpressure, edvoldt=edvoldt, l2_residual=l2_res,
            dhacc=dhacc, edvacc_surf=edvacc_surf,
            dyn_fric_coeff=dyn_fric_coeff, state_variable=state_variable,
            ppressure=ppressure, dppressure=dppressure,
            old_mean_stress=old_mean_stress,
            hydro_diff_max=hydro_diff_max,
            dt=dt_out, time=time, steps=steps,
            max_global_vel_mag=vmax, global_dt_min=gdtmin, **upd_avg)

    return step


def make_chunk_runner(param: Param, ctx, compensation_pressure: float,
                      n: int):
    """jit(run_chunk)(ctx, state): transpose -> scan n steps -> back."""
    step = make_flat_step(param, ctx, compensation_pressure)

    @jax.jit
    def run_chunk(sctx, state):
        g = state_to_flat(state)

        def body(s, _):
            return step(sctx, s), None

        g, _ = jax.lax.scan(body, g, length=n)
        return flat_to_state(g)

    return run_chunk
