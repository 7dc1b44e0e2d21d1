"""Unstructured-mesh 3D step in SoA column layout.

The 3D sibling of ops/flat2d.py (see its docstring for the rank-3
small-dims tiling pathology this layout avoids): element tensors ride
k-major (6, nelem), corner slots come from npe=4 static-index k-packed
gathers, and assembly is the degree-unrolled masked gather over the
node_sum support table with corner-major slot renumbering — the same
per-node summation order as the generic step, so f64 trajectories match
to roundoff (tests/test_flat.py).

Structured 3D meshes take grid3d/pallas3d; this path serves unstructured
tet meshes — i.e. every post-remesh 3D production run.  Reference kernel
order: dynearthsol.cxx:746-956."""

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
from .flat2d import E_TENSORS, flat_to_state, state_to_flat
from .matprops import MIN_STRAIN_RATE


def flat3d_step_applicable(param: Param, ctx) -> bool:
    """Static gate; applies to structured meshes too (dispatch checks the
    grid/pallas paths first — see flat2d.flat_step_applicable)."""
    ctrl = param.control
    rheol = param.mat.rheol_type
    return (ctx.axis is None and ctx.ndims == 3
            and rheol in (RH_ELASTIC, RH_VISCOUS, RH_MAXWELL, RH_EP,
                          RH_EVP, RH_EP_RSF, RH_EVP_RSF))


def make_flat_step(param: Param, ctx, compensation_pressure: float = 0.0):
    ctrl = param.control
    mat = param.mat
    nelem = int(ctx.nelem)
    nnode = int(ctx.nnode)
    max_vbc_val = ctx.max_vbc_val
    visc_min = ctx.mat.visc_min
    therm_diff_max = ctx.mat.therm_diff_max
    rheol = mat.rheol_type
    pseudo_speed = max_vbc_val * ctrl.inertial_scaling
    npe = 4.0

    conn_np = np.asarray(ctx.conn)
    c_idx = tuple(jnp.asarray(conn_np[:, c]) for c in range(4))

    gidx = np.asarray(ctx.gather_idx)
    gmask = np.asarray(ctx.gather_mask)
    e_of = gidx // 4
    c_of = gidx % 4
    gidx_cm = np.where(gmask, c_of * nelem + e_of, 0)
    max_deg = gidx.shape[1]
    g_cols = tuple(jnp.asarray(gidx_cm[:, d]) for d in range(max_deg))
    m_cols = tuple(jnp.asarray(gmask[:, d]) for d in range(max_deg))

    # banded MXU engine (ops/band2d.py — npe-generic: ABR=8 exactly
    # fits the 2*npe=8 table rows of tets): f32 only, exact column
    # engine otherwise (see flat2d.py for the rationale).  The tables
    # are (re)bound from the traced runtime ctx at the top of step so
    # they ride as jit arguments, not embedded constants.
    _tables = {}
    band_native = jax.default_backend() != "cpu"

    def _band(dtype):
        bt = _tables.get("band")
        return bt if (bt is not None and dtype == jnp.float32) else None

    def cgather(pack):
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
            return [sum((p[c] for p in parts), ()) for c in range(4)]
        out = []
        for c in range(4):
            rows = pack[c_idx[c]]
            out.append(tuple(rows[:, j] for j in range(k)))
        return out

    def asm_pack(slot_cols):
        k = len(slot_cols[0])
        bt = _band(slot_cols[0][0].dtype)
        if bt is not None:
            eng = (band2d.scatter_corners_tpu if band_native
                   else band2d.scatter_corners)
            return jnp.stack(eng(slot_cols, bt), axis=1)
        pack = jnp.stack(
            [jnp.concatenate([slot_cols[c][j] for c in range(4)])
             for j in range(k)], axis=1)
        acc = jnp.zeros((nnode, k), dtype=pack.dtype)
        for d in range(max_deg):
            vals = pack[g_cols[d]]
            acc = acc + jnp.where(m_cols[d][:, None], vals, 0.0)
        return acc

    def asm_gather(slot_cols, kg):
        """Fused assembly + immediate corner re-gather of the first
        ``kg`` nodal sums (see flat2d.asm_gather)."""
        k = len(slot_cols[0])
        bt = _band(slot_cols[0][0].dtype)
        if bt is not None:
            eng = (band2d.scatter_gather_corners_tpu if band_native
                   else band2d.scatter_gather_corners)
            sums, gath = eng(slot_cols, bt, kg)
            return jnp.stack(sums, axis=1), gath
        pack = asm_pack(slot_cols)
        return pack, cgather(pack[:, :kg])

    def shape_fn(xs, ys, zs, vol):
        """P1 tet gradients (fields.cxx:11-54)."""
        iv = 1.0 / (6.0 * vol)

        def d(a, i, j):
            return a[i] - a[j]

        x01, x02, x03 = d(xs, 0, 1), d(xs, 0, 2), d(xs, 0, 3)
        x12, x13, x23 = d(xs, 1, 2), d(xs, 1, 3), d(xs, 2, 3)
        y01, y02, y03 = d(ys, 0, 1), d(ys, 0, 2), d(ys, 0, 3)
        y12, y13, y23 = d(ys, 1, 2), d(ys, 1, 3), d(ys, 2, 3)
        z01, z02, z03 = d(zs, 0, 1), d(zs, 0, 2), d(zs, 0, 3)
        z12, z13, z23 = d(zs, 1, 2), d(zs, 1, 3), d(zs, 2, 3)
        dndx = (iv * (y13 * z12 - y12 * z13), iv * (y02 * z23 - y23 * z02),
                iv * (y13 * z03 - y03 * z13), iv * (y01 * z02 - y02 * z01))
        dndy = (iv * (z13 * x12 - z12 * x13), iv * (z02 * x23 - z23 * x02),
                iv * (z13 * x03 - z03 * x13), iv * (z01 * x02 - z02 * x01))
        dndz = (iv * (x13 * y12 - x12 * y13), iv * (x02 * y23 - x23 * y02),
                iv * (x13 * y03 - x03 * y13), iv * (x01 * y02 - x02 * y01))
        return dndx, dndy, dndz

    def volume_of(xs, ys, zs):
        d1 = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
        d2 = (xs[2] - xs[0], ys[2] - ys[0], zs[2] - zs[0])
        d3 = (xs[3] - xs[0], ys[3] - ys[0], zs[3] - zs[0])
        return (d1[0] * (d2[1] * d3[2] - d2[2] * d3[1])
                + d1[1] * (d2[2] * d3[0] - d2[0] * d3[2])
                + d1[2] * (d2[0] * d3[1] - d2[1] * d3[0])) / 6.0

    def min_height(xs, ys, zs, vol):
        """3*V / largest facet area (geometry.cxx:830-852)."""
        def tri_area(i, j, k):
            ux, uy, uz = xs[j] - xs[i], ys[j] - ys[i], zs[j] - zs[i]
            vx, vy, vz = xs[k] - xs[i], ys[k] - ys[i], zs[k] - zs[i]
            cx = uy * vz - uz * vy
            cy = uz * vx - ux * vz
            cz = ux * vy - uy * vx
            return 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)

        maxa = jnp.maximum(
            jnp.maximum(tri_area(0, 1, 2), tri_area(0, 1, 3)),
            jnp.maximum(tri_area(2, 3, 0), tri_area(2, 3, 1)))
        return 3.0 * vol / maxa

    def compute_dt_cols(xs, ys, zs, vol, vxs, vys, vzs, shearm, rho_e,
                        hydro_diff_max=None):
        dtype = vol.dtype
        big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)
        vx_m = sum(vxs[i] for i in range(4)) / npe
        vy_m = sum(vys[i] for i in range(4)) / npe
        vz_m = sum(vzs[i] for i in range(4)) / npe
        vmag = jnp.sqrt(vx_m ** 2 + vy_m ** 2 + vz_m ** 2)
        vmax = jnp.maximum(vmag.max(), max_vbc_val)
        if ctrl.fixed_dt != 0.0:
            fdt = jnp.asarray(ctrl.fixed_dt, dtype=dtype)
            return fdt, vmax, fdt
        minh = min_height(xs, ys, zs, vol)
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

    def inv2(t):
        a = (t[0] + t[1] + t[2]) / 3.0
        return (0.5 * ((t[0] - a) ** 2 + (t[1] - a) ** 2 + (t[2] - a) ** 2)
                + t[3] ** 2 + t[4] ** 2 + t[5] ** 2)

    is_rsf = rheol in (RH_EP_RSF, RH_EVP_RSF)
    rheol_ep = rheol in (RH_EP, RH_EP_RSF)
    rheol_evp = rheol in (RH_EVP, RH_EVP_RSF)

    def update_stress_cols(tab, s, de, edot, sr, bulkm, shearm, temp_e,
                           dt, dpp=None, vmean=None):
        """Constitutive switch (rheology.cxx:676-991); mirrors grid3d
        (+ the Biot dpp diagonal, rheology.cxx:696-755, and the RSF
        variants, rheology.cxx:151-194 + matprops.cxx:532-552)."""
        stress = tuple(s.stress[i] for i in range(6))
        old_tr = stress[0] + stress[1] + stress[2]
        plstrain, delta_plstrain = s.plstrain, s.delta_plstrain
        viscosity = s.viscosity
        dyn_fric_coeff = s.dyn_fric_coeff
        state_variable = s.state_variable

        if is_rsf:
            # the 3D slip projection needs the principal frame; the
            # (nelem, 6)/(nelem, 3) stacks are small one-off
            # materializations feeding R.slip_rate3 unchanged
            s_aos = jnp.stack(stress, axis=1)
            v_aos = jnp.stack(vmean, axis=1)
            slip = R.slip_rate3(s_aos, v_aos)
            (amc_r, anphi_r, anpsi_r, hardn_r, ten_max_r,
             dyn_fric_coeff, state_variable) = M.plastic_props_rsf(
                tab, s.emw, s.plstrain, slip, s.state_variable, dt,
                param.mat.state_var_model)

        def creep_visc():
            s0 = (stress[0] + stress[1] + stress[2]) / 3.0
            ed = jnp.maximum(jnp.sqrt(inv2(sr)), MIN_STRAIN_RATE)
            return M.visc_core(tab, s.emw, temp_e, s0, ed)

        if rheol == RH_ELASTIC:
            stress = R.elastic3_c(bulkm, shearm, de, stress, dpp)
        elif rheol == RH_VISCOUS:
            viscosity = creep_visc()
            strain_new = tuple(s.strain[i] + de[i] for i in range(6))
            total_dv = strain_new[0] + strain_new[1] + strain_new[2]
            stress = R.viscous3_c(bulkm, viscosity, total_dv, edot)
        elif rheol == RH_MAXWELL:
            viscosity = creep_visc()
            dv = s.volume / s.volume_old - 1.0
            stress = R.maxwell3_c(bulkm, shearm, viscosity, dt, dv, de,
                                  stress)
        elif rheol_ep:
            if is_rsf:
                amc, anphi, anpsi = amc_r, anphi_r, anpsi_r
                hardn, ten_max = hardn_r, ten_max_r
            else:
                amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                    tab, s.emw, s.plstrain)
            stress, depls, _ = R.elasto_plastic3_c(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max, de,
                stress, dpp)
            plstrain = s.plstrain + depls
            delta_plstrain = depls
        elif rheol_evp:
            viscosity = creep_visc()
            dv = s.volume / s.volume_old - 1.0
            sv = R.maxwell3_c(bulkm, shearm, viscosity, dt, dv, de,
                              stress)
            if is_rsf:
                amc, anphi, anpsi = amc_r, anphi_r, anpsi_r
                hardn, ten_max = hardn_r, ten_max_r
            else:
                amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                    tab, s.emw, s.plstrain)
            sp, depls, _ = R.elasto_plastic3_c(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max, de,
                stress, dpp)
            use_v = inv2(sv) < inv2(sp)
            stress = tuple(jnp.where(use_v, a, b) for a, b in zip(sv, sp))
            plstrain = jnp.where(use_v, s.plstrain, s.plstrain + depls)
            delta_plstrain = jnp.where(use_v, s.delta_plstrain, depls)
        else:  # pragma: no cover - gated
            raise ValueError(f"flat3d: unsupported rheology {rheol}")
        if ctrl.is_using_mixed_stress:
            dpressure = stress[0] + stress[1] + stress[2] - old_tr
        else:
            dpressure = s.dpressure
        return (stress, plstrain, delta_plstrain, viscosity, dpressure,
                dyn_fric_coeff, state_variable)

    def step(ctx, s):
        _tables["band"] = getattr(ctx, "band", None)
        tab = ctx.mat
        dt = s.dt
        steps = s.steps + 1
        time = s.time + s.dt

        # volume_n rides the packed gather so the dvoldt/NMD transfer
        # hops can divide their re-gathered sums per-corner
        cols = [s.coord, s.vel, s.temperature[:, None]]
        if ctrl.has_hydraulic_diffusion:
            cols += [s.ppressure[:, None], s.dppressure[:, None]]
        cols.append(s.volume_n[:, None])
        nodal_pack = jnp.concatenate(cols, axis=1)
        iv_vn = nodal_pack.shape[1] - 1
        slots = cgather(nodal_pack)
        xs = tuple(slots[c][0] for c in range(4))
        ys = tuple(slots[c][1] for c in range(4))
        zs = tuple(slots[c][2] for c in range(4))
        vxs = tuple(slots[c][3] for c in range(4))
        vys = tuple(slots[c][4] for c in range(4))
        vzs = tuple(slots[c][5] for c in range(4))
        ts = tuple(slots[c][6] for c in range(4))
        vns = tuple(slots[c][iv_vn] for c in range(4))

        vol = s.volume
        dndx, dndy, dndz = shape_fn(xs, ys, zs, vol)
        temp_e = (ts[0] + ts[1] + ts[2] + ts[3]) / npe
        bulkm = M.bulkm(tab, s.emw)
        shearm = M.shearm(tab, s.emw)
        rho_e = M.rho_from_T(tab, s.emw, temp_e)

        # strain rate (fields.cxx:408-483)
        lxx = sum(vxs[i] * dndx[i] for i in range(4))
        lyy = sum(vys[i] * dndy[i] for i in range(4))
        lzz = sum(vzs[i] * dndz[i] for i in range(4))
        lxy = 0.5 * (sum(vxs[i] * dndy[i] for i in range(4))
                     + sum(vys[i] * dndx[i] for i in range(4)))
        lxz = 0.5 * (sum(vxs[i] * dndz[i] for i in range(4))
                     + sum(vzs[i] * dndx[i] for i in range(4)))
        lyz = 0.5 * (sum(vys[i] * dndz[i] for i in range(4))
                     + sum(vzs[i] * dndy[i] for i in range(4)))
        sr = (lxx, lyy, lzz, lxy, lxz, lyz)

        # thermal diffusion + dvoldt share ONE assembly
        etmp = (lxx + lyy + lzz) * vol
        if ctrl.has_thermal_diffusion:
            kappa = M.therm_cond(tab, s.emw)
            source = s.radiogenic_source * vol * rho_e / npe
            kv = kappa * vol
            gx = sum(dndx[i] * ts[i] for i in range(4))
            gy = sum(dndy[i] * ts[i] for i in range(4))
            gz = sum(dndz[i] * ts[i] for i in range(4))
            both, gdv = asm_gather([
                (etmp, kv * (dndx[c] * gx + dndy[c] * gy + dndz[c] * gz)
                 - source) for c in range(4)], kg=1)
            tdot = both[:, 1]
            temperature = jnp.where(
                ctx.top_mask, param.bc.surface_temperature,
                s.temperature - s.dt * tdot / s.tmass)
        else:
            _, gdv = asm_gather([(etmp,)] * 4, kg=1)
            temperature = s.temperature

        # fused transfer hop: corner division by volume_n equals
        # gathering dv_sum/volume_n bit-for-bit
        dvs = [gdv[c][0] / vns[c] for c in range(4)]
        edvoldt = (dvs[0] + dvs[1] + dvs[2] + dvs[3]) / npe

        adj = (edvoldt - (lxx + lyy + lzz)) / 3.0
        edot = (lxx + adj, lyy + adj, lzz + adj, lxy, lxz, lyz)
        de = tuple(edot[i] * dt for i in range(6))
        strain = jnp.stack([s.strain[i] + de[i] for i in range(6)])
        strain_rate = jnp.stack(edot)

        # Biot effective-stress increment + pre-update mean stress
        old_mean_stress = s.old_mean_stress
        dpp = None
        if ctrl.has_hydraulic_diffusion:
            old_mean_stress = (s.stress[0] + s.stress[1]
                               + s.stress[2]) / 3.0
            alpha_b = M.alpha_biot(tab, s.emw)
            dpp = alpha_b * (slots[0][8] + slots[1][8] + slots[2][8]
                             + slots[3][8]) / npe

        vmean = None
        if is_rsf:
            vmean = (sum(vxs[i] for i in range(4)) / npe,
                     sum(vys[i] for i in range(4)) / npe,
                     sum(vzs[i] for i in range(4)) / npe)
        s_mid = dataclasses.replace(s, edvoldt=edvoldt)
        (stress_c, plstrain, delta_plstrain, viscosity, dpressure,
         dyn_fric_coeff, state_variable) = \
            update_stress_cols(tab, s_mid, de, edot, sr, bulkm, shearm,
                               temp_e, dt, dpp, vmean)

        if ctrl.is_using_mixed_stress:
            _, gdp = asm_gather([(dpressure * vol,)] * 4, kg=1)
            dps = [gdp[c][0] / vns[c] for c in range(4)]
            ddp = ((dps[0] + dps[1] + dps[2] + dps[3]) / npe
                   - dpressure) / 3.0
            stress_c = (stress_c[0] + ddp, stress_c[1] + ddp,
                        stress_c[2] + ddp) + stress_c[3:]
        stress = jnp.stack(stress_c)

        # force assembly (fields.cxx:612-703)
        phi_e = M.phi_porosity(tab, s.emw)
        if ctrl.gravity != 0:
            buoy = (rho_e * (1.0 - phi_e) + 1000.0 * phi_e) \
                * ctrl.gravity / npe
        else:
            buoy = jnp.zeros_like(vol)
        if ctrl.has_hydraulic_diffusion:
            # pore-pressure contributions ride the force assembly (k=4);
            # fields.cxx:297-406, bulk_comp = 1/K in 3D (geometry.cxx:1098)
            mean_change = (stress_c[0] + stress_c[1] + stress_c[2]) / 3.0 \
                - old_mean_stress
            matrix_comp = 1.0 / (bulkm + 4.0 * shearm / 3.0)
            bulk_comp2 = 1.0 / bulkm
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
            heads = tuple(slots[c][7] / gamma_w + zs[c] for c in range(4))
            ghx = sum(dndx[c] * heads[c] for c in range(4))
            ghy = sum(dndy[c] * heads[c] for c in range(4))
            ghz = sum(dndz[c] * heads[c] for c in range(4))
            fpack = asm_pack([
                ((stress_c[0] * dndx[c] + stress_c[3] * dndy[c]
                  + stress_c[4] * dndz[c]) * vol,
                 (stress_c[3] * dndx[c] + stress_c[1] * dndy[c]
                  + stress_c[5] * dndz[c]) * vol,
                 (stress_c[4] * dndx[c] + stress_c[5] * dndy[c]
                  + stress_c[2] * dndz[c] + buoy) * vol,
                 kv_h * (dndx[c] * ghx + dndy[c] * ghy + dndz[c] * ghz)
                 + pe_src)
                for c in range(4)])
            pp_tdot = fpack[:, 3]
            force = -fpack[:, :3]
        else:
            hydro_diff_max = s.hydro_diff_max
            fpack = asm_pack([
                ((stress_c[0] * dndx[c] + stress_c[3] * dndy[c]
                  + stress_c[4] * dndz[c]) * vol,
                 (stress_c[3] * dndx[c] + stress_c[1] * dndy[c]
                  + stress_c[5] * dndz[c]) * vol,
                 (stress_c[4] * dndx[c] + stress_c[5] * dndy[c]
                  + stress_c[2] * dndz[c] + buoy) * vol)
                for c in range(4)])
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
        # SoA columns — see flat2d's PT block; NO NMD smoothing inside
        # the loop (the reference iteration is update_stress ->
        # update_force only, :787-800)
        if ctrl.has_PT:
            vbc0 = dataclasses.replace(ctx.vbc, values=(0.0,) * 6,
                                       values_lateral=(0.0,) * 4)
            sc0 = dataclasses.replace(
                s, vel=vel, stress=stress, strain=strain,
                strain_rate=strain_rate, plstrain=plstrain,
                delta_plstrain=delta_plstrain, viscosity=viscosity,
                dpressure=dpressure, dyn_fric_coeff=dyn_fric_coeff,
                state_variable=state_variable, edvoldt=edvoldt,
                temperature=temperature, l2_residual=l2_res)
            tsp = cgather(temperature[:, None])
            temp_e_pt = sum(tsp[c][0] for c in range(4)) / npe

            def pt_body(carry):
                sc, res_old, _, k = carry
                velp = bc_mod.apply_vbcs(vbc0, sc.vel, sc.coord, time)
                if ctrl.has_moving_mesh:
                    coordp = F.update_coordinate(sc.coord, velp, sc.dt)
                    volp_old = sc.volume
                else:
                    coordp = sc.coord
                gp = cgather(jnp.concatenate([coordp, velp], axis=1))
                xsp = tuple(gp[c][0] for c in range(4))
                ysp = tuple(gp[c][1] for c in range(4))
                zsp = tuple(gp[c][2] for c in range(4))
                vxp = tuple(gp[c][3] for c in range(4))
                vyp = tuple(gp[c][4] for c in range(4))
                vzp = tuple(gp[c][5] for c in range(4))
                if ctrl.has_moving_mesh:
                    volp = volume_of(xsp, ysp, zsp)
                    if ctrl.use_global_velocity_scaling:
                        apparent = jnp.minimum(
                            sc.max_global_vel_mag * ctrl.inertial_scaling,
                            jnp.sqrt(shearm / rho_e))
                        rho_q = bulkm / (apparent * apparent)
                    else:
                        rho_q = bulkm / (pseudo_speed * pseudo_speed)
                    rho_m = rho_q if ctrl.is_quasi_static else rho_e
                    bulk_comp_p = 1.0 / bulkm  # 3D (geometry.cxx:1098)
                    ab_p = M.alpha_biot(tab, s.emw)
                    bf_p = M.beta_fluid(tab, s.emw)
                    cp_p = M.cp(tab, s.emw)
                    hm_co = ab_p + phi_e - ab_p * phi_e
                    mpk = asm_pack([(volp, rho_m * volp / npe,
                                     rho_e * cp_p * volp / npe,
                                     (hm_co * bulk_comp_p
                                      + phi_e * bf_p) * volp / npe,
                                     9.0 * bulkm * shearm
                                     / (3.0 * bulkm + shearm) / npe)] * 4)
                    sc = dataclasses.replace(
                        sc, coord=coordp, volume=volp,
                        volume_old=volp_old, volume_n=mpk[:, 0],
                        mass=mpk[:, 1], tmass=mpk[:, 2],
                        hmass=mpk[:, 3], ymass=mpk[:, 4])
                else:
                    volp = sc.volume
                vnp = cgather(sc.volume_n[:, None])
                dndxp, dndyp, dndzp = shape_fn(xsp, ysp, zsp, volp)
                lxxp = sum(vxp[i] * dndxp[i] for i in range(4))
                lyyp = sum(vyp[i] * dndyp[i] for i in range(4))
                lzzp = sum(vzp[i] * dndzp[i] for i in range(4))
                lxyp = 0.5 * (sum(vxp[i] * dndyp[i] for i in range(4))
                              + sum(vyp[i] * dndxp[i] for i in range(4)))
                lxzp = 0.5 * (sum(vxp[i] * dndzp[i] for i in range(4))
                              + sum(vzp[i] * dndxp[i] for i in range(4)))
                lyzp = 0.5 * (sum(vyp[i] * dndzp[i] for i in range(4))
                              + sum(vzp[i] * dndyp[i] for i in range(4)))
                srp = (lxxp, lyyp, lzzp, lxyp, lxzp, lyzp)
                _, gdvp = asm_gather(
                    [((lxxp + lyyp + lzzp) * volp,)] * 4, kg=1)
                dvsp = [gdvp[c][0] / vnp[c][0] for c in range(4)]
                edvp = sum(dvsp) / npe
                adjp = (edvp - (lxxp + lyyp + lzzp)) / 3.0
                edotp = (lxxp + adjp, lyyp + adjp, lzzp + adjp,
                         lxyp, lxzp, lyzp)
                dep = tuple(edotp[i] * sc.dt for i in range(6))
                strainp = jnp.stack([sc.strain[i] + dep[i]
                                     for i in range(6)])
                vmeanp = None
                if is_rsf:
                    vmeanp = (sum(vxp[i] for i in range(4)) / npe,
                              sum(vyp[i] for i in range(4)) / npe,
                              sum(vzp[i] for i in range(4)) / npe)
                sc1 = dataclasses.replace(sc, vel=velp, edvoldt=edvp)
                (stp, plsp, dplsp, viscp, dprp, dfcp, svp) = \
                    update_stress_cols(tab, sc1, dep, edotp, srp, bulkm,
                                       shearm, temp_e_pt, sc.dt, None,
                                       vmeanp)
                fpk = asm_pack([
                    ((stp[0] * dndxp[c] + stp[3] * dndyp[c]
                      + stp[4] * dndzp[c]) * volp,
                     (stp[3] * dndxp[c] + stp[1] * dndyp[c]
                      + stp[5] * dndzp[c]) * volp,
                     (stp[4] * dndxp[c] + stp[5] * dndyp[c]
                      + stp[2] * dndzp[c] + buoy) * volp)
                    for c in range(4)])
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
                    strain=strainp, strain_rate=jnp.stack(edotp),
                    plstrain=plsp, delta_plstrain=dplsp, viscosity=viscp,
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
            (stress, strain, strain_rate, plstrain, delta_plstrain,
             viscosity, dpressure) = (
                s_pt.stress, s_pt.strain, s_pt.strain_rate,
                s_pt.plstrain, s_pt.delta_plstrain, s_pt.viscosity,
                s_pt.dpressure)
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
            stress_c = tuple(stress[i] for i in range(6))

        # pore-pressure update after velocity, before vbcs
        ppressure, dppressure = s.ppressure, s.dppressure
        if ctrl.has_hydraulic_diffusion:
            if ctrl.has_PT:
                # post-PT recompute from the PT-updated stress, exactly
                # like the generic step (see flat2d)
                from .assembly import make_asm as _make_asm

                dnd_r3 = jnp.stack(
                    [jnp.stack([dndx[c], dndy[c], dndz[c]], axis=-1)
                     for c in range(4)], axis=1)
                ppressure, dppressure, hydro_diff_max = \
                    F.update_pore_pressure(
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
                # the post-update vel gather and the surface-moved
                # coord re-gather ride ONE packed call
                coord, dhacc, edvacc_surf, _dh = \
                    SP.apply_surface_processes(param, ctx.surf, coord,
                                               s.dt, dhacc, edvacc_surf)
                g2 = cgather(jnp.concatenate([vel, coord], axis=1))
                vxs2 = tuple(g2[c][0] for c in range(4))
                vys2 = tuple(g2[c][1] for c in range(4))
                vzs2 = tuple(g2[c][2] for c in range(4))
                xs2 = tuple(g2[c][3] for c in range(4))
                ys2 = tuple(g2[c][4] for c in range(4))
                zs2 = tuple(g2[c][5] for c in range(4))
            else:
                v2 = cgather(vel)
                vxs2 = tuple(v2[c][0] for c in range(4))
                vys2 = tuple(v2[c][1] for c in range(4))
                vzs2 = tuple(v2[c][2] for c in range(4))
                xs2 = tuple(xs[i] + vxs2[i] * s.dt for i in range(4))
                ys2 = tuple(ys[i] + vys2[i] * s.dt for i in range(4))
                zs2 = tuple(zs[i] + vzs2[i] * s.dt for i in range(4))
            volume_old = vol
            volume = volume_of(xs2, ys2, zs2)
            if ctx.surf.etop > 0 and ctrl.has_surface_correction:
                # correct_surface_element (bc.cxx:1613-1665); no surface
                # plstrain decay in 3D (bc.cxx:1805-1810 is 2D-only)
                top = ctx.surf.top_elem_mask > 0
                rdv = volume / vol
                tscale = jnp.where(top & (rdv >= 1.0), 1.0 / rdv, 1.0)
                stress = stress * tscale
                strain = strain * tscale
                strain_rate = strain_rate * tscale
                plstrain = plstrain * tscale
                volume_old = jnp.where(top, volume, vol)
        else:
            coord, volume_old, volume = s.coord, s.volume_old, vol
            v2 = cgather(vel)
            vxs2 = tuple(v2[c][0] for c in range(4))
            vys2 = tuple(v2[c][1] for c in range(4))
            vzs2 = tuple(v2[c][2] for c in range(4))
            xs2, ys2, zs2 = xs, ys, zs

        dt_new, vmax, gdtmin = compute_dt_cols(
            xs2, ys2, zs2, volume, vxs2, vys2, vzs2, shearm, rho_e,
            s.hydro_diff_max)
        refresh = (steps % 10 == 0) | ctrl.use_global_velocity_scaling
        dt_out = jnp.where(refresh, dt_new, s.dt)

        if ctrl.has_moving_mesh:
            if ctrl.use_global_velocity_scaling:
                apparent = jnp.minimum(s.max_global_vel_mag
                                       * ctrl.inertial_scaling,
                                       jnp.sqrt(shearm / rho_e))
                rho_q = bulkm / (apparent * apparent)
            else:
                rho_q = bulkm / (pseudo_speed * pseudo_speed)
            rho_m = rho_q if ctrl.is_quasi_static else rho_e
            bulk_comp = 1.0 / bulkm  # 3D (geometry.cxx:1098)
            ab_e = M.alpha_biot(tab, s.emw)
            bf_e = M.beta_fluid(tab, s.emw)
            cp_e = M.cp(tab, s.emw)
            hm_coeff = ab_e + phi_e - ab_e * phi_e
            m = rho_m * volume / npe
            tm = rho_e * cp_e * volume / npe
            hm = (hm_coeff * bulk_comp + phi_e * bf_e) * volume / npe
            ym = 9.0 * bulkm * shearm / (3.0 * bulkm + shearm) / npe
            mpack = asm_pack([(volume, m, tm, hm, ym)] * 4)
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
            dndx2, dndy2, dndz2 = shape_fn(xs2, ys2, zs2, volume)
            w3 = 0.5 * (sum(vxs2[i] * dndy2[i] for i in range(4))
                        - sum(vys2[i] * dndx2[i] for i in range(4)))
            w4 = 0.5 * (sum(vxs2[i] * dndz2[i] for i in range(4))
                        - sum(vzs2[i] * dndx2[i] for i in range(4)))
            w5 = 0.5 * (sum(vys2[i] * dndz2[i] for i in range(4))
                        - sum(vzs2[i] * dndy2[i] for i in range(4)))
            w3t, w4t, w5t = w3 * s.dt, w4 * s.dt, w5 * s.dt

            def rot(t):
                return jnp.stack([
                    t[0] - 2.0 * t[3] * w3t - 2.0 * t[4] * w4t,
                    t[1] + 2.0 * t[3] * w3t - 2.0 * t[5] * w5t,
                    t[2] + 2.0 * t[4] * w4t + 2.0 * t[5] * w5t,
                    t[3] + (t[0] - t[1]) * w3t - t[4] * w5t - t[5] * w4t,
                    t[4] + (t[0] - t[2]) * w4t + t[3] * w5t - t[5] * w3t,
                    t[5] + (t[1] - t[2]) * w5t + t[3] * w4t + t[4] * w3t])

            stress = rot(stress)
            strain = rot(strain)

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
            force=force, stress=stress, strain=strain,
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
    step = make_flat_step(param, ctx, compensation_pressure)

    @jax.jit
    def run_chunk(sctx, state):
        g = state_to_flat(state)

        def body(s, _):
            return step(sctx, s), None

        g, _ = jax.lax.scan(body, g, length=n)
        return flat_to_state(g)

    return run_chunk
