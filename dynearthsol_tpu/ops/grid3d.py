"""Structured-grid 3D step: plane-layout fast path for 5-tet box meshes.

Same architecture as grid2d.py (see its module docstring), for the 3D
regular grid of generate.regular_grid_3d: node id = (i*ny + j)*nz + k and
5 tets per cell with a parity-mirrored decomposition.  Element fields
become (5, nxc, nyc, nzc) planes (tensors (6, 5, ...)); element<->node
transfers are shifted slices of the (nx, ny, nz) node grid with a
parity select between the two tet tables (structured.tet_tables);
physics is componentwise via the shared cores in rheology.py (including
the branch-free analytic eigensolver for the 3D Mohr-Coulomb return
map, eig3.py) and matprops.py.

Reference per-step kernel order: dynearthsol.cxx:746-956.
"""

from __future__ import annotations

import dataclasses
import functools

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
from .structured import tet_tables

E_SCALARS = ("volume", "volume_old", "stressyy", "old_mean_stress",
             "plstrain", "delta_plstrain", "viscosity", "dpressure",
             "edvoldt", "radiogenic_source", "dyn_fric_coeff",
             "state_variable", "delta_plstrain_avg")
E_TENSORS = ("stress", "strain", "strain_rate", "stress_avg", "strain_avg0")


@functools.lru_cache(maxsize=None)
def _parity3_np(nx: int, ny: int, nz: int):
    k = np.arange(nz - 1)[:, None, None]
    j = np.arange(ny - 1)[None, :, None]
    i = np.arange(nx - 1)[None, None, :]
    return (i + j + k) % 2 == 0  # (nzc, nyc, nxc), x-minor


def _parity3(nx: int, ny: int, nz: int):
    # numpy is cached, not jnp: a cached jnp array created inside a jit
    # trace leaks a tracer into later traces (UnexpectedTracerError)
    return jnp.asarray(_parity3_np(nx, ny, nz))


def state_to_grid(s, nx: int, ny: int, nz: int):
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1

    # planes are stored x-minor — (5, nzc, nyc, nxc) — so the (8,128)
    # tile pads the (usually largest) x extent instead of the shallow
    # vertical axis (a z-minor (..., nzc=32) plane wastes 4x of every pass)
    def e2p(a):  # (nelem,) -> (5, nzc, nyc, nxc)
        return a.reshape(nxc, nyc, nzc, 5).transpose(3, 2, 1, 0)

    def t2p(a):  # (nelem, 6) -> (6, 5, nzc, nyc, nxc)
        return a.reshape(nxc, nyc, nzc, 5, a.shape[1]) \
            .transpose(4, 3, 2, 1, 0)

    upd = {f: e2p(getattr(s, f)) for f in E_SCALARS}
    upd.update({f: t2p(getattr(s, f)) for f in E_TENSORS})
    upd["emw"] = s.emw.reshape(nxc, nyc, nzc, 5, s.emw.shape[1]) \
        .transpose(3, 2, 1, 0, 4)
    return dataclasses.replace(s, **upd)


def grid_to_state(g, nx: int, ny: int, nz: int):
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    nelem = nxc * nyc * nzc * 5

    def p2e(p):  # (5, nzc, nyc, nxc) -> (nelem,)
        return p.transpose(3, 2, 1, 0).reshape(nelem)

    def p2t(p):  # (6, 5, nzc, nyc, nxc) -> (nelem, 6)
        return p.transpose(4, 3, 2, 1, 0).reshape(nelem, p.shape[0])

    upd = {f: p2e(getattr(g, f)) for f in E_SCALARS}
    upd.update({f: p2t(getattr(g, f)) for f in E_TENSORS})
    upd["emw"] = g.emw.transpose(3, 2, 1, 0, 4).reshape(nelem,
                                                        g.emw.shape[4])
    return dataclasses.replace(g, **upd)


def grid_step_applicable(param: Param, ctx) -> bool:
    ctrl = param.control
    rheol = param.mat.rheol_type
    return (ctx.sgrid is not None and len(ctx.sgrid) == 3
            and ctx.axis is None and ctx.ndims == 3
            and not ctrl.has_hydraulic_diffusion
            and not ctrl.has_PT
            and rheol in (RH_ELASTIC, RH_VISCOUS, RH_MAXWELL, RH_EP,
                          RH_EVP))


def make_grid_step(param: Param, ctx, compensation_pressure: float = 0.0):
    """Build step(ctx, gstate) -> gstate on plane-layout State
    (3D structured 5-tet)."""
    ctrl = param.control
    mat = param.mat
    nx, ny, nz = ctx.sgrid
    max_vbc_val = ctx.max_vbc_val
    visc_min = ctx.mat.visc_min
    therm_diff_max = ctx.mat.therm_diff_max
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    nnode = nx * ny * nz
    P = _parity3(nx, ny, nz)
    even_t, odd_t = tet_tables()
    rheol = mat.rheol_type
    pseudo_speed = max_vbc_val * ctrl.inertial_scaling
    npe = 4.0

    def _views(g):
        """8 shifted cell-corner views of an x-minor node grid
        (nz, ny, nx); corner code = a*4 + b*2 + d for x/y/z offsets."""
        return [g[d:d + nzc, b:b + nyc, a:a + nxc]
                for a in (0, 1) for b in (0, 1) for d in (0, 1)]

    def gather(nodal):
        """(nnode,) -> 4 slot planes, each (5, nzc, nyc, nxc)."""
        c = _views(nodal.reshape(nx, ny, nz).transpose(2, 1, 0))
        slots = []
        for s in range(4):
            slots.append(jnp.stack(
                [jnp.where(P, c[even_t[t][s]], c[odd_t[t][s]])
                 for t in range(5)]))
        return tuple(slots)

    def _scatter(per_corner):
        """Add 8 per-corner cell planes into the (x-minor) node grid."""
        out = jnp.zeros((nz, ny, nx),
                        dtype=next(v for v in per_corner
                                   if v is not None).dtype)
        code = 0
        for a in (0, 1):
            for b in (0, 1):
                for d in (0, 1):
                    v = per_corner[code]
                    if v is not None:
                        out = out.at[d:d + nzc, b:b + nyc,
                                     a:a + nxc].add(v)
                    code += 1
        return out.transpose(2, 1, 0).reshape(nnode)

    def asm(*cs):
        """Transpose of gather: 4 slot planes -> nodal sums (nnode,)."""
        per_corner = []
        zero = jnp.zeros((nzc, nyc, nxc), dtype=cs[0].dtype)
        for code in range(8):
            acc_e = zero
            acc_o = zero
            for t in range(5):
                for s in range(4):
                    if even_t[t][s] == code:
                        acc_e = acc_e + cs[s][t]
                    if odd_t[t][s] == code:
                        acc_o = acc_o + cs[s][t]
            per_corner.append(jnp.where(P, acc_e, acc_o))
        return _scatter(per_corner)

    def asm_equal(v):
        """asm() when all 4 slots carry the same per-element value."""
        per_corner = []
        zero = jnp.zeros((nzc, nyc, nxc), dtype=v.dtype)
        for code in range(8):
            acc_e = zero
            acc_o = zero
            for t in range(5):
                if code in even_t[t]:
                    acc_e = acc_e + v[t]
                if code in odd_t[t]:
                    acc_o = acc_o + v[t]
            per_corner.append(jnp.where(P, acc_e, acc_o))
        return _scatter(per_corner)

    def volume_of(xs, ys, zs):
        """Tet volume (geometry.cxx:135-200)."""
        d1 = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
        d2 = (xs[2] - xs[0], ys[2] - ys[0], zs[2] - zs[0])
        d3 = (xs[3] - xs[0], ys[3] - ys[0], zs[3] - zs[0])
        return (d1[0] * (d2[1] * d3[2] - d2[2] * d3[1])
                + d1[1] * (d2[2] * d3[0] - d2[0] * d3[2])
                + d1[2] * (d2[0] * d3[1] - d2[1] * d3[0])) / 6.0

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

    def compute_dt_planes(xs, ys, zs, vol, vslots, shearm, rho_e):
        """CFL dt (geometry.cxx:756-923) on planes."""
        dtype = vol.dtype
        big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)
        # element-mean velocity magnitude
        vxm = sum(vslots[s][0] for s in range(4)) / npe
        vym = sum(vslots[s][1] for s in range(4)) / npe
        vzm = sum(vslots[s][2] for s in range(4)) / npe
        vmag = jnp.sqrt(vxm * vxm + vym * vym + vzm * vzm)
        vmax = jnp.maximum(vmag.max(), max_vbc_val)
        if ctrl.fixed_dt != 0.0:
            fdt = jnp.asarray(ctrl.fixed_dt, dtype=dtype)
            return fdt, vmax, fdt
        minh = min_height(xs, ys, zs, vol)
        minl = minh.min()
        dt_maxwell = (0.5 * visc_min / (1e-40 + shearm)).min()
        dt_diffusion = (0.5 * minh * minh / therm_diff_max).min() \
            if ctrl.has_thermal_diffusion else big
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
        dt = jnp.minimum(jnp.minimum(dt_elastic, dt_maxwell),
                         jnp.minimum(dt_advection, dt_diffusion)) \
            * ctrl.dt_fraction
        return dt, vmax, gdtmin

    def update_stress_planes(tab, s, de, edot, sr, bulkm, shearm,
                             temp_e, dt):
        """Constitutive switch (rheology.cxx:676-991), 3D componentwise."""
        stress = tuple(s.stress[i] for i in range(6))
        old_tr = stress[0] + stress[1] + stress[2]
        stressyy = s.stressyy  # unused in 3D, carried through
        plstrain, delta_plstrain = s.plstrain, s.delta_plstrain
        viscosity = s.viscosity

        def inv2(t):
            a = (t[0] + t[1] + t[2]) / 3.0
            return (0.5 * ((t[0] - a) ** 2 + (t[1] - a) ** 2
                           + (t[2] - a) ** 2)
                    + t[3] ** 2 + t[4] ** 2 + t[5] ** 2)

        def creep_visc():
            s0 = (stress[0] + stress[1] + stress[2]) / 3.0
            edot_inv = jnp.maximum(jnp.sqrt(inv2(sr)), MIN_STRAIN_RATE)
            return M.visc_core(tab, s.emw, temp_e, s0, edot_inv)

        if rheol == RH_ELASTIC:
            stress = R.elastic3_c(bulkm, shearm, de, stress)
        elif rheol == RH_VISCOUS:
            viscosity = creep_visc()
            strain_new = tuple(s.strain[i] + de[i] for i in range(6))
            total_dv = strain_new[0] + strain_new[1] + strain_new[2]
            stress = R.viscous3_c(bulkm, viscosity, total_dv, edot)
        elif rheol == RH_MAXWELL:
            viscosity = creep_visc()
            dv = s.volume / s.volume_old - 1.0
            stress = R.maxwell3_c(bulkm, shearm, viscosity, dt, dv,
                                  de, stress)
        elif rheol == RH_EP:
            amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                tab, s.emw, s.plstrain)
            stress, depls, _ = R.elasto_plastic3_c(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, stress)
            plstrain = s.plstrain + depls
            delta_plstrain = depls
        elif rheol == RH_EVP:
            viscosity = creep_visc()
            dv = s.volume / s.volume_old - 1.0
            sv = R.maxwell3_c(bulkm, shearm, viscosity, dt, dv, de,
                              stress)
            amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                tab, s.emw, s.plstrain)
            sp, depls, _ = R.elasto_plastic3_c(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, stress)
            use_v = inv2(sv) < inv2(sp)
            stress = tuple(jnp.where(use_v, a, b) for a, b in zip(sv, sp))
            plstrain = jnp.where(use_v, s.plstrain, s.plstrain + depls)
            delta_plstrain = jnp.where(use_v, s.delta_plstrain, depls)
        else:  # pragma: no cover - gated
            raise ValueError(f"grid3d: unsupported rheology {rheol}")
        if ctrl.is_using_mixed_stress:
            dpressure = stress[0] + stress[1] + stress[2] - old_tr
        else:
            dpressure = s.dpressure
        return (stress, stressyy, plstrain, delta_plstrain, viscosity,
                dpressure)

    def step(ctx, s):
        tab = ctx.mat
        dt = s.dt
        steps = s.steps + 1
        time = s.time + s.dt

        xs = gather(s.coord[:, 0])
        ys = gather(s.coord[:, 1])
        zs = gather(s.coord[:, 2])
        vxs = gather(s.vel[:, 0])
        vys = gather(s.vel[:, 1])
        vzs = gather(s.vel[:, 2])
        ts = gather(s.temperature)

        vol = s.volume
        dndx, dndy, dndz = shape_fn(xs, ys, zs, vol)
        temp_e = (ts[0] + ts[1] + ts[2] + ts[3]) / npe
        bulkm = M.bulkm(tab, s.emw)
        shearm = M.shearm(tab, s.emw)
        rho_e = M.rho_from_T(tab, s.emw, temp_e)

        temperature = s.temperature
        if ctrl.has_thermal_diffusion:
            kappa = M.therm_cond(tab, s.emw)
            source = s.radiogenic_source * vol * rho_e / npe
            kv = kappa * vol
            gx = sum(dndx[i] * ts[i] for i in range(4))
            gy = sum(dndy[i] * ts[i] for i in range(4))
            gz = sum(dndz[i] * ts[i] for i in range(4))
            contrib = tuple(kv * (dndx[i] * gx + dndy[i] * gy
                                  + dndz[i] * gz) - source
                            for i in range(4))
            tdot = asm(*contrib)
            temperature = jnp.where(
                ctx.top_mask, param.bc.surface_temperature,
                s.temperature - s.dt * tdot / s.tmass)

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

        # dvoldt/edvoldt anti-locking (geometry.cxx:202-276)
        etmp = (lxx + lyy + lzz) * vol
        dvoldt = asm_equal(etmp) / s.volume_n
        dvs = gather(dvoldt)
        edvoldt = (dvs[0] + dvs[1] + dvs[2] + dvs[3]) / npe

        adj = (edvoldt - (lxx + lyy + lzz)) / 3.0
        edot = (lxx + adj, lyy + adj, lzz + adj, lxy, lxz, lyz)
        de = tuple(edot[i] * dt for i in range(6))
        strain = jnp.stack([s.strain[i] + de[i] for i in range(6)])
        strain_rate = jnp.stack(edot)

        s_mid = dataclasses.replace(s, edvoldt=edvoldt)
        (stress_c, stressyy, plstrain, delta_plstrain, viscosity,
         dpressure) = update_stress_planes(tab, s_mid, de, edot, sr,
                                           bulkm, shearm, temp_e, dt)

        if ctrl.is_using_mixed_stress:
            dp_nd = asm_equal(dpressure * vol) / s.volume_n
            dps = gather(dp_nd)
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
        fx = tuple((stress_c[0] * dndx[i] + stress_c[3] * dndy[i]
                    + stress_c[4] * dndz[i]) * vol for i in range(4))
        fy = tuple((stress_c[3] * dndx[i] + stress_c[1] * dndy[i]
                    + stress_c[5] * dndz[i]) * vol for i in range(4))
        fz = tuple((stress_c[4] * dndx[i] + stress_c[5] * dndy[i]
                    + stress_c[2] * dndz[i] + buoy) * vol
                   for i in range(4))
        force = jnp.stack([-asm(*fx), -asm(*fy), -asm(*fz)], axis=1)
        l2_res = F.residual_l2(force)

        rho_eff = rho_e
        if ctrl.gravity != 0:
            rho_flat = rho_eff.transpose(3, 2, 1, 0).reshape(-1)
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
        vys2 = gather(vel[:, 1])
        vzs2 = gather(vel[:, 2])
        dhacc, edvacc_surf = s.dhacc, s.edvacc_surf
        if ctrl.has_moving_mesh:
            coord = F.update_coordinate(s.coord, vel, s.dt)
            if ctrl.surface_process_option != 0 and ctx.surf.etop > 0:
                # in-step surface processes (surface_processes,
                # bc.cxx:1667-1831), same call the generic/flat steps
                # make; the top plane moved, so re-gather coordinates
                coord, dhacc, edvacc_surf, _dh = \
                    SP.apply_surface_processes(param, ctx.surf, coord,
                                               s.dt, dhacc, edvacc_surf)
                xs2 = gather(coord[:, 0])
                ys2 = gather(coord[:, 1])
                zs2 = gather(coord[:, 2])
            else:
                xs2 = tuple(xs[i] + vxs2[i] * s.dt for i in range(4))
                ys2 = tuple(ys[i] + vys2[i] * s.dt for i in range(4))
                zs2 = tuple(zs[i] + vzs2[i] * s.dt for i in range(4))
            volume_old = vol
            volume = volume_of(xs2, ys2, zs2)
            # correct_surface_element (bc.cxx:1613-1665), active even with
            # surface_process_option 0: every tet touching a top node (all
            # 5 parities of the z-cell row -1) is rescaled by 1/rdv when
            # it grew, and its pre-swap volume overwritten so the next
            # step's maxwell dv is zero for surface elements.  (The
            # surface plstrain decay is 2D only, bc.cxx:1805-1810.)
            # Scaling before the Jaumann rotation below matches the
            # reference order: the rotation is linear in its tensor.
            if ctrl.has_surface_correction:
                rdv = volume[:, -1] / vol[:, -1]
                tscale = jnp.where(rdv >= 1.0, 1.0 / rdv, 1.0)
                stress = stress.at[:, :, -1].multiply(tscale)
                strain = strain.at[:, :, -1].multiply(tscale)
                strain_rate = strain_rate.at[:, :, -1].multiply(tscale)
                plstrain = plstrain.at[:, -1].multiply(tscale)
                volume_old = vol.at[:, -1].set(volume[:, -1])
        else:
            coord, volume_old, volume = s.coord, s.volume_old, vol
            xs2, ys2, zs2 = xs, ys, zs

        vslots2 = tuple((vxs2[i], vys2[i], vzs2[i]) for i in range(4))
        dt_new, vmax, gdtmin = compute_dt_planes(
            xs2, ys2, zs2, volume, vslots2, shearm, rho_e)
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
            delta_plstrain=delta_plstrain, viscosity=viscosity,
            dpressure=dpressure, edvoldt=edvoldt, stress_avg=stress_avg,
            delta_plstrain_avg=dpls_avg, coord_avg0=coord_avg0,
            strain_avg0=strain_avg0, time_avg0=time_avg0,
            time=time, dt=dt_out, steps=steps, max_global_vel_mag=vmax,
            global_dt_min=gdtmin, l2_residual=l2_res)

    return step
