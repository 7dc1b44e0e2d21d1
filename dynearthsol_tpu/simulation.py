"""Simulation driver: init + the jitted time-step loop.

The reference integrates with an explicit do-while loop calling ~12 kernels
per step (dynearthsol.cxx:746-956).  Here the WHOLE step is one traced
function; the driver runs it inside ``lax.scan`` chunks so that thousands of
steps execute on-device per host round-trip — the single most important
performance decision for TPU (step count is 1e4-1e7, SURVEY §3.2).

Step sequence (matching dynearthsol.cxx:746-956):
  update_temperature -> [update_old_mean_stress] -> update_strain_rate ->
  compute_dvoldt/edvoldt -> update_stress -> [NMD_stress] -> update_force
  (+stress bcs, damping) -> update_velocity -> residual -> [pore pressure]
  -> apply_vbcs -> update_mesh (coord, volume swap, mass) -> rotate_stress
  -> every-10-step dt refresh.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import bc as bc_mod
from . import ic as ic_mod
from . import markers as mk
from .config import (RH_ELASTIC, RH_EP, RH_EVP, RH_EP_RSF, RH_EVP_RSF,
                     RH_MAXWELL, RH_VISCOUS, Param)
from .constants import BOUNDZ1
from .mesh import build_topology, create_new_mesh
from .ops import fields as F
from .ops import geometry as G
from .ops import matprops as M
from .ops import rheology as R
from .ops import surface as SP
from .ops.assembly import node_sum
from .ops.shapefn import compute_volume, shape_fn_gradients

# one shared jit object: every init/restart/remesh/surface-dh call reuses
# the same compiled program per shape signature (one tunnel compile each)
jit_compute_volume = jax.jit(compute_volume)
from .ops.tensor import second_invariant2, trace
from .state import State, allocate_state


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["conn", "gather_idx", "gather_mask", "elem_mask",
                 "top_mask", "pp_bc_mask", "vbc", "sbc", "mat", "surf",
                 "halo", "band"],
    meta_fields=["ndims", "nnode", "nelem", "max_vbc_val", "axis", "sgrid"])
@dataclass(frozen=True)
class StepCtx:
    """Per-mesh context for the step function.

    The large topology arrays are pytree *data* so they are passed as jit
    arguments (device-resident buffers) rather than baked into the XLA
    program as constants — embedding 1M-element index arrays as literals
    makes compilation pathologically slow.  Everything hashable stays
    static metadata.
    """

    ndims: int
    nnode: int
    nelem: int
    conn: jnp.ndarray
    gather_idx: jnp.ndarray
    gather_mask: jnp.ndarray
    elem_mask: jnp.ndarray  # 1 for real elements, 0 for shard padding
    top_mask: jnp.ndarray  # BOUNDZ1 nodes (Dirichlet T)
    pp_bc_mask: jnp.ndarray  # Dirichlet pore-pressure nodes
    vbc: bc_mod.VBCSpec
    sbc: bc_mod.StressBCSpec
    mat: M.MatTables
    surf: SP.SurfInfo
    max_vbc_val: float
    axis: Optional[str] = None  # shard_map element-axis name, else None
    # (nx, nz) when the mesh is a raster structured grid: element<->node
    # transfers then run as stencil slices instead of gathers (structured.py)
    sgrid: Optional[tuple] = None
    # node-window halo spec (ops/assembly.HaloSpec) when nodal state is
    # sharded across devices (parallel/halo_step.py); None = replicated
    halo: Optional[object] = None
    # banded gather/assembly tables (ops/band2d.BandTables) — attached
    # lazily by _chunk_fn when the flat SoA path is selected on a
    # band-friendly mesh; the flat step then routes its corner gathers
    # and assemblies through the supernode-window MXU engine (f32 only)
    band: Optional[object] = None


def _dev(x, dtype) -> jnp.ndarray:
    """Host-side dtype convert + device_put.  ``jnp.asarray(x, dtype=...)``
    on a mismatched-dtype numpy array dispatches an eager
    convert_element_type — a ~0.4-6 s server-side compile per distinct
    shape on the tunneled TPU backend.  Converting in numpy first makes
    the transfer a pure (compile-free) device_put."""
    return jnp.asarray(np.asarray(x, dtype=jnp.dtype(dtype)))


def _elem_props(ctx: StepCtx, s: State):
    """Per-element material properties from the (marker) weights."""
    bulkm = M.bulkm(ctx.mat, s.emw)
    shearm = M.shearm(ctx.mat, s.emw)
    rho = M.rho(ctx.mat, s.emw, s.temperature, ctx.conn)
    return bulkm, shearm, rho


def _update_stress(param: Param, ctx: StepCtx, s: State, bulkm, shearm,
                   strain_rate, temp_e=None, vel_e=None):
    """Anti-locking fix + constitutive switch (rheology.cxx:676-991).

    Returns (stress, stressyy, strain, strain_rate_mod, plstrain,
    delta_plstrain, viscosity, dpressure).
    """
    ndims = ctx.ndims
    rheol = param.mat.rheol_type
    is_rsf = rheol in (RH_EP_RSF, RH_EVP_RSF)
    dt = s.dt

    # anti-mesh-locking correction on strain rate (rheology.cxx:755-763)
    div = trace(strain_rate)
    edot = strain_rate.at[:, :ndims].add(
        ((s.edvoldt - div) / ndims)[:, None])

    strain = s.strain + edot * dt
    de = edot * dt

    old_tr = trace(s.stress)
    stress, stressyy = s.stress, s.stressyy
    plstrain, delta_plstrain = s.plstrain, s.delta_plstrain
    viscosity = s.viscosity
    dyn_fric_coeff, state_variable = s.dyn_fric_coeff, s.state_variable

    if param.control.has_hydraulic_diffusion:
        # Biot-scaled element-mean pore-pressure increment
        # (rheology.cxx:696-755): added to the diagonal of the trial stress
        alpha_b = M.alpha_biot(ctx.mat, s.emw)
        from .ops.structured import make_corner_gather as _mcg
        dpp = alpha_b * _mcg(ctx)(s.dppressure).mean(axis=1)
    else:
        dpp = None

    if is_rsf:
        # slip rate from pre-update stress and element-mean velocity
        # (rheology.cxx:882-914), then RSF friction + state evolution
        vmean = (vel_e if vel_e is not None
                 else s.vel[ctx.conn]).mean(axis=1)
        if ndims == 2:
            slip = R.slip_rate2(s.stress, vmean)
        else:
            slip = R.slip_rate3(s.stress, vmean)
        (amc_r, anphi_r, anpsi_r, hardn_r, ten_max_r, dyn_fric_coeff,
         state_variable) = M.plastic_props_rsf(
            ctx.mat, s.emw, s.plstrain, slip, s.state_variable, dt,
            param.mat.state_var_model)

    t_src = temp_e if temp_e is not None else s.temperature
    t_conn = None if temp_e is not None else ctx.conn
    if rheol == RH_ELASTIC:
        stress = R.elastic(bulkm, shearm, de, s.stress, dpp)
    elif rheol == RH_VISCOUS:
        viscosity = M.visc(ctx.mat, s.emw, t_src, t_conn,
                           s.stress, strain_rate)
        total_dv = trace(strain)
        stress = R.viscous(bulkm, viscosity, total_dv, edot, s.stress)
    elif rheol == RH_MAXWELL:
        viscosity = M.visc(ctx.mat, s.emw, t_src, t_conn,
                           s.stress, strain_rate)
        dv = s.volume / s.volume_old - 1.0
        stress = R.maxwell(bulkm, shearm, viscosity, dt, dv, de, s.stress)
    elif rheol in (RH_EP, RH_EP_RSF):
        if is_rsf:
            amc, anphi, anpsi = amc_r, anphi_r, anpsi_r
            hardn, ten_max = hardn_r, ten_max_r
        else:
            amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                ctx.mat, s.emw, s.plstrain)
        if param.mat.is_plane_strain and ndims == 2:
            stress, stressyy, depls, _ = R.elasto_plastic2d(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, s.stress, s.stressyy, dpp)
        else:
            stress, depls, _ = R.elasto_plastic(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, s.stress, dpp)
        plstrain = s.plstrain + depls
        delta_plstrain = depls
    elif rheol in (RH_EVP, RH_EVP_RSF):
        viscosity = M.visc(ctx.mat, s.emw, t_src, t_conn,
                           s.stress, strain_rate)
        dv = s.volume / s.volume_old - 1.0
        sv = R.maxwell(bulkm, shearm, viscosity, dt, dv, de, s.stress)
        svII = second_invariant2(sv)
        if is_rsf:
            amc, anphi, anpsi = amc_r, anphi_r, anpsi_r
            hardn, ten_max = hardn_r, ten_max_r
        else:
            amc, anphi, anpsi, hardn, ten_max = M.plastic_props(
                ctx.mat, s.emw, s.plstrain)
        if param.mat.is_plane_strain and ndims == 2:
            sp, spyy, depls, _ = R.elasto_plastic2d(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, s.stress, s.stressyy, dpp)
        else:
            sp, depls, _ = R.elasto_plastic(
                bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                de, s.stress, dpp)
            spyy = s.stressyy
        spII = second_invariant2(sp)
        # min-magnitude selection (rheology.cxx:869-879)
        use_v = svII < spII
        stress = jnp.where(use_v[:, None], sv, sp)
        stressyy = jnp.where(use_v, s.stressyy, spyy)
        plstrain = jnp.where(use_v, s.plstrain, s.plstrain + depls)
        delta_plstrain = jnp.where(use_v, s.delta_plstrain, depls)
    else:
        raise ValueError(f"unknown rheol_type {rheol}")

    if param.control.is_using_mixed_stress:
        dpressure = trace(stress) - old_tr
    else:
        dpressure = s.dpressure
    return (stress, stressyy, strain, edot, plstrain, delta_plstrain,
            viscosity, dpressure, dyn_fric_coeff, state_variable)


def make_step_fn(param: Param, compensation_pressure: float = 0.0):
    """Build the single-time-step transition function step(ctx, state).

    ``ctx`` is a pytree argument (not a closure) so its large index arrays
    stay device buffers instead of XLA constants.
    """
    ctrl = param.control
    param_compensation_pressure = compensation_pressure

    def step(ctx: StepCtx, s: State) -> State:
        from .ops.assembly import make_asm
        from .ops.structured import make_corner_gather

        asm = make_asm(ctx)
        gather = make_corner_gather(ctx)
        ndims = ctx.ndims
        npe = ndims + 1
        pseudo_speed = ctx.max_vbc_val * ctrl.inertial_scaling
        steps = s.steps + 1
        time = s.time + s.dt

        # ONE consolidated nodal->corner-slot gather per step: TPU gathers
        # are latency-bound, so coord/vel/T ride a single (nelem,npe,2d+1)
        # lookup instead of ~10 separate x[conn] gathers (the reference
        # re-derives shape functions 4x per step instead, SURVEY §7.1)
        from .ops.shapefn import compute_volume_slots, \
            shape_fn_gradients_slots

        nodal_pack = jnp.concatenate(
            [s.coord, s.vel, s.temperature[:, None]], axis=1)
        slots = gather(nodal_pack)            # (nelem, npe, 2*ndims+1)
        coord_e = slots[..., :ndims]
        vel_e = slots[..., ndims:2 * ndims]
        temp_e = slots[..., 2 * ndims]

        dnd = shape_fn_gradients_slots(coord_e, s.volume)
        bulkm = M.bulkm(ctx.mat, s.emw)
        shearm = M.shearm(ctx.mat, s.emw)
        rho_e = M.rho(ctx.mat, s.emw, temp_e, None)

        temperature = s.temperature
        if ctrl.has_thermal_diffusion:
            kappa = M.therm_cond(ctx.mat, s.emw)
            source = s.radiogenic_source * s.volume * rho_e / npe
            temperature = F.update_temperature(
                s.temperature, ctx.conn, dnd, s.volume, kappa, source,
                s.tmass, s.dt, ctx.top_mask, param.bc.surface_temperature,
                asm, t_slots=temp_e)

        old_mean_stress = s.old_mean_stress
        if ctrl.has_hydraulic_diffusion:
            old_mean_stress = trace(s.stress) / ndims

        strain_rate = F.update_strain_rate(vel_e, None, dnd)
        dvoldt = G.compute_dvoldt(strain_rate, s.volume, s.volume_n,
                                  ctx.conn, asm)
        edvoldt = gather(dvoldt).mean(axis=1)
        s1 = State(**{**s.__dict__, "edvoldt": edvoldt, "dt": s.dt,
                      "temperature": temperature,
                      "old_mean_stress": old_mean_stress})

        (stress, stressyy, strain, strain_rate, plstrain, delta_plstrain,
         viscosity, dpressure, dyn_fric_coeff, state_variable) = \
            _update_stress(param, ctx, s1, bulkm, shearm, strain_rate,
                           temp_e=temp_e, vel_e=vel_e)

        if ctrl.is_using_mixed_stress:
            stress = G.nmd_stress(stress, dpressure, s.volume, s.volume_n,
                                  ctx.conn, asm, gather=gather)

        # force assembly (fields.cxx:612-703)
        phi_e = M.phi_porosity(ctx.mat, s.emw)
        if ctrl.gravity != 0:
            buoy = (rho_e * (1.0 - phi_e) + 1000.0 * phi_e) \
                * ctrl.gravity / npe
        else:
            buoy = jnp.zeros_like(s.volume)
        contrib = F.internal_force_contrib(stress, s.volume, dnd, buoy)
        force = F.assemble_force(contrib, asm)
        l2_res = F.residual_l2(
            force, ctx.halo.own_mask if ctx.halo is not None else None,
            ctx.axis if ctx.halo is not None else None)
        # under the halo-sharded step, facet tables are per-shard subsets:
        # facet scatters go through a second overlap exchange so window
        # rows stay complete and bit-identical across copies
        if ctx.halo is not None:
            from .ops.assembly import halo_overlap_add

            def hx(buf, _ctx=ctx):
                return halo_overlap_add(buf, _ctx.axis, _ctx.halo)
        else:
            hx = None
        # boundary tractions (bc.cxx:632-875)
        if ctrl.has_hydraulic_diffusion:
            rho_eff = rho_e * (1.0 - phi_e) + 1000.0 * phi_e
        else:
            rho_eff = rho_e
        if ctrl.gravity != 0:
            force = bc_mod.apply_stress_bcs(
                param, ctx.sbc, s.coord, force, rho_eff,
                param_compensation_pressure, s.coord0, halo_exchange=hx)
        force = bc_mod.apply_stress_bcs_neumann(ctx.sbc, s.coord, force,
                                                halo_exchange=hx)
        force = F.apply_damping(force, s.vel, s.mass, s.ymass,
                                ctrl.damping_option, ctrl.damping_factor)

        vel = F.update_velocity(s.vel, force, s.mass, s.dt)

        # pseudo-transient inner relaxation (dynearthsol.cxx:779-840):
        # iterate quasi-static force balance with ZEROED boundary
        # velocities (PT_jump, bc.cxx:305-317) until the residual stalls
        if ctrl.has_PT:
            import dataclasses as _dc

            vbc0 = _dc.replace(ctx.vbc, values=(0.0,) * 6,
                               values_lateral=(0.0,) * 4)
            # hydraulic diffusion is suspended inside the PT loop
            # (dynearthsol.cxx:781-784,838): the dppressure stress
            # increment is a PER-OUTER-STEP term; re-adding it each
            # inner iteration compounds it PT_max_iter times and
            # diverges (the consolidation benchmarks hit this)
            param_pt = _dc.replace(
                param, control=_dc.replace(
                    param.control, has_hydraulic_diffusion=False)) \
                if ctrl.has_hydraulic_diffusion else param
            s_mid = State(**{
                **s.__dict__, "vel": vel, "stress": stress,
                "stressyy": stressyy, "strain": strain,
                "strain_rate": strain_rate, "plstrain": plstrain,
                "delta_plstrain": delta_plstrain, "viscosity": viscosity,
                "dpressure": dpressure, "dyn_fric_coeff": dyn_fric_coeff,
                "state_variable": state_variable, "edvoldt": edvoldt,
                "temperature": temperature, "l2_residual": l2_res,
                "time": time, "steps": steps})

            temp_e_pt = gather(s_mid.temperature)  # PT-loop invariant

            def pt_body(carry):
                sc, res_old, _, k = carry
                velp = bc_mod.apply_vbcs(vbc0, sc.vel, sc.coord, sc.time)
                vp_e = gather(velp)
                if ctrl.has_moving_mesh:
                    coordp = F.update_coordinate(sc.coord, velp, sc.dt)
                    cp_e = gather(coordp)
                    volp_old = sc.volume
                    volp = compute_volume_slots(cp_e)
                    if ctx.axis is not None:
                        volp = jnp.where(ctx.elem_mask > 0, volp, 1.0)
                    voln_p, mass_p, tmass_p, hmass_p, ymass_p = \
                        G.compute_mass(
                            volp, ctx.conn, bulkm, shearm, rho_e,
                            M.cp(ctx.mat, sc.emw), phi_e,
                            M.alpha_biot(ctx.mat, sc.emw),
                            M.beta_fluid(ctx.mat, sc.emw), asm,
                            pseudo_speed=pseudo_speed,
                            pseudo_speed_atp=sc.max_global_vel_mag
                            * ctrl.inertial_scaling,
                            is_quasi_static=ctrl.is_quasi_static,
                            use_global_velocity_scaling=(
                                ctrl.use_global_velocity_scaling),
                            has_hydraulic_diffusion=False,
                            has_thermal_diffusion=(
                                ctrl.has_thermal_diffusion),
                            ndims=ndims)
                else:
                    coordp, volp_old, volp = sc.coord, sc.volume_old, \
                        sc.volume
                    cp_e = gather(coordp)
                    voln_p, mass_p, tmass_p, hmass_p, ymass_p = (
                        sc.volume_n, sc.mass, sc.tmass, sc.hmass, sc.ymass)
                dndp = shape_fn_gradients_slots(cp_e, volp)
                srp = F.update_strain_rate(vp_e, None, dndp)
                dvp = G.compute_dvoldt(srp, volp, voln_p, ctx.conn, asm)
                edvp = gather(dvp).mean(axis=1)
                s1p = State(**{**sc.__dict__, "vel": velp, "coord": coordp,
                               "volume": volp, "volume_old": volp_old,
                               "volume_n": voln_p, "mass": mass_p,
                               "tmass": tmass_p, "hmass": hmass_p,
                               "ymass": ymass_p, "edvoldt": edvp})
                (stp, syyp, stnp, srp2, plsp, dplsp, viscp, dprp, dfcp,
                 svp) = _update_stress(param_pt, ctx, s1p, bulkm, shearm,
                                       srp, temp_e=temp_e_pt, vel_e=vp_e)
                contribp = F.internal_force_contrib(stp, volp, dndp, buoy)
                forcep = F.assemble_force(contribp, asm)
                resp = F.residual_l2(
                    forcep,
                    ctx.halo.own_mask if ctx.halo is not None else None,
                    ctx.axis if ctx.halo is not None else None)
                if ctrl.gravity != 0:
                    forcep = bc_mod.apply_stress_bcs(
                        param, ctx.sbc, coordp, forcep, rho_eff,
                        param_compensation_pressure, sc.coord0,
                        halo_exchange=hx)
                forcep = bc_mod.apply_stress_bcs_neumann(
                    ctx.sbc, coordp, forcep, halo_exchange=hx)
                forcep = F.apply_damping(forcep, velp, mass_p, ymass_p,
                                         ctrl.damping_option,
                                         ctrl.damping_factor)
                velq = F.update_velocity(velp, forcep, mass_p, sc.dt)
                rel = jnp.abs((resp - res_old)
                              / jnp.where(res_old != 0, res_old, 1.0))
                s2p = State(**{**s1p.__dict__, "stress": stp,
                               "stressyy": syyp, "strain": stnp,
                               "strain_rate": srp2, "plstrain": plsp,
                               "delta_plstrain": dplsp, "viscosity": viscp,
                               "dpressure": dprp, "dyn_fric_coeff": dfcp,
                               "state_variable": svp, "vel": velq,
                               "force": forcep, "l2_residual": resp})
                return (s2p, resp, rel, k + 1)

            def pt_cond(carry):
                _, _, rel, k = carry
                return ((k < ctrl.PT_max_iter)
                        & (rel >= ctrl.PT_relative_tolerance))

            s_pt, _, _, _ = jax.lax.while_loop(
                pt_cond, pt_body, (s_mid, l2_res, jnp.asarray(
                    1.0, dtype=l2_res.dtype), 0))
            (stress, stressyy, strain, strain_rate, plstrain,
             delta_plstrain, viscosity, dpressure, dyn_fric_coeff,
             state_variable) = (
                s_pt.stress, s_pt.stressyy, s_pt.strain, s_pt.strain_rate,
                s_pt.plstrain, s_pt.delta_plstrain, s_pt.viscosity,
                s_pt.dpressure, s_pt.dyn_fric_coeff, s_pt.state_variable)
            vel, force, l2_res = s_pt.vel, s_pt.force, s_pt.l2_residual
            edvoldt = s_pt.edvoldt
            s = State(**{**s.__dict__, "coord": s_pt.coord,
                         "volume": s_pt.volume,
                         "volume_old": s_pt.volume_old,
                         "volume_n": s_pt.volume_n, "mass": s_pt.mass,
                         "tmass": s_pt.tmass, "hmass": s_pt.hmass,
                         "ymass": s_pt.ymass})

        # pore-pressure diffusion (fields.cxx:297-406), after velocity and
        # before vbcs like the reference loop (dynearthsol.cxx:842-850)
        ppressure, dppressure = s.ppressure, s.dppressure
        hydro_diff_max = s.hydro_diff_max
        if ctrl.has_hydraulic_diffusion:
            ppressure, dppressure, hydro_diff_max = F.update_pore_pressure(
                s.ppressure, s.dppressure, s.coord, ctx.conn, dnd, s.volume,
                stress, old_mean_stress, s.hmass, s.dt, ctrl.gravity,
                M.perm(ctx.mat, s.emw), M.mu_fluid(ctx.mat, s.emw),
                M.alpha_biot(ctx.mat, s.emw), M.phi_porosity(ctx.mat, s.emw),
                M.beta_fluid(ctx.mat, s.emw), bulkm, shearm,
                ctx.pp_bc_mask, asm, axis_name=ctx.axis)

        vel = bc_mod.apply_vbcs(ctx.vbc, vel, s.coord, time)

        # update_mesh (dynearthsol.cxx:431-473)
        dhacc, edvacc_surf = s.dhacc, s.edvacc_surf
        vel2_e = gather(vel)  # post-vbc velocities at corner slots
        if ctrl.has_moving_mesh:
            coord = F.update_coordinate(s.coord, vel, s.dt)
            coord2_e = coord_e + vel2_e * s.dt
            if ctrl.surface_process_option != 0 and ctx.surf.etop > 0:
                coord, dhacc, edvacc_surf, _dh = SP.apply_surface_processes(
                    param, ctx.surf, coord, s.dt, dhacc, edvacc_surf,
                    halo_exchange=hx)
                coord2_e = gather(coord)  # surface moved some nodes
            volume_old = s.volume
            volume = compute_volume_slots(coord2_e)
            if ctx.axis is not None:
                volume = jnp.where(ctx.elem_mask > 0, volume, 1.0)
            # correct_surface_element runs for EVERY surface-processed step,
            # including surface_process_option 0 (bc.cxx:1788 call site in
            # the surface_processes dispatcher); volume_old picks up the
            # pre-swap volume mutation (bc.cxx:1634)
            if ctx.surf.etop > 0 and ctrl.has_surface_correction:
                (stress, strain, strain_rate, plstrain, volume_old) = \
                    SP.correct_surface_elements(ctx.surf, volume, s.volume,
                                                stress, strain, strain_rate,
                                                plstrain)
                if ndims == 2:  # 2D only (bc.cxx:1805-1810 #ifdef THREED)
                    qcsi = param.mesh.quality_check_step_interval
                    plstrain = SP.surface_plstrain_decay(
                        ctx.surf, plstrain, s.emw, s.dt,
                        param.mat.mattype_oceanic_crust,
                        apply=(steps % qcsi) == 0)
        else:
            coord, volume_old, volume = s.coord, s.volume_old, s.volume
            coord2_e = coord_e

        # CFL dt (geometry.cxx:756-923), refreshed every 10 steps
        # (dynearthsol.cxx:861-871)
        dt_new, vmax, gdtmin = G.compute_dt(
            coord2_e, None, volume, vel2_e, shearm, rho_e,
            ctx.mat.visc_min, ctx.mat.therm_diff_max, s.hydro_diff_max,
            ctx.max_vbc_val,
            fixed_dt=ctrl.fixed_dt, dt_fraction=ctrl.dt_fraction,
            inertial_scaling=ctrl.inertial_scaling,
            is_quasi_static=ctrl.is_quasi_static,
            has_thermal_diffusion=ctrl.has_thermal_diffusion,
            has_hydraulic_diffusion=ctrl.has_hydraulic_diffusion,
            use_global_velocity_scaling=ctrl.use_global_velocity_scaling,
            bulk_modulus_ref=param.mat.bulk_modulus[param.mat.mattype_ref],
            rho0_ref=param.mat.rho0[param.mat.mattype_ref],
            axis_name=ctx.axis, elem_mask=ctx.elem_mask)
        refresh = (steps % 10 == 0) | ctrl.use_global_velocity_scaling
        dt = jnp.where(refresh, dt_new, s.dt)

        if ctrl.has_moving_mesh:
            pseudo_atp = vmax * ctrl.inertial_scaling
            phi_e = M.phi_porosity(ctx.mat, s.emw)
            ab_e = M.alpha_biot(ctx.mat, s.emw)
            bf_e = M.beta_fluid(ctx.mat, s.emw)
            cp_e = M.cp(ctx.mat, s.emw)
            volume_n, mass, tmass, hmass, ymass = G.compute_mass(
                volume, ctx.conn, bulkm, shearm, rho_e, cp_e, phi_e, ab_e,
                bf_e, asm,
                pseudo_speed=pseudo_speed, pseudo_speed_atp=pseudo_atp,
                is_quasi_static=ctrl.is_quasi_static,
                use_global_velocity_scaling=ctrl.use_global_velocity_scaling,
                has_hydraulic_diffusion=ctrl.has_hydraulic_diffusion,
                has_thermal_diffusion=ctrl.has_thermal_diffusion,
                ndims=ndims)
        else:
            volume_n, mass, tmass, hmass, ymass = (
                s.volume_n, s.mass, s.tmass, s.hmass, s.ymass)

        # Jaumann rotation with post-move geometry (dynearthsol.cxx:853-855)
        if param.mat.rheol_type & RH_ELASTIC:
            dnd2 = shape_fn_gradients_slots(coord2_e, volume)
            stress, strain = F.rotate_stress(stress, strain, vel2_e, None,
                                             dnd2, s.dt)

        # averaged-output accumulators (output.cxx:300-340 average_fields):
        # reset at steps % interval == 1, accumulate otherwise
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

        return State(
            dhacc=dhacc, edvacc_surf=edvacc_surf,
            stress_avg=stress_avg, delta_plstrain_avg=dpls_avg,
            coord_avg0=coord_avg0, strain_avg0=strain_avg0,
            time_avg0=time_avg0,
            coord=coord, coord0=s.coord0, vel=vel, temperature=temperature,
            ppressure=ppressure, dppressure=dppressure,
            volume_n=volume_n, mass=mass, tmass=tmass, hmass=hmass,
            ymass=ymass, force=force, volume=volume, volume_old=volume_old,
            stress=stress, stressyy=stressyy,
            old_mean_stress=old_mean_stress, strain=strain,
            strain_rate=strain_rate, plstrain=plstrain,
            delta_plstrain=delta_plstrain, viscosity=viscosity,
            dpressure=dpressure, edvoldt=edvoldt,
            radiogenic_source=s.radiogenic_source,
            dyn_fric_coeff=dyn_fric_coeff,
            state_variable=state_variable, emw=s.emw,
            time=time, dt=dt, steps=steps, max_global_vel_mag=vmax,
            global_dt_min=gdtmin, l2_residual=l2_res,
            hydro_diff_max=hydro_diff_max)

    return step


def make_finalize_fn(param: Param, *, with_dt: bool, with_mass: bool = True):
    """One-jit device-side init/remesh tail: apply vbcs -> [CFL dt] ->
    (pseudo-)masses -> viscosity (dynearthsol.cxx:186-190, 411-420,
    remeshing.cxx:3048-3080).

    Running these ops eagerly costs ~190 s per Simulation init on the
    tunneled TPU backend (136 op-by-op XLA compiles at ~1.4 s each,
    round-4 profile); as ONE jitted program it is a single compile that
    the persistent compilation cache amortises across runs.
    """
    ctrl = param.control
    from .ops.assembly import make_asm as _make_asm

    @jax.jit
    def fin(ctx: StepCtx, s: State, dv=None) -> State:
        if dv is not None:
            # remesh: volume_old crosses the remesh as dv = V/V_old - 1,
            # converted back against the new volumes (remeshing.cxx:3072)
            s = State(**{**s.__dict__,
                         "volume_old": s.volume / (1.0 + dv)})
        vel = bc_mod.apply_vbcs(ctx.vbc, s.vel, s.coord, s.time)
        s = State(**{**s.__dict__, "vel": vel})
        bulkm, shearm, rho_e = _elem_props(ctx, s)
        if with_dt:
            dt, vmax, gdtmin = G.compute_dt(
                s.coord, ctx.conn, s.volume, vel, shearm, rho_e,
                ctx.mat.visc_min, ctx.mat.therm_diff_max, s.hydro_diff_max,
                ctx.max_vbc_val,
                fixed_dt=ctrl.fixed_dt, dt_fraction=ctrl.dt_fraction,
                inertial_scaling=ctrl.inertial_scaling,
                is_quasi_static=ctrl.is_quasi_static,
                has_thermal_diffusion=ctrl.has_thermal_diffusion,
                has_hydraulic_diffusion=ctrl.has_hydraulic_diffusion,
                use_global_velocity_scaling=ctrl.use_global_velocity_scaling,
                bulk_modulus_ref=param.mat.bulk_modulus[
                    param.mat.mattype_ref],
                rho0_ref=param.mat.rho0[param.mat.mattype_ref])
            s = State(**{**s.__dict__, "dt": dt, "max_global_vel_mag": vmax,
                         "global_dt_min": gdtmin})
        if with_mass:
            phi_e = M.phi_porosity(ctx.mat, s.emw)
            volume_n, mass, tmass, hmass, ymass = G.compute_mass(
                s.volume, ctx.conn, bulkm, shearm, rho_e,
                M.cp(ctx.mat, s.emw), phi_e,
                M.alpha_biot(ctx.mat, s.emw), M.beta_fluid(ctx.mat, s.emw),
                _make_asm(ctx),
                pseudo_speed=ctx.max_vbc_val * ctrl.inertial_scaling,
                pseudo_speed_atp=s.max_global_vel_mag
                * ctrl.inertial_scaling,
                is_quasi_static=ctrl.is_quasi_static,
                use_global_velocity_scaling=ctrl.use_global_velocity_scaling,
                has_hydraulic_diffusion=ctrl.has_hydraulic_diffusion,
                has_thermal_diffusion=ctrl.has_thermal_diffusion,
                ndims=ctx.ndims)
            s = State(**{**s.__dict__, "volume_n": volume_n, "mass": mass,
                         "tmass": tmass, "hmass": hmass, "ymass": ymass})
        viscosity = M.visc(ctx.mat, s.emw, s.temperature, ctx.conn,
                           s.stress, s.strain_rate)
        return State(**{**s.__dict__, "viscosity": viscosity})

    return fin


def _detect_sgrid(topo) -> Optional[tuple]:
    """(nx, nz) / (nx, ny, nz) when the mesh is the raster structured grid
    (stencil fast path, ops/structured.py and ops/grid2d.py/grid3d.py);
    None otherwise (e.g. after any remesh)."""
    from .ops.structured import detect_structured_2d, detect_structured_3d

    if topo.ndims == 2:
        return detect_structured_2d(topo.connectivity, topo.nnode)
    return detect_structured_3d(topo.connectivity, topo.nnode)


class Simulation:
    """End-to-end simulation: mesh/topology/IC on host, stepping on device."""

    def __init__(self, param: Param, _restart: Optional[dict] = None):
        self.param = param
        ndims = param.sim.ndims
        self.dtype = jnp.float64 if param.sim.float_dtype == "float64" \
            else jnp.float32

        if _restart is None and param.mesh.mesh_from_run:
            from .io.restart import load_mesh_from_run

            mesh, topo = load_mesh_from_run(param.mesh.mesh_from_run,
                                            param.mesh.mesh_from_run_frame)
        elif _restart is None:
            mesh = create_new_mesh(param)
            if getattr(mesh, "segment", None) is not None \
                    and mesh.segment.size:
                # explicit boundary segments (Exodus side sets) override
                # the box coordinate tests (create_boundary_flags from
                # segment flags, mesh.cxx:2811)
                from .mesh.topology import build_topology_from_arrays

                bcflag = np.zeros(mesh.nnode, dtype=np.uint32)
                for seg, fl in zip(mesh.segment, mesh.segflag):
                    bcflag[seg] |= np.uint32(fl)
                topo = build_topology_from_arrays(
                    ndims, mesh.connectivity, bcflag, mesh.segment,
                    mesh.segflag)
            else:
                topo = build_topology(mesh, param.mesh.xlength,
                                      param.mesh.ylength,
                                      param.mesh.zlength)
        else:
            from .mesh.generate import MeshData
            mesh = MeshData(ndims, _restart["coord"], _restart["conn"])
            topo = _restart["topo"]
        self.mesh = mesh
        self.topo = topo

        mat_tables = M.MatTables.from_param(param.mat, dtype=self.dtype)
        max_vbc_val = (param.control.characteristic_speed
                       if param.control.characteristic_speed != 0
                       else bc_mod.find_max_vbc(param.bc, ndims))

        self.ctx = StepCtx(
            ndims=ndims, nnode=topo.nnode, nelem=topo.nelem,
            conn=jnp.asarray(topo.connectivity),
            gather_idx=jnp.asarray(topo.gather_idx),
            gather_mask=jnp.asarray(topo.gather_mask),
            elem_mask=_dev(np.ones(topo.nelem), self.dtype),
            top_mask=jnp.asarray((topo.bcflag & BOUNDZ1) != 0),
            pp_bc_mask=jnp.asarray(bc_mod.pp_bc_mask(param.bc, topo.bcflag)),
            vbc=bc_mod.VBCSpec.from_param(param, topo.bcflag, topo=topo,
                                          coord=self.mesh.coord),
            sbc=bc_mod.StressBCSpec.from_topo(param, topo),
            mat=mat_tables, surf=SP.make_surf_info(topo),
            max_vbc_val=max_vbc_val, sgrid=_detect_sgrid(topo))

        # driver/aux bookkeeping (parameters.hpp Variables scalars)
        self.hydrous_markers = None
        from .constants import IBOUNDZ0, IBOUNDZ1
        self.info_display_next_step = param.sim.info_display_step_interval
        self.reference_frame_time = 0.0
        self.compensation_pressure = 0.0
        self.bottom_temperature = param.bc.mantle_temperature
        self._fin_fns = {}
        if _restart is None:
            self.state = self._init_state()
            bot = topo.bnodes[IBOUNDZ0]
            if len(bot):
                self.bottom_temperature = float(
                    np.asarray(self._host_bottom_temperature)[bot[0]])
        else:
            self.state = self._restart_state(_restart)
        self._step_fn = make_step_fn(param, self.compensation_pressure)
        self._chunk_fns = {}
        # name of the dispatched step implementation, set by _chunk_fn:
        # "pallas2d"/"pallas3d"/"grid2d"/"grid3d"/"flat2d"/"flat3d"/"generic"
        self.step_path = None

    def _finalize_fn(self, *, with_dt: bool, with_mass: bool = True):
        """Cached jitted init/remesh tail (shapes may change across a
        remesh; the same jit object retraces per shape signature)."""
        key = (with_dt, with_mass)
        if key not in self._fin_fns:
            self._fin_fns[key] = make_finalize_fn(
                self.param, with_dt=with_dt, with_mass=with_mass)
        return self._fin_fns[key]

    # ---- init (dynearthsol.cxx:158-225) ----
    def _init_state(self) -> State:
        param, topo, ctx = self.param, self.topo, self.ctx
        ndims = ctx.ndims
        s = allocate_state(topo.nnode, topo.nelem, ndims, param.mat.nmat,
                           netop=self.ctx.surf.etop, dtype=self.dtype)
        coord = _dev(self.mesh.coord, self.dtype)
        # jit this so the initial volume is bitwise identical to the volume
        # the jitted step recomputes from unchanged coords (eager mode skips
        # XLA's FMA contraction -> 1-ulp diffs; the maxwell dv = V/V_old - 1
        # term multiplies that ulp by the bulk modulus every step)
        volume = jit_compute_volume(coord, ctx.conn)

        # markers BEFORE the temperature/stress ICs (dynearthsol.cxx:172
        # vs :202-203): the reference's half-space diffusivity and
        # lithostatic bulk modulus are ELEMENT 0's marker-histogram
        # mixtures (mat.k(0)/rho(0)/cp(0), ic.cxx:845; mat.bulkm(0),
        # ic.cxx:333), not material 0's table values — they differ on
        # multi-material configs whose element 0 is not material 0
        regattr = getattr(self.mesh, "regattr", None)
        if param.markers.markers_per_element > 0:
            self.markers = mk.create_markers(param, self.mesh.coord,
                                             topo.connectivity,
                                             regattr=regattr)
            if param.ic.temperature_option == 3:
                # markers inside the adiabatic region become
                # asthenosphere (ic.cxx:820-830: eta-weighted nodal
                # in_asth >= 0.5 flips the marker mattype)
                in_asth = ic_mod.dome_geotherm(
                    param, self.mesh.coord)[1].astype(float)
                ms = self.markers
                n = ms.n
                w = (in_asth[topo.connectivity[ms.elem[:n]]]
                     * ms.eta[:n]).sum(axis=1)
                ms.mattype[:n] = np.where(
                    w >= 0.5, param.mat.mattype_asthenosphere,
                    ms.mattype[:n])
            emw_h = mk.emw_from_markers(self.markers, topo.nelem,
                                        param.mat.nmat)
        else:
            self.markers = None
            emw_h = ic_mod.initial_material_weights(
                param, self.mesh.coord, topo.connectivity,
                regattr=regattr)
        emw = _dev(emw_h, self.dtype)

        temperature_h = ic_mod.initial_temperature(param, self.mesh.coord,
                                                   emw0=emw_h[0])
        self._host_bottom_temperature = temperature_h
        temperature = _dev(temperature_h, self.dtype)
        stress, stressyy, old_mean, strain, self.compensation_pressure = \
            ic_mod.initial_stress_state(param, self.mesh.coord,
                                        topo.connectivity, emw=emw_h)
        plstrain = ic_mod.initial_weak_zone(param, self.mesh.coord,
                                            topo.connectivity)
        if param.control.has_hydraulic_diffusion:
            pp0 = ic_mod.initial_hydrostatic_state(
                param, self.mesh.coord, topo.bcflag)
        else:
            pp0 = None

        if param.mat.rheol_type in (RH_EP_RSF, RH_EVP_RSF):
            dfc0, sv0 = ic_mod.initial_rsf_state(param, np.asarray(emw))
        else:
            dfc0 = sv0 = None

        s = State(**{**s.__dict__,
                     "coord": coord, "coord0": coord, "volume": volume,
                     "volume_old": volume,
                     "temperature": temperature,
                     "stress": _dev(stress, self.dtype),
                     "stressyy": _dev(stressyy, self.dtype),
                     "old_mean_stress": _dev(old_mean, self.dtype),
                     "strain": _dev(strain, self.dtype),
                     "plstrain": _dev(plstrain, self.dtype),
                     "radiogenic_source": _dev(
                         ic_mod.initial_radiogenic_source(
                             param, self.mesh.coord, topo.connectivity),
                         self.dtype),
                     "emw": emw,
                     **({"ppressure": _dev(pp0, self.dtype)}
                        if pp0 is not None else {}),
                     **({"dyn_fric_coeff": _dev(dfc0, self.dtype),
                         "state_variable": _dev(sv0, self.dtype)}
                        if dfc0 is not None else {}),
                     "hydro_diff_max": _dev(1e-1, self.dtype)})

        # apply vbcs + initial dt + mass (dynearthsol.cxx:186-190),
        # as ONE jitted program (see make_finalize_fn)
        return self._finalize_fn(with_dt=True)(ctx, s)

    # ---- restart (dynearthsol.cxx:227-420) ----
    def _restart_state(self, r: dict) -> State:
        param, topo, ctx = self.param, self.topo, self.ctx
        ndims = ctx.ndims
        dt = self.dtype
        s = allocate_state(topo.nnode, topo.nelem, ndims, param.mat.nmat,
                           netop=self.ctx.surf.etop, dtype=dt)
        coord = _dev(r["coord"], dt)
        if "volume" in r:  # exact-restart extras present
            volume = _dev(r["volume"], dt)
        else:
            volume = jit_compute_volume(coord, ctx.conn)  # see _init_state
        self.markers = r.get("markers")
        if self.markers is not None:
            emw = _dev(mk.emw_from_markers(self.markers, topo.nelem,
                                           param.mat.nmat), dt)
        else:
            emw = s.emw
        scal = r["scalars"]
        self.info_display_next_step = scal[1]
        self.compensation_pressure = scal[2]
        self.bottom_temperature = scal[3]
        self.reference_frame_time = scal[6]
        if "dhacc" in r:
            s = State(**{**s.__dict__, "dhacc": _dev(r["dhacc"], dt)})
        if "edvacc_surf" in r:
            s = State(**{**s.__dict__,
                         "edvacc_surf": _dev(r["edvacc_surf"], dt)})

        def a(name, default=None):
            if name in r:
                return _dev(r[name], dt)
            return default

        s = State(**{**s.__dict__,
                     "coord": coord, "coord0": a("coord0", coord),
                     "vel": a("vel", s.vel),
                     "temperature": a("temperature", s.temperature),
                     "ppressure": a("ppressure", s.ppressure),
                     "volume": volume,
                     "volume_old": a("volume_old", volume),
                     "stress": a("stress", s.stress),
                     "stressyy": a("stressyy", s.stressyy),
                     "strain": a("strain", s.strain),
                     "plstrain": a("plstrain", s.plstrain),
                     "state_variable": a("state_variable", s.state_variable),
                     "emw": emw,
                     "time": _dev(scal[0], dt),
                     "dt": _dev(scal[4], dt),
                     "steps": _dev(r["steps"], jnp.int64),
                     "max_global_vel_mag": _dev(scal[5], dt),
                     "hydro_diff_max": _dev(1e-1, dt)})
        if param.ic.is_restarting_weakzone:
            # re-create the weak zone on restart (dynearthsol.cxx:386-389):
            # plstrain is OVERWRITTEN by initial_weak_zone on the restored
            # (deformed) geometry
            s = State(**{**s.__dict__,
                         "plstrain": _dev(ic_mod.initial_weak_zone(
                             param, np.asarray(coord, dtype=np.float64),
                             np.asarray(self.topo.connectivity)), dt)})

        if "old_mean_stress" in r:
            s = State(**{**s.__dict__,
                         "old_mean_stress": _dev(r["old_mean_stress"], dt)})
        elif param.control.has_hydraulic_diffusion and "stress" in r:
            s = State(**{**s.__dict__,
                         "old_mean_stress": _dev(
                             np.asarray(r["stress"])[:, :ndims]
                             .sum(axis=1) / ndims, dt)})

        # recompute mass/normals, re-apply vbcs (dynearthsol.cxx:411-420),
        # as ONE jitted program (see make_finalize_fn)
        if "mass" in r:  # exact-restart extras present
            s = State(**{**s.__dict__,
                         "volume_n": _dev(r["volume_n"], dt),
                         "mass": _dev(r["mass"], dt),
                         "tmass": _dev(r["tmass"], dt),
                         "hmass": _dev(r["hmass"], dt),
                         "ymass": _dev(r["ymass"], dt)})
            return self._finalize_fn(with_dt=False, with_mass=False)(ctx, s)
        return self._finalize_fn(with_dt=False)(ctx, s)

    # ---- pre-run relaxations (dynearthsol.cxx:476-571) ----
    def isostasy_adjustment(self):
        """Vertical-only relaxation toward isostatic equilibrium before the
        run starts (isostasy_adjustment, dynearthsol.cxx:476-524): step the
        momentum balance with free boundaries, zeroing horizontal velocity
        (and bottom velocity without a Winkler foundation)."""
        from .constants import YEAR2SEC

        param = self.param
        yr = param.ic.isostasy_adjustment_time_in_yr
        if yr <= 0:
            return 0
        ctx = self.ctx
        ctrl = param.control
        dt0 = float(self.state.dt)
        iso_steps = max(int(yr * YEAR2SEC / dt0), 1)
        ndims = ctx.ndims
        hold_bottom = not param.bc.has_winkler_foundation
        bottom_mask = jnp.asarray((self.topo.bcflag
                                   & (1 << 4)) != 0)  # BOUNDZ0
        comp_p = self.compensation_pressure

        from .ops.assembly import make_asm as _make_asm

        asm = _make_asm(ctx)

        def body(s, _):
            bulkm, shearm, rho_e = _elem_props(ctx, s)
            phi_e = M.phi_porosity(ctx.mat, s.emw)
            dnd = shape_fn_gradients(s.coord, ctx.conn, s.volume)
            srate = F.update_strain_rate(s.vel, ctx.conn, dnd)
            dv = G.compute_dvoldt(srate, s.volume, s.volume_n, ctx.conn,
                                  asm)
            edv = G.compute_edvoldt(dv, ctx.conn)
            s1 = State(**{**s.__dict__, "edvoldt": edv})
            (stress, stressyy, strain, srate2, plstrain, dpls, visc, dpr,
             dfc, sv) = _update_stress(param, ctx, s1, bulkm, shearm, srate)
            buoy = (rho_e * (1.0 - phi_e) + 1000.0 * phi_e) \
                * ctrl.gravity / (ndims + 1)
            contrib = F.internal_force_contrib(stress, s.volume, dnd, buoy)
            force = F.assemble_force(contrib, asm)
            if ctrl.has_hydraulic_diffusion:
                rho_eff = rho_e * (1.0 - phi_e) + 1000.0 * phi_e
            else:
                rho_eff = rho_e
            if ctrl.gravity != 0:
                force = bc_mod.apply_stress_bcs(param, ctx.sbc, s.coord,
                                                force, rho_eff, comp_p,
                                                s.coord0)
            force = F.apply_damping(force, s.vel, s.mass, s.ymass,
                                    ctrl.damping_option,
                                    ctrl.damping_factor)
            vel = F.update_velocity(s.vel, force, s.mass, s.dt)
            # vertical-only displacement (dynearthsol.cxx:503-516)
            vel = vel.at[:, :ndims - 1].set(0.0)
            if hold_bottom:
                vel = vel.at[:, ndims - 1].multiply(
                    jnp.where(bottom_mask, 0.0, 1.0))
            coord = F.update_coordinate(s.coord, vel, s.dt)
            volume_old = s.volume
            volume = compute_volume(coord, ctx.conn)
            voln, mass, tmass, hmass, ymass = G.compute_mass(
                volume, ctx.conn, bulkm, shearm, rho_e,
                M.cp(ctx.mat, s.emw), phi_e,
                M.alpha_biot(ctx.mat, s.emw),
                M.beta_fluid(ctx.mat, s.emw), asm,
                pseudo_speed=ctx.max_vbc_val * ctrl.inertial_scaling,
                pseudo_speed_atp=s.max_global_vel_mag
                * ctrl.inertial_scaling,
                is_quasi_static=ctrl.is_quasi_static,
                use_global_velocity_scaling=(
                    ctrl.use_global_velocity_scaling),
                has_hydraulic_diffusion=ctrl.has_hydraulic_diffusion,
                has_thermal_diffusion=ctrl.has_thermal_diffusion,
                ndims=ndims)
            return State(**{**s1.__dict__, "vel": vel, "coord": coord,
                            "volume": volume, "volume_old": volume_old,
                            "volume_n": voln, "mass": mass, "tmass": tmass,
                            "hmass": hmass, "ymass": ymass,
                            "stress": stress, "stressyy": stressyy,
                            "strain": strain, "strain_rate": srate2,
                            "plstrain": plstrain, "delta_plstrain": dpls,
                            "viscosity": visc, "dpressure": dpr,
                            "force": force}), None

        @jax.jit
        def run(s):
            out, _ = jax.lax.scan(body, s, length=iso_steps)
            return out

        self.state = run(self.state)
        return iso_steps

    def body_force_adjustment(self):
        """Pre-run gravity relaxation by pseudo-transient iteration
        (initial_body_force_adjustment, dynearthsol.cxx:526-571, invoked
        at :731-739): iterate the quasi-static force balance with ZEROED
        boundary-velocity values (PT_jump, bc.cxx:305-317) and hydraulic
        diffusion suspended (:733-737), until the L2 force residual's
        relative change drops below PT_relative_tolerance or PT_max_iter
        is hit.  Reference gates it on the PT loop ("Only works with PT
        loop"); same here.  Returns the iteration count."""
        import dataclasses as _dc

        param = self.param
        ctrl = param.control
        if not (param.ic.has_body_force_adjustment and ctrl.has_PT):
            return 0
        ctx = self.ctx
        ndims = ctx.ndims
        vbc0 = _dc.replace(ctx.vbc, values=(0.0,) * 6,
                           values_lateral=(0.0,) * 4)
        param_pt = _dc.replace(
            param, control=_dc.replace(param.control,
                                       has_hydraulic_diffusion=False)) \
            if ctrl.has_hydraulic_diffusion else param
        comp_p = self.compensation_pressure
        from .ops.assembly import make_asm as _make_asm

        asm = _make_asm(ctx)

        def iterate(carry):
            s, res_old, _, k = carry
            bulkm, shearm, rho_e = _elem_props(ctx, s)
            phi_e = M.phi_porosity(ctx.mat, s.emw)
            vel = bc_mod.apply_vbcs(vbc0, s.vel, s.coord, s.time)
            if ctrl.has_moving_mesh:
                coord = F.update_coordinate(s.coord, vel, s.dt)
                volume_old = s.volume
                volume = compute_volume(coord, ctx.conn)
                voln, mass, tmass, hmass, ymass = G.compute_mass(
                    volume, ctx.conn, bulkm, shearm, rho_e,
                    M.cp(ctx.mat, s.emw), phi_e,
                    M.alpha_biot(ctx.mat, s.emw),
                    M.beta_fluid(ctx.mat, s.emw), asm,
                    pseudo_speed=ctx.max_vbc_val * ctrl.inertial_scaling,
                    pseudo_speed_atp=s.max_global_vel_mag
                    * ctrl.inertial_scaling,
                    is_quasi_static=ctrl.is_quasi_static,
                    use_global_velocity_scaling=(
                        ctrl.use_global_velocity_scaling),
                    has_hydraulic_diffusion=False,
                    has_thermal_diffusion=ctrl.has_thermal_diffusion,
                    ndims=ndims)
                s = State(**{**s.__dict__, "coord": coord,
                             "volume": volume, "volume_old": volume_old,
                             "volume_n": voln, "mass": mass,
                             "tmass": tmass, "hmass": hmass,
                             "ymass": ymass})
            dnd = shape_fn_gradients(s.coord, ctx.conn, s.volume)
            srate = F.update_strain_rate(vel, ctx.conn, dnd)
            dv = G.compute_dvoldt(srate, s.volume, s.volume_n, ctx.conn,
                                  asm)
            edv = G.compute_edvoldt(dv, ctx.conn)
            s1 = State(**{**s.__dict__, "vel": vel, "edvoldt": edv})
            (stress, stressyy, strain, srate2, plstrain, dpls, visc, dpr,
             dfc, sv) = _update_stress(param_pt, ctx, s1, bulkm, shearm,
                                       srate)
            if ctrl.gravity != 0:
                buoy = (rho_e * (1.0 - phi_e) + 1000.0 * phi_e) \
                    * ctrl.gravity / (ndims + 1)
            else:
                buoy = jnp.zeros_like(s.volume)
            contrib = F.internal_force_contrib(stress, s.volume, dnd, buoy)
            force = F.assemble_force(contrib, asm)
            res = F.residual_l2(force)
            if ctrl.gravity != 0:
                force = bc_mod.apply_stress_bcs(param, ctx.sbc, s.coord,
                                                force, rho_e, comp_p,
                                                s.coord0)
            force = bc_mod.apply_stress_bcs_neumann(ctx.sbc, s.coord,
                                                    force)
            force = F.apply_damping(force, vel, s.mass, s.ymass,
                                    ctrl.damping_option,
                                    ctrl.damping_factor)
            vel2 = F.update_velocity(vel, force, s.mass, s.dt)
            rel = jnp.abs((res - res_old)
                          / jnp.where(res_old != 0, res_old, 1.0))
            s2 = State(**{**s1.__dict__, "vel": vel2, "force": force,
                          "stress": stress, "stressyy": stressyy,
                          "strain": strain, "strain_rate": srate2,
                          "plstrain": plstrain, "delta_plstrain": dpls,
                          "viscosity": visc, "dpressure": dpr,
                          "l2_residual": res,
                          **({"dyn_fric_coeff": dfc,
                              "state_variable": sv}
                             if dfc is not None else {})})
            return (s2, res, rel, k + 1)

        def cond(carry):
            _, _, rel, k = carry
            return ((k < ctrl.PT_max_iter)
                    & (rel >= ctrl.PT_relative_tolerance))

        @jax.jit
        def run(s):
            res0 = s.l2_residual
            out, _, _, k = jax.lax.while_loop(
                cond, iterate,
                (s, res0, jnp.asarray(1.0, dtype=self.dtype), 0))
            return out, k

        self.state, k = run(self.state)
        return int(k)

    def apply_host_surface_dh(self, dh_top):
        """Apply an externally-computed surface increment at a host chunk
        boundary (GoSPL coupling, surface_process_option 11, and the
        custom hook, option 101).  Mirrors the in-step dh application
        (bc.cxx:1727-1760): coordinates, dhacc, per-facet edvacc, then the
        dependent volume/mass fields are recomputed."""
        import numpy as np

        surf = self.ctx.surf
        if surf.etop == 0:
            return
        ndims = self.ctx.ndims
        coord = np.asarray(self.state.coord, dtype=np.float64).copy()
        dh = np.zeros(self.topo.nnode)
        dh[np.asarray(surf.top_nodes)] = np.asarray(dh_top,
                                                    dtype=np.float64)
        coord[:, ndims - 1] += dh
        dhacc = np.asarray(self.state.dhacc, dtype=np.float64) + dh
        f = np.asarray(surf.facet_nodes)
        dh_e = dh[f].sum(axis=1)
        if ndims == 2:
            base = np.abs(coord[f[:, 1], 0] - coord[f[:, 0], 0])
        else:
            d01 = coord[f[:, 1]] - coord[f[:, 0]]
            d02 = coord[f[:, 2]] - coord[f[:, 0]]
            base = 0.5 * (d01[:, 0] * d02[:, 1] - d01[:, 1] * d02[:, 0])
        edv = np.asarray(self.state.edvacc_surf, dtype=np.float64) \
            + dh_e * base / ndims

        cj = _dev(coord, self.dtype)
        volume = jit_compute_volume(cj, self.ctx.conn)
        s1 = State(**{**self.state.__dict__,
                      "coord": cj, "volume": volume,
                      "dhacc": _dev(dhacc, self.dtype),
                      "edvacc_surf": _dev(edv, self.dtype)})
        ctx, ctrl = self.ctx, self.param.control

        if "_mass_tail" not in self._fin_fns:
            from .ops.assembly import make_asm as _make_asm
            param = self.param

            @jax.jit
            def mass_tail(ctx, s):
                # ONE jitted program (op-by-op dispatch costs ~30 tunnel
                # compiles per GoSPL coupling event; cf. make_finalize_fn)
                bulkm, shearm, rho_e = _elem_props(ctx, s)
                volume_n, mass, tmass, hmass, ymass = G.compute_mass(
                    s.volume, ctx.conn, bulkm, shearm, rho_e,
                    M.cp(ctx.mat, s.emw), M.phi_porosity(ctx.mat, s.emw),
                    M.alpha_biot(ctx.mat, s.emw),
                    M.beta_fluid(ctx.mat, s.emw), _make_asm(ctx),
                    pseudo_speed=ctx.max_vbc_val * ctrl.inertial_scaling,
                    pseudo_speed_atp=s.max_global_vel_mag
                    * ctrl.inertial_scaling,
                    is_quasi_static=ctrl.is_quasi_static,
                    use_global_velocity_scaling=(
                        ctrl.use_global_velocity_scaling),
                    has_hydraulic_diffusion=ctrl.has_hydraulic_diffusion,
                    has_thermal_diffusion=ctrl.has_thermal_diffusion,
                    ndims=ctx.ndims)
                return State(**{**s.__dict__, "volume_n": volume_n,
                                "mass": mass, "tmass": tmass,
                                "hmass": hmass, "ymass": ymass})

            self._fin_fns["_mass_tail"] = mass_tail
        self.state = self._fin_fns["_mass_tail"](ctx, s1)

    # ---- surface marker bookkeeping (host, chunk-boundary cadence) ----
    def correct_surface_markers(self):
        """Erosion/deposition marker correction (correct_surface_marker,
        markerset.cxx:1529-1735).  Surface-element markers keep their
        PHYSICAL position across accumulated surface motion: each marker's
        position is re-evaluated against the pre-dh geometry (node z minus
        dhacc) and its eta recomputed against the current geometry.
        Markers that fall outside their element are relocated (containment
        search; the reference walks the one-ring support,
        markerset.cxx:461-495) or deleted (eroded away), and depleted
        surface elements are replenished to 3 markers
        (markerset.cxx:1692-1720)."""
        if self.markers is None or self.ctx.surf.etop == 0:
            return
        import numpy as np

        from .barycentric import ETA_TOL, bary_coords

        dhacc = np.asarray(self.state.dhacc, dtype=np.float64)
        if not np.abs(dhacc).any():
            return
        coord = np.asarray(self.state.coord, dtype=np.float64)
        conn = self.topo.connectivity
        ate = np.asarray(self.ctx.surf.all_top_elems)
        ms = self.markers
        idx = np.flatnonzero(np.isin(ms.elem[:ms.n], ate))
        if idx.size == 0:
            return
        coord0 = coord.copy()
        coord0[:, -1] -= dhacc
        e_m = ms.elem[idx]
        pts = np.einsum("mk,mkd->md", ms.eta[idx], coord0[conn[e_m]])
        eta_new = bary_coords(coord, conn, e_m, pts)
        inside = (eta_new >= ETA_TOL).all(axis=1)
        ms.eta[idx[inside]] = eta_new[inside]
        out = idx[~inside]
        if out.size:
            from .mesh.locate import ElementLocator

            loc = ElementLocator(coord, conn)
            e2, eta2, found = loc.locate(pts[~inside])
            ms.elem[out[found]] = e2[found].astype(ms.elem.dtype)
            ms.eta[out[found]] = eta2[found]
            if (~found).any():
                ms.remove(out[~found])
            from .remesh_impl import replenish_markers

            replenish_markers(
                ms, coord, conn, self.param,
                self.param.markers.random_seed + int(self.state.steps),
                only_elems=ate, fill_to=3)
        emw = jnp.asarray(
            mk.emw_from_markers(ms, self.topo.nelem, self.param.mat.nmat),
            dtype=self.dtype)
        self.state = State(**{**self.state.__dict__, "emw": emw})

    def sync_surface_markers(self):
        """Create sediment markers from accumulated deposition and reset the
        dh accumulator (set_surface_marker, markerset.cxx:261-458; called at
        quality_check_step_interval cadence like bc.cxx:1795-1812), after
        the erosion-side correction (bc.cxx:1795-1799 call order)."""
        if self.markers is None or self.ctx.surf.etop == 0:
            return
        self.correct_surface_markers()
        param = self.param
        ndims = self.ctx.ndims
        ms = self.markers
        edv = np.asarray(self.state.edvacc_surf, dtype=np.float64).copy()
        volume = np.asarray(self.state.volume, dtype=np.float64)
        coord = np.asarray(self.state.coord, dtype=np.float64)
        conn = self.topo.connectivity
        top_elems = np.asarray(self.ctx.surf.top_elems)
        facet_nodes = np.asarray(self.ctx.surf.facet_nodes)

        hist = ms.elem_histogram(self.topo.nelem, param.mat.nmat)
        nmark = hist.sum(axis=1)[top_elems]
        nmark = np.maximum(nmark, 1.0)
        edv[edv < 0] = 0.0
        sel = np.nonzero(nmark * edv >= volume[top_elems])[0]
        if sel.size:
            from .barycentric import bary_coords
            rng = np.random.default_rng(
                param.markers.random_seed + int(self.state.steps))
            e = top_elems[sel]
            dv_apply = volume[e] / nmark[sel]
            fverts = coord[facet_nodes[sel]]         # (k, ndims, ndims)
            # random point on the top facet, lowered by 0.8 * dv/base
            # (marker_dh_applied_ratio, markerset.cxx:268)
            w = rng.random((sel.size, ndims))
            w /= w.sum(axis=1, keepdims=True)
            pts = np.einsum("kf,kfd->kd", w, fverts)
            if ndims == 2:
                base = np.abs(fverts[:, 1, 0] - fverts[:, 0, 0])
            else:
                d01 = fverts[:, 1] - fverts[:, 0]
                d02 = fverts[:, 2] - fverts[:, 0]
                base = 0.5 * (d01[:, 0] * d02[:, 1] - d01[:, 1] * d02[:, 0])
            pts[:, ndims - 1] -= 0.8 * dv_apply / np.maximum(base, 1e-300)
            eta = bary_coords(coord, conn, e, pts)
            eta = np.clip(eta, 0.0, None)
            eta /= eta.sum(axis=1, keepdims=True)
            ms.append(eta, e.astype(np.int32), param.mat.mattype_sed,
                      time=float(self.state.time), z=pts[:, ndims - 1],
                      distance=pts[:, 0], genesis=2)
            edv[sel] -= dv_apply
            emw = jnp.asarray(
                mk.emw_from_markers(ms, self.topo.nelem, param.mat.nmat),
                dtype=self.dtype)
            self.state = State(**{**self.state.__dict__, "emw": emw})
        # reset dhacc after the marker correction (bc.cxx:1800-1806)
        self.state = State(**{**self.state.__dict__,
                              "edvacc_surf": jnp.asarray(edv,
                                                         dtype=self.dtype),
                              "dhacc": jnp.zeros_like(self.state.dhacc)})

    # ---- derived element fields for output (output.cxx:213-233) ----
    def elem_density(self) -> np.ndarray:
        return np.asarray(M.rho(self.ctx.mat, self.state.emw,
                                self.state.temperature, self.ctx.conn),
                          dtype=np.float64)

    def elem_quality(self) -> np.ndarray:
        return np.asarray(G.elem_quality(self.state.coord, self.ctx.conn,
                                         self.state.volume),
                          dtype=np.float64)

    # ---- stepping ----
    def _attach_band_tables(self):
        """Build + attach banded gather tables for the flat SoA step.

        Enabled on accelerator backends (or DES_BAND=1 to force on CPU,
        which the equivalence tests use); DES_NO_BAND=1 disables.  The
        builder returns None on meshes whose numbering is not
        band-friendly — the flat step then keeps its exact column
        engine.  f64 state also bypasses the band engine regardless
        (dtype gate inside flat2d), preserving the bit-exact contract."""
        import os
        if self.ctx.band is not None or os.environ.get("DES_NO_BAND"):
            return
        if not (os.environ.get("DES_BAND") == "1"
                or jax.default_backend() != "cpu"):
            return
        import dataclasses as _dc

        from .ops import band2d
        bt = band2d.build_band_tables(
            np.asarray(self.topo.connectivity), self.topo.nnode)
        if bt is not None:
            self.ctx = _dc.replace(self.ctx, band=bt)

    def _chunk_fn(self, n: int):
        if n not in self._chunk_fns:
            import os

            from .ops import flat2d, flat3d, grid2d, grid3d, pallas2d, \
                pallas3d

            step = self._step_fn
            if (pallas2d.resident_applicable(self.param, self.ctx)
                    and not os.environ.get("DES_NO_PALLAS")):
                # VMEM-resident multi-step kernel: the whole mesh stays
                # on-chip for the whole scan chunk; HBM is touched twice
                # per chunk instead of twice per step (ops/pallas2d.py)
                self.step_path = "pallas2d_res"
                self._chunk_fns[n] = pallas2d.make_resident_chunk_runner(
                    self.param, self.ctx, self.compensation_pressure, n)
                return self._chunk_fns[n]
            if (pallas2d.pallas_step_applicable(self.param, self.ctx)
                    and not os.environ.get("DES_NO_PALLAS")):
                # fused single-kernel Pallas step (ops/pallas2d.py): the
                # whole dynearthsol.cxx:746-956 sequence in one kernel
                self.step_path = "pallas2d"
                self._chunk_fns[n] = pallas2d.make_chunk_runner(
                    self.param, self.ctx, self.compensation_pressure, n)
                return self._chunk_fns[n]
            if (pallas3d.pallas3d_step_applicable(self.param, self.ctx)
                    and not os.environ.get("DES_NO_PALLAS")):
                # fused single-kernel 3D Pallas step (ops/pallas3d.py)
                self.step_path = "pallas3d"
                self._chunk_fns[n] = pallas3d.make_chunk_runner(
                    self.param, self.ctx, self.compensation_pressure, n)
                return self._chunk_fns[n]
            gridmod = None
            if grid2d.grid_step_applicable(self.param, self.ctx):
                gridmod = grid2d
            elif grid3d.grid_step_applicable(self.param, self.ctx):
                gridmod = grid3d
            if gridmod is not None:
                # structured-grid plane step (TPU production path): element
                # state converts to SoA planes once per chunk, not per step
                self.step_path = gridmod.__name__.rsplit(".", 1)[-1]
                gstep = gridmod.make_grid_step(self.param, self.ctx,
                                               self.compensation_pressure)
                dims = self.ctx.sgrid
                to_grid, from_grid = gridmod.state_to_grid, \
                    gridmod.grid_to_state

                @jax.jit
                def run_chunk(ctx, state):
                    g = to_grid(state, *dims)

                    def body(s, _):
                        return gstep(ctx, s), None

                    g, _ = jax.lax.scan(body, g, length=n)
                    return from_grid(g, *dims)
            elif (flat2d.flat_step_applicable(self.param, self.ctx)
                    and not os.environ.get("DES_NO_FLAT")):
                # SoA column step (ops/flat2d.py): avoids the generic
                # path's (nelem, npe, ndims) rank-3 tiling penalty — the
                # post-remesh production path, and the production path
                # for structured configs whose feature set (surface
                # processes/hydraulic/RSF) falls off the grid/pallas gates
                self.step_path = "flat2d"
                self._attach_band_tables()
                run_chunk = flat2d.make_chunk_runner(
                    self.param, self.ctx, self.compensation_pressure, n)
            elif (flat3d.flat3d_step_applicable(self.param, self.ctx)
                    and not os.environ.get("DES_NO_FLAT")):
                self.step_path = "flat3d"
                self._attach_band_tables()
                run_chunk = flat3d.make_chunk_runner(
                    self.param, self.ctx, self.compensation_pressure, n)
            else:
                self.step_path = "generic"

                @jax.jit
                def run_chunk(ctx, state):
                    def body(s, _):
                        return step(ctx, s), None
                    out, _ = jax.lax.scan(body, state, length=n)
                    return out

            self._chunk_fns[n] = run_chunk
        return self._chunk_fns[n]

    def run_steps(self, n: int, chunk: Optional[int] = None):
        """Advance n steps, scanning `chunk` steps per device launch."""
        chunk = chunk or min(n, self.param.sim.scan_chunk_steps or 100)
        done = 0
        while done < n:
            c = min(chunk, n - done)
            self.state = self._chunk_fn(c)(self.ctx, self.state)
            done += c
        return self.state

    def step_once(self):
        self.state = self._chunk_fn(1)(self.ctx, self.state)
        return self.state
