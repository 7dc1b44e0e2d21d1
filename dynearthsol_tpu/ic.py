"""Initial conditions: temperature, stress state, weak zones, material
layout.

Reference: ic.cxx.  These run once on the host at init (and after restart),
so they are plain numpy.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erf

from .constants import YEAR2SEC


def ref_pressure(param, z: np.ndarray | float):
    """Reference lithostatic pressure at depth (matprops.cxx:148-169),
    option 0 only (PREM options 1/2 to come with the 3D models)."""
    depth = -np.asarray(z)
    mat = param.mat
    ctrl = param.control
    if ctrl.ref_pressure_option == 0:
        if ctrl.has_hydraulic_diffusion:
            rho = (mat.rho0[mat.mattype_ref]
                   * (1 - mat.porosity[mat.mattype_ref])
                   + 1000.0 * mat.porosity[mat.mattype_ref])
        else:
            rho = mat.rho0[mat.mattype_ref]
        return rho * ctrl.gravity * depth
    raise NotImplementedError(
        f"ref_pressure_option {ctrl.ref_pressure_option} (PREM) not yet done")


def initial_temperature(param, coord: np.ndarray) -> np.ndarray:
    """Temperature options (ic.cxx:836-1025).  Implemented: 0 (half-space
    cooling), 1 reserved, 90 (file import) reserved."""
    ic, bc = param.ic, param.bc
    ndims = coord.shape[1]
    z = coord[:, ndims - 1]
    if ic.temperature_option == 0:
        # half-space cooling (ic.cxx:841-853)
        age = ic.oceanic_plate_age_in_yr * YEAR2SEC
        k0 = param.mat.therm_cond[0]
        rho0 = param.mat.rho0[0]
        cp0 = param.mat.heat_capacity[0]
        diffusivity = k0 / rho0 / cp0
        w = -z / np.sqrt(4 * diffusivity * age)
        return bc.surface_temperature + (
            bc.mantle_temperature - bc.surface_temperature) * erf(w)
    raise NotImplementedError(
        f"temperature_option {ic.temperature_option} not yet implemented")


def initial_stress_state(param, coord: np.ndarray, conn: np.ndarray):
    """Lithostatic stress/strain init (ic.cxx:322-362).

    Returns (stress, stressyy, old_mean_stress, strain, compensation_pressure).
    """
    ndims = coord.shape[1]
    nstr = ndims * (ndims + 1) // 2
    nelem = conn.shape[0]
    stress = np.zeros((nelem, nstr))
    strain = np.zeros((nelem, nstr))
    stressyy = np.zeros(nelem)
    old_mean = np.zeros(nelem)
    if param.control.gravity == 0:
        return stress, stressyy, old_mean, strain, 0.0

    zcenter = coord[conn, ndims - 1].mean(axis=1)
    p = ref_pressure(param, zcenter)
    ks = param.mat.bulk_modulus[0]  # harmonic mean of elem 0 ~ material 0
    stress[:, :ndims] = -p[:, None]
    strain[:, :ndims] = (-p / ks / ndims)[:, None]
    old_mean = stress[:, :ndims].sum(axis=1) / ndims
    if param.mat.is_plane_strain:
        stressyy = -p
    compensation_pressure = float(ref_pressure(param, -param.mesh.zlength))
    return stress, stressyy, old_mean, strain, compensation_pressure


def initial_weak_zone(param, coord: np.ndarray, conn: np.ndarray
                      ) -> np.ndarray:
    """Initial plastic strain in a weak zone (ic.cxx:500-657).

    Implemented options: 0 (none), 1 (inclined plane band), 2 (ellipsoid).
    """
    ic = param.ic
    ndims = coord.shape[1]
    nelem = conn.shape[0]
    plstrain = np.zeros(nelem)
    opt = ic.weakzone_option
    if opt == 0:
        return plstrain
    center = conn  # element centroids
    c = coord[conn].mean(axis=1)
    if opt == 1:
        # plane of weakness with azimuth/inclination through
        # (xcenter, [ycenter,] zcenter), half-width in resolution units
        x0 = ic.weakzone_xcenter * param.mesh.xlength
        z0 = -ic.weakzone_zcenter * param.mesh.zlength
        halfwidth = ic.weakzone_halfwidth * param.mesh.resolution
        incl = np.tan(np.deg2rad(ic.weakzone_inclination))
        dx = c[:, 0] - x0
        dz = c[:, ndims - 1] - z0
        # distance from inclined plane (2D): |dx - dz/tan(incl)| * sin(incl)
        sin_i = np.sin(np.deg2rad(ic.weakzone_inclination))
        dist = np.abs(dx * sin_i - dz * np.cos(np.deg2rad(ic.weakzone_inclination)))
        zmin = -ic.weakzone_depth_max * param.mesh.zlength
        zmax = -ic.weakzone_depth_min * param.mesh.zlength
        inz = (c[:, ndims - 1] >= zmin) & (c[:, ndims - 1] <= zmax)
        sel = (dist <= halfwidth) & inz
        if ndims == 3:
            ymin = ic.weakzone_y_min * param.mesh.ylength
            ymax = ic.weakzone_y_max * param.mesh.ylength
            sel &= (c[:, 1] >= ymin) & (c[:, 1] <= ymax)
        plstrain[sel] = ic.weakzone_plstrain
        return plstrain
    if opt == 2:
        x0 = ic.weakzone_xcenter * param.mesh.xlength
        z0 = -ic.weakzone_zcenter * param.mesh.zlength
        r2 = ((c[:, 0] - x0) / ic.weakzone_xsemi_axis) ** 2 \
            + ((c[:, ndims - 1] - z0) / ic.weakzone_zsemi_axis) ** 2
        if ndims == 3:
            y0 = ic.weakzone_ycenter * param.mesh.ylength
            r2 += ((c[:, 1] - y0) / ic.weakzone_ysemi_axis) ** 2
        plstrain[r2 <= 1.0] = ic.weakzone_plstrain
        return plstrain
    raise NotImplementedError(f"weakzone_option {opt} not yet implemented")


def initial_material_weights(param, coord: np.ndarray, conn: np.ndarray
                             ) -> np.ndarray:
    """Element material weights standing in for marker histograms until the
    marker subsystem takes over (ic.cxx mattype layers, ic.cxx:652-713).

    mattype_option 0: depth layers from mattype_layer_depths (fractions of
    zlength) with materials layer_mattypes.
    """
    nmat = param.mat.nmat
    nelem = conn.shape[0]
    emw = np.zeros((nelem, nmat))
    if nmat == 1:
        emw[:, 0] = 1.0
        return emw
    ndims = coord.shape[1]
    zc = coord[conn, ndims - 1].mean(axis=1)
    depth_frac = -zc / max(param.mesh.zlength, 1e-300)
    depths = list(param.ic.mattype_layer_depths)
    mats = list(param.ic.layer_mattypes)
    bounds = [0.0] + depths + [np.inf]
    for i, m in enumerate(mats):
        sel = (depth_frac >= bounds[i]) & (depth_frac < bounds[i + 1])
        emw[sel, m] = 1.0
    # any unassigned elements get the last layer's material
    unassigned = emw.sum(axis=1) == 0
    emw[unassigned, mats[-1]] = 1.0
    return emw


def initial_hydrostatic_state(param, coord: np.ndarray,
                              bcflag: np.ndarray) -> np.ndarray:
    """Hydrostatic pore pressure + Skempton-loaded excess pressure
    (ic.cxx:450-498).  Positive in compression."""
    if param.control.gravity == 0:
        return np.zeros(coord.shape[0])
    mat = param.mat
    ndims = coord.shape[1]
    rho_fluid = 1000.0  # ic.cxx:460 hard-codes water
    z = coord[:, ndims - 1]
    pp = -rho_fluid * param.control.gravity * z

    loading = param.ic.excess_pore_pressure
    if loading != 0.0:
        from .bc import pp_bc_mask

        ks = mat.bulk_modulus[0]
        mu = mat.shear_modulus[0]
        lame = ks - 2.0 / 3.0 * mu
        alpha_c = mat.biot_coeff[0]
        phi = mat.porosity[0]
        beta_w = 1.0 / mat.fluid_bulk_modulus[0]
        skempton = 1.0 / (phi * beta_w * (lame + 2 * mu)
                          / (alpha_c + phi - phi * alpha_c) + alpha_c)
        free = ~pp_bc_mask(param.bc, bcflag)
        pp[free] += skempton * loading
    return pp


def initial_rsf_state(param, emw: np.ndarray):
    """Initial RSF friction coefficient and state variable
    (ic.cxx:659-726): marker-weighted tan(friction_angle0) and
    characteristic_distance / characteristic_velocity."""
    mat = param.mat
    w = emw / emw.sum(axis=1, keepdims=True)
    fric = w @ np.asarray(mat.friction_angle0)
    dfc = np.tan(np.deg2rad(fric))
    c_avg = w @ np.asarray(mat.characteristic_velocity)
    d_avg = w @ np.asarray(mat.characteristic_distance)
    sv = np.where(c_avg > 0, d_avg / np.maximum(c_avg, 1e-300), 1e9)
    return dfc, sv
