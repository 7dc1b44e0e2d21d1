"""Marker-weighted material property evaluation, vectorized over elements.

Reference: MatProps (matprops.cxx).  All material properties are mixtures of
per-material constants weighted by the per-element marker histogram
``elemmarkers[e][mat]`` — harmonic means for moduli (matprops.cxx:246-255),
arithmetic means for rho/cp/k (matprops.cxx:565-599), harmonic mixing of
dislocation-creep viscosities (matprops.cxx:258-300, Chen & Morgan 1990),
and count-weighted piecewise-linear plastic weakening (matprops.cxx:303-341).

Here the histogram is a float array ``emw`` of shape (nelem, nmat); weights
are marker counts (or any non-negative weights), so the same kernels serve
the marker system and analytic material layouts.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, fields as _dc_fields

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEG2RAD
from .tensor import second_invariant, trace

GAS_CONSTANT = 8.3144
MIN_STRAIN_RATE = 1e-30
CELSIUS0 = 273.0

_MAT_META = ("visc_min", "visc_max", "tension_max", "therm_diff_max")


def _register_mat_tables(cls):
    data = [f.name for f in _dc_fields(cls) if f.name not in _MAT_META]
    return jax.tree_util.register_dataclass(
        cls, data_fields=data, meta_fields=list(_MAT_META))


@_register_mat_tables
@dataclass(frozen=True)
class MatTables:
    """Static per-material constant tables, shape (nmat,) each."""

    rho0: jnp.ndarray
    alpha: jnp.ndarray
    bulk_modulus: jnp.ndarray
    shear_modulus: jnp.ndarray
    visc_exponent: jnp.ndarray
    visc_coefficient: jnp.ndarray
    visc_activation_energy: jnp.ndarray
    visc_activation_volume: jnp.ndarray
    heat_capacity: jnp.ndarray
    therm_cond: jnp.ndarray
    pls0: jnp.ndarray
    pls1: jnp.ndarray
    cohesion0: jnp.ndarray
    cohesion1: jnp.ndarray
    friction_angle0: jnp.ndarray
    friction_angle1: jnp.ndarray
    dilation_angle0: jnp.ndarray
    dilation_angle1: jnp.ndarray
    porosity: jnp.ndarray
    hydraulic_perm: jnp.ndarray
    fluid_rho0: jnp.ndarray
    fluid_alpha: jnp.ndarray
    fluid_bulk_modulus: jnp.ndarray
    fluid_visc: jnp.ndarray
    biot_coeff: jnp.ndarray
    bulk_modulus_s: jnp.ndarray
    direct_a: jnp.ndarray
    evolution_b: jnp.ndarray
    characteristic_velocity: jnp.ndarray
    characteristic_distance: jnp.ndarray
    static_friction_coefficient: jnp.ndarray
    visc_min: float
    visc_max: float
    tension_max: float
    therm_diff_max: float

    @staticmethod
    def from_param(mat, dtype=jnp.float64) -> "MatTables":
        def arr(x):
            return jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dtype)

        return MatTables(
            rho0=arr(mat.rho0), alpha=arr(mat.alpha),
            bulk_modulus=arr(mat.bulk_modulus),
            shear_modulus=arr(mat.shear_modulus),
            visc_exponent=arr(mat.visc_exponent),
            visc_coefficient=arr(mat.visc_coefficient),
            visc_activation_energy=arr(mat.visc_activation_energy),
            visc_activation_volume=arr(mat.visc_activation_volume),
            heat_capacity=arr(mat.heat_capacity),
            therm_cond=arr(mat.therm_cond),
            pls0=arr(mat.pls0), pls1=arr(mat.pls1),
            cohesion0=arr(mat.cohesion0), cohesion1=arr(mat.cohesion1),
            friction_angle0=arr(mat.friction_angle0),
            friction_angle1=arr(mat.friction_angle1),
            dilation_angle0=arr(mat.dilation_angle0),
            dilation_angle1=arr(mat.dilation_angle1),
            porosity=arr(mat.porosity),
            hydraulic_perm=arr(mat.hydraulic_perm),
            fluid_rho0=arr(mat.fluid_rho0), fluid_alpha=arr(mat.fluid_alpha),
            fluid_bulk_modulus=arr(mat.fluid_bulk_modulus),
            fluid_visc=arr(mat.fluid_visc), biot_coeff=arr(mat.biot_coeff),
            bulk_modulus_s=arr(mat.bulk_modulus_s),
            direct_a=arr(mat.direct_a), evolution_b=arr(mat.evolution_b),
            characteristic_velocity=arr(mat.characteristic_velocity),
            characteristic_distance=arr(mat.characteristic_distance),
            static_friction_coefficient=arr(mat.static_friction_coefficient),
            visc_min=mat.visc_min, visc_max=mat.visc_max,
            tension_max=mat.tension_max, therm_diff_max=mat.therm_diff_max,
        )


def harmonic_mean(values: jnp.ndarray, emw: jnp.ndarray) -> jnp.ndarray:
    """(nmat,), (..., nmat) -> (...,).  matprops.cxx:131-144.
    emw may be flat (nelem, nmat) or structured-grid planes
    (2, nxc, nzc, nmat)."""
    if values.shape[0] == 1:
        return jnp.full(emw.shape[:-1], values[0], dtype=values.dtype)
    n = emw.sum(axis=-1)
    return n / (emw / values).sum(axis=-1)


def arithmetic_mean(values: jnp.ndarray, emw: jnp.ndarray) -> jnp.ndarray:
    """matprops.cxx:115-129."""
    if values.shape[0] == 1:
        return jnp.full(emw.shape[:-1], values[0], dtype=values.dtype)
    return (emw * values).sum(axis=-1) / emw.sum(axis=-1)


def bulkm(tab: MatTables, emw) -> jnp.ndarray:
    return harmonic_mean(tab.bulk_modulus, emw)


def shearm(tab: MatTables, emw) -> jnp.ndarray:
    return harmonic_mean(tab.shear_modulus, emw)


def elem_temperature(temperature, conn) -> jnp.ndarray:
    """Element-average temperature (matprops.cxx:566-575).  Pass conn=None
    when `temperature` is already gathered to corner slots (nelem, npe)."""
    T = temperature[conn] if conn is not None else temperature
    return T.mean(axis=1)


def rho(tab: MatTables, emw, temperature, conn) -> jnp.ndarray:
    """rho0 * (1 - alpha*(T - 273C)) mixture (matprops.cxx:565-587)."""
    return rho_from_T(tab, emw, elem_temperature(temperature, conn))


def rho_from_T(tab: MatTables, emw, T) -> jnp.ndarray:
    """rho mixture from element-mean temperature; emw (..., nmat), T (...)."""
    TinC = T - CELSIUS0
    per_mat = tab.rho0 * (1.0 - tab.alpha * TinC[..., None])
    return (per_mat * emw).sum(axis=-1) / emw.sum(axis=-1)


def cp(tab: MatTables, emw) -> jnp.ndarray:
    return arithmetic_mean(tab.heat_capacity, emw)


def therm_cond(tab: MatTables, emw) -> jnp.ndarray:
    return arithmetic_mean(tab.therm_cond, emw)


def visc(tab: MatTables, emw, temperature, conn, stress, strain_rate
         ) -> jnp.ndarray:
    """Dislocation-creep viscosity, Chen & Morgan JGR 1990
    (matprops.cxx:258-300), harmonic mixture, clamped to
    [visc_min, visc_max]."""
    T = elem_temperature(temperature, conn)
    ndims = 2 if stress.shape[-1] == 3 else 3
    s0 = trace(stress) / ndims
    edot = jnp.maximum(second_invariant(strain_rate), MIN_STRAIN_RATE)
    return visc_core(tab, emw, T, s0, edot)


def visc_core(tab: MatTables, emw, T, s0, edot) -> jnp.ndarray:
    """Creep viscosity from element-mean T, mean stress s0 and strain-rate
    invariant edot; all (...) shaped, emw (..., nmat)."""
    pw = 1.0 / tab.visc_exponent - 1.0  # (nmat,)
    pw1 = -1.0 / tab.visc_exponent
    # visc0[e,m] = 0.25 * edot^pow * (0.75 A)^pow1 * exp((E + V s0)/(n R T)) * 1e6
    log_edot = jnp.log(edot)  # (...)
    log_coef = jnp.log(0.75 * tab.visc_coefficient)  # (nmat,)
    expo = ((tab.visc_activation_energy
             + tab.visc_activation_volume * s0[..., None])
            / (tab.visc_exponent * GAS_CONSTANT * T[..., None]))
    log_visc0 = (jnp.log(0.25) + pw * log_edot[..., None]
                 + pw1 * log_coef + expo + jnp.log(1e6))
    inv_visc0 = jnp.exp(-log_visc0)
    v = emw.sum(axis=-1) / (emw * inv_visc0).sum(axis=-1)
    return jnp.clip(v, tab.visc_min, tab.visc_max)


def plastic_weakening(tab: MatTables, emw, pls):
    """Weight-averaged cohesion/friction/dilation/hardening with linear
    strain softening between pls0 and pls1 (matprops.cxx:303-341).

    pls: (...) accumulated plastic strain; emw (..., nmat).
    Returns (cohesion, friction_angle, dilation_angle, hardening), each (...).
    """
    pls_m = pls[..., None]
    p = jnp.clip((pls_m - tab.pls0)
                 / jnp.maximum(tab.pls1 - tab.pls0, 1e-300), 0.0, 1.0)
    c_m = tab.cohesion0 + p * (tab.cohesion1 - tab.cohesion0)
    f_m = tab.friction_angle0 + p * (tab.friction_angle1
                                     - tab.friction_angle0)
    d_m = tab.dilation_angle0 + p * (tab.dilation_angle1
                                     - tab.dilation_angle0)
    in_weakening = (pls_m >= tab.pls0) & (pls_m < tab.pls1)
    h_m = jnp.where(
        in_weakening,
        (tab.cohesion1 - tab.cohesion0)
        / jnp.maximum(tab.pls1 - tab.pls0, 1e-300),
        0.0)
    n = emw.sum(axis=-1)
    cohesion = (c_m * emw).sum(axis=-1) / n
    friction = (f_m * emw).sum(axis=-1) / n
    dilation = (d_m * emw).sum(axis=-1) / n
    hardening = (h_m * emw).sum(axis=-1) / n
    return cohesion, friction, dilation, hardening


def plastic_props(tab: MatTables, emw, pls):
    """Mohr-Coulomb derived quantities (matprops.cxx:512-530):
    amc = 2 c sqrt(anphi); anphi/anpsi from friction/dilation angles;
    ten_max = min(tension_max, c/tan(phi)) (or tension_max at phi=0)."""
    cohesion, phi, psi, hardn = plastic_weakening(tab, emw, pls)
    sphi = jnp.sin(phi * DEG2RAD)
    spsi = jnp.sin(psi * DEG2RAD)
    anphi = (1.0 + sphi) / (1.0 - sphi)
    anpsi = (1.0 + spsi) / (1.0 - spsi)
    amc = 2.0 * cohesion * jnp.sqrt(anphi)
    tanphi = jnp.tan(phi * DEG2RAD)
    ten_max = jnp.where(phi == 0.0, tab.tension_max,
                        jnp.minimum(tab.tension_max,
                                    cohesion / jnp.where(tanphi == 0.0, 1.0,
                                                         tanphi)))
    return amc, anphi, anpsi, hardn, ten_max


# --- hydraulic property mixers (matprops.cxx:602-677) ---

def perm(tab: MatTables, emw):
    return harmonic_mean(tab.hydraulic_perm, emw)


def phi_porosity(tab: MatTables, emw):
    return arithmetic_mean(tab.porosity, emw)


def alpha_biot(tab: MatTables, emw):
    return arithmetic_mean(tab.biot_coeff, emw)


def rho_fluid(tab: MatTables, emw):
    return arithmetic_mean(tab.fluid_rho0, emw)


def mu_fluid(tab: MatTables, emw):
    return arithmetic_mean(tab.fluid_visc, emw)


def beta_fluid(tab: MatTables, emw):
    return harmonic_mean(1.0 / tab.fluid_bulk_modulus, emw)


# --- rate-and-state friction (matprops.cxx:343-552) ---

def update_state_variable(tab: MatTables, emw, slip_rate, state_variable,
                          dt, state_model: int):
    """State-variable evolution laws 0 (steady), 1 (aging), 2 (slip)
    (matprops.cxx:439-510)."""
    if state_model == 0:
        return state_variable
    theta_min, theta_max, ratio_min = 1e-12, 1e12, 1e-10
    d = arithmetic_mean(tab.characteristic_distance, emw)
    ok = d >= 1e-12
    safe_d = jnp.where(ok, d, 1.0)
    if state_model == 1:
        dtheta = (1.0 - slip_rate * state_variable / safe_d) * dt
        new = jnp.clip(state_variable + dtheta, theta_min, theta_max)
        return jnp.where(ok, new, state_variable)
    # slip law (model 2)
    theta = jnp.clip(state_variable, theta_min, theta_max)
    ratio = jnp.maximum(slip_rate * theta / safe_d, ratio_min)
    dtheta = -ratio * jnp.log(ratio) * dt
    new = theta + dtheta
    fallback = safe_d / jnp.maximum(slip_rate, 1e-30)
    new = jnp.where(new <= 0.0, fallback, new)
    new = jnp.clip(new, theta_min, theta_max)
    return jnp.where(ok, new, state_variable)


def rsf_friction(tab: MatTables, emw, pls, slip_rate, state_variable,
                 state_model: int):
    """Rate-and-state dynamic friction coefficient and angle
    (plastic_weakening_rsf, matprops.cxx:343-437).  Returns
    (cohesion, phi_dyn_deg, psi, hardn, mu_d)."""
    cohesion, phi_s, psi, hardn = plastic_weakening(tab, emw, pls)
    a = arithmetic_mean(tab.direct_a, emw)
    b = arithmetic_mean(tab.evolution_b, emw)
    cv = jnp.maximum(arithmetic_mean(tab.characteristic_velocity, emw),
                     1e-30)
    dc = jnp.maximum(arithmetic_mean(tab.characteristic_distance, emw),
                     1e-30)
    mu0 = jnp.tan(DEG2RAD * phi_s)
    v_eff = jnp.maximum(slip_rate, 1e-30)
    theta_eff = jnp.maximum(state_variable, 1e-30)
    if state_model == 0:
        mu_d = mu0 + (a - b) * jnp.log(v_eff / cv)
    else:
        mu_d = mu0 + a * jnp.log(v_eff / cv) \
            + b * jnp.log(cv * theta_eff / dc)
    mu_d = jnp.maximum(mu_d, 1e-6)
    phi_dyn = jnp.arctan(mu_d) / DEG2RAD
    return cohesion, phi_dyn, psi, hardn, mu_d


def plastic_props_rsf(tab: MatTables, emw, pls, slip_rate, state_variable,
                      dt, state_model: int):
    """RSF Mohr-Coulomb derived quantities (plastic_props_rsf,
    matprops.cxx:532-552).  Updates the state variable first, then derives
    the dynamic friction.  Returns
    (amc, anphi, anpsi, hardn, ten_max, dyn_fric_coeff, state_variable)."""
    state_variable = update_state_variable(tab, emw, slip_rate,
                                           state_variable, dt, state_model)
    cohesion, phi, psi, hardn, mu_d = rsf_friction(
        tab, emw, pls, slip_rate, state_variable, state_model)
    sphi = jnp.sin(phi * DEG2RAD)
    spsi = jnp.sin(psi * DEG2RAD)
    anphi = (1.0 + sphi) / (1.0 - sphi)
    anpsi = (1.0 + spsi) / (1.0 - spsi)
    amc = 2.0 * cohesion * jnp.sqrt(anphi)
    tanphi = jnp.tan(phi * DEG2RAD)
    ten_max = jnp.where(phi == 0.0, tab.tension_max,
                        jnp.minimum(tab.tension_max,
                                    cohesion / jnp.where(tanphi == 0.0, 1.0,
                                                         tanphi)))
    return amc, anphi, anpsi, hardn, ten_max, mu_d, state_variable
