"""Shared in-kernel helpers for the fused Pallas steps (pallas2d,
pallasu2d).

Mosaic has no f64 path and rejects weak python-float scalars that x64
promotes to f64 constants, so every scalar entering a vector op must be
typed f32 explicitly.  The property mixers below re-express the
matprops.cxx:115-144 histogram mixing with the material axis as a python
loop over compile-time scalars (the mixing means of marker weights),
matching ops/matprops.visc_core / plastic_props at f32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .matprops import GAS_CONSTANT


def np_tab(tab):
    """Material tables as host numpy scalars (embed as kernel consts)."""
    class NS:
        pass

    out = NS()
    for f in dataclasses.fields(tab):
        v = getattr(tab, f.name)
        out.__dict__[f.name] = np.asarray(v) if hasattr(v, "shape") \
            else float(v)
    return out


def make_visc_core_local(tabn, nmat: int, dtype, visc_min: float,
                         visc_max: float):
    """visc_core (matprops.cxx:40-77) with the mat axis unrolled."""

    def visc_core_local(w, Tm, s0, edot):
        log_edot = jnp.log(edot)
        acc = jnp.zeros_like(Tm)
        wsum = jnp.zeros_like(Tm)
        for m in range(nmat):
            pw = 1.0 / float(tabn.visc_exponent[m]) - 1.0
            pw1 = -1.0 / float(tabn.visc_exponent[m])
            log_coef = float(np.log(0.75 * tabn.visc_coefficient[m]))
            expo = ((float(tabn.visc_activation_energy[m])
                     + float(tabn.visc_activation_volume[m]) * s0)
                    / (float(tabn.visc_exponent[m]) * GAS_CONSTANT * Tm))
            log_v0 = (float(np.log(0.25)) + pw * log_edot
                      + pw1 * log_coef + expo + float(np.log(1e6)))
            acc = acc + w[m] * jnp.exp(-log_v0)
            wsum = wsum + w[m]
        v = wsum / acc
        return jnp.clip(v, jnp.asarray(visc_min, dtype),
                        jnp.asarray(visc_max, dtype))

    return visc_core_local


def make_plastic_props_local(tabn, nmat: int, dtype, tension_max: float):
    """plastic_props/plastic_weakening (matprops.cxx:432-530), mat axis
    unrolled; returns (amc, anphi, anpsi, hardening, ten_max)."""

    def plastic_props_local(w, pls):
        c = f = d = h = wsum = None
        for m in range(nmat):
            pls0 = float(tabn.pls0[m])
            pls1 = float(tabn.pls1[m])
            span = max(pls1 - pls0, 1e-300)
            p = jnp.clip((pls - pls0) / span, 0.0, 1.0)
            c_m = float(tabn.cohesion0[m]) + p * (
                float(tabn.cohesion1[m]) - float(tabn.cohesion0[m]))
            f_m = float(tabn.friction_angle0[m]) + p * (
                float(tabn.friction_angle1[m])
                - float(tabn.friction_angle0[m]))
            d_m = float(tabn.dilation_angle0[m]) + p * (
                float(tabn.dilation_angle1[m])
                - float(tabn.dilation_angle0[m]))
            in_w = (pls >= pls0) & (pls < pls1)
            # both branches typed f32: a scalar/scalar where of weak
            # python floats becomes an f64 vector select in Mosaic
            h_m = jnp.where(
                in_w,
                jnp.asarray((float(tabn.cohesion1[m])
                             - float(tabn.cohesion0[m])) / span, dtype),
                jnp.asarray(0.0, dtype))
            if c is None:
                c = w[m] * c_m
                f = w[m] * f_m
                d = w[m] * d_m
                h = w[m] * h_m
                wsum = w[m] + 0.0 * c_m
            else:
                c = c + w[m] * c_m
                f = f + w[m] * f_m
                d = d + w[m] * d_m
                h = h + w[m] * h_m
                wsum = wsum + w[m]
        c, f, d, h = c / wsum, f / wsum, d / wsum, h / wsum
        DEG2RAD = np.pi / 180.0
        sphi = jnp.sin(f * DEG2RAD)
        spsi = jnp.sin(d * DEG2RAD)
        anphi = (1.0 + sphi) / (1.0 - sphi)
        anpsi = (1.0 + spsi) / (1.0 - spsi)
        amc = 2.0 * c * jnp.sqrt(anphi)
        tanphi = jnp.tan(f * DEG2RAD)
        ten_max = jnp.where(
            f == 0.0, jnp.asarray(tension_max, dtype),
            jnp.minimum(tension_max,
                        c / jnp.where(tanphi == 0.0,
                                      jnp.asarray(1.0, dtype), tanphi)))
        return amc, anphi, anpsi, h, ten_max

    return plastic_props_local
