"""Simulation state pytree.

Mirrors the reference's ``Variables`` struct (parameters.hpp:646-791) but as
an immutable JAX pytree threaded through a ``lax.scan`` step loop.  Static
topology (connectivity, assembly permutation, boundary masks) lives in
``StepCtx`` (simulation.py), not here.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class State:
    # nodal fields
    coord: jnp.ndarray          # (nnode, ndims)
    coord0: jnp.ndarray         # initial coordinates (nnode, ndims)
    vel: jnp.ndarray            # (nnode, ndims)
    temperature: jnp.ndarray    # (nnode,)
    ppressure: jnp.ndarray      # (nnode,)
    dppressure: jnp.ndarray     # (nnode,)
    volume_n: jnp.ndarray       # (nnode,) lumped volume
    mass: jnp.ndarray           # (nnode,)
    tmass: jnp.ndarray          # (nnode,) thermal mass
    hmass: jnp.ndarray          # (nnode,) hydraulic mass
    ymass: jnp.ndarray          # (nnode,) Young's-modulus mass
    force: jnp.ndarray          # (nnode, ndims) last assembled force
    # element fields
    volume: jnp.ndarray         # (nelem,)
    volume_old: jnp.ndarray     # (nelem,)
    stress: jnp.ndarray         # (nelem, NSTR)
    stressyy: jnp.ndarray       # (nelem,) plane-strain out-of-plane stress
    old_mean_stress: jnp.ndarray  # (nelem,)
    strain: jnp.ndarray         # (nelem, NSTR)
    strain_rate: jnp.ndarray    # (nelem, NSTR)
    plstrain: jnp.ndarray       # (nelem,)
    delta_plstrain: jnp.ndarray  # (nelem,)
    viscosity: jnp.ndarray      # (nelem,)
    dpressure: jnp.ndarray      # (nelem,) pressure change for NMD
    edvoldt: jnp.ndarray        # (nelem,) smoothed volumetric strain rate
    radiogenic_source: jnp.ndarray  # (nelem,)
    dyn_fric_coeff: jnp.ndarray  # (nelem,) RSF
    state_variable: jnp.ndarray  # (nelem,) RSF
    emw: jnp.ndarray            # (nelem, nmat) element material weights
    # averaged-output accumulators (output.cxx:300-340 average_fields);
    # zero-size placeholders when is_outputting_averaged_fields is off
    dhacc: jnp.ndarray              # (nnode,) accumulated surface dh
    edvacc_surf: jnp.ndarray        # (etop,) accumulated deposited volume
    stress_avg: jnp.ndarray         # (nelem, NSTR) running sum
    delta_plstrain_avg: jnp.ndarray  # (nelem,) running sum
    coord_avg0: jnp.ndarray         # (nnode, ndims) coord at interval start
    strain_avg0: jnp.ndarray        # (nelem, NSTR) strain at interval start
    time_avg0: jnp.ndarray          # scalar, time at interval start
    # scalars
    time: jnp.ndarray
    dt: jnp.ndarray
    steps: jnp.ndarray          # int64
    max_global_vel_mag: jnp.ndarray
    global_dt_min: jnp.ndarray
    l2_residual: jnp.ndarray
    hydro_diff_max: jnp.ndarray


def allocate_state(nnode: int, nelem: int, ndims: int, nmat: int,
                   netop: int = 0, dtype=jnp.float64) -> State:
    """Zero-initialised state (cf. allocate_variables, fields.cxx:56-122).

    Zeros are built host-side and device_put rather than eager
    ``jnp.zeros``: on the tunneled TPU backend every distinct-shape eager
    op is a ~0.4-6 s server-side XLA compile, so allocation alone cost
    8 compiles; device_put is compile-free.
    """
    import numpy as np

    nstr = ndims * (ndims + 1) // 2
    npdt = jnp.dtype(dtype)

    def nvec(*shape):
        return jnp.asarray(np.zeros(shape, dtype=npdt))

    def scalar(dt=npdt):
        return jnp.asarray(np.zeros((), dtype=jnp.dtype(dt)))

    return State(
        coord=nvec(nnode, ndims), coord0=nvec(nnode, ndims),
        vel=nvec(nnode, ndims), temperature=nvec(nnode),
        ppressure=nvec(nnode), dppressure=nvec(nnode),
        volume_n=nvec(nnode), mass=nvec(nnode), tmass=nvec(nnode),
        hmass=nvec(nnode), ymass=nvec(nnode), force=nvec(nnode, ndims),
        volume=nvec(nelem), volume_old=nvec(nelem),
        stress=nvec(nelem, nstr), stressyy=nvec(nelem),
        old_mean_stress=nvec(nelem), strain=nvec(nelem, nstr),
        strain_rate=nvec(nelem, nstr), plstrain=nvec(nelem),
        delta_plstrain=nvec(nelem), viscosity=nvec(nelem),
        dpressure=nvec(nelem), edvoldt=nvec(nelem),
        radiogenic_source=nvec(nelem), dyn_fric_coeff=nvec(nelem),
        state_variable=nvec(nelem),
        emw=jnp.asarray(np.ones((nelem, nmat), dtype=npdt)),
        dhacc=nvec(nnode), edvacc_surf=nvec(netop),
        stress_avg=nvec(nelem, nstr), delta_plstrain_avg=nvec(nelem),
        coord_avg0=nvec(nnode, ndims), strain_avg0=nvec(nelem, nstr),
        time_avg0=scalar(),
        time=scalar(), dt=scalar(),
        steps=scalar(jnp.int64),
        max_global_vel_mag=scalar(),
        global_dt_min=scalar(),
        l2_residual=scalar(),
        hydro_diff_max=scalar(),
    )
