"""Field kernels: strain rate, force assembly, damping, velocity/coordinate
updates, Jaumann rotation, thermal diffusion.

Reference: fields.cxx.  Every kernel is a whole-array jnp expression;
element->node assembly goes through ops.assembly.node_sum (sorted
segment-sum), the TPU equivalent of the reference's two-phase gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .assembly import node_sum
from .tensor import trace


# named scopes surface each kernel phase in jax.profiler traces (SURVEY §5.1:
# the reference's NVTX ranges per kernel)
@jax.named_scope("update_strain_rate")
def update_strain_rate(vel, conn, dnd):
    """Symmetric gradient of velocity (fields.cxx:408-483).

    vel: (nnode, ndims); dnd: (nelem, npe, ndims) shape-fn gradients.
    Returns strain_rate (nelem, NSTR) in component order
    2D [xx, zz, xz] / 3D [xx, yy, zz, xy, xz, yz].
    """
    v = vel[conn] if conn is not None else vel  # (nelem, npe, ndims)
    ndims = v.shape[2]
    # L[a,b] = sum_i v[i,a] * dN[i,b]
    L = jnp.einsum("nia,nib->nab", v, dnd)
    if ndims == 2:
        return jnp.stack([L[:, 0, 0], L[:, 1, 1],
                          0.5 * (L[:, 0, 1] + L[:, 1, 0])], axis=1)
    return jnp.stack([L[:, 0, 0], L[:, 1, 1], L[:, 2, 2],
                      0.5 * (L[:, 0, 1] + L[:, 1, 0]),
                      0.5 * (L[:, 0, 2] + L[:, 2, 0]),
                      0.5 * (L[:, 1, 2] + L[:, 2, 1])], axis=1)


def spin_rates(vel, conn, dnd):
    """Anti-symmetric velocity-gradient components for the Jaumann rate
    (fields.cxx:857-897).  2D returns (w2,); 3D returns (w3, w4, w5)."""
    v = vel[conn] if conn is not None else vel
    ndims = v.shape[2]
    L = jnp.einsum("nia,nib->nab", v, dnd)
    if ndims == 2:
        # w2 = 0.5 (dvz/dx - dvx/dz)
        return (0.5 * (L[:, 1, 0] - L[:, 0, 1]),)
    w3 = 0.5 * (L[:, 0, 1] - L[:, 1, 0])
    w4 = 0.5 * (L[:, 0, 2] - L[:, 2, 0])
    w5 = 0.5 * (L[:, 1, 2] - L[:, 2, 1])
    return (w3, w4, w5)


def jaumann_increment(t, dt, w):
    """dt * (T*W - W*T) for flattened symmetric T (fields.cxx:794-829)."""
    if len(w) == 1:
        (w2,) = w
        inc = jnp.stack([-2.0 * t[:, 2] * w2,
                         2.0 * t[:, 2] * w2,
                         (t[:, 0] - t[:, 1]) * w2], axis=1)
    else:
        w3, w4, w5 = w
        inc = jnp.stack([
            -2.0 * t[:, 3] * w3 - 2.0 * t[:, 4] * w4,
            2.0 * t[:, 3] * w3 - 2.0 * t[:, 5] * w5,
            2.0 * t[:, 4] * w4 + 2.0 * t[:, 5] * w5,
            t[:, 0] * w3 - t[:, 1] * w3 - t[:, 4] * w5 - t[:, 5] * w4,
            t[:, 0] * w4 - t[:, 2] * w4 + t[:, 3] * w5 - t[:, 5] * w3,
            t[:, 1] * w5 - t[:, 2] * w5 + t[:, 3] * w4 + t[:, 4] * w3,
        ], axis=1)
    return dt * inc


@jax.named_scope("rotate_stress")
def rotate_stress(stress, strain, vel, conn, dnd, dt):
    """Jaumann objective rotation of stress and strain (fields.cxx:832-907)."""
    w = spin_rates(vel, conn, dnd)
    return (stress + jaumann_increment(stress, dt, w),
            strain + jaumann_increment(strain, dt, w))


@jax.named_scope("internal_force_contrib")
def internal_force_contrib(stress, volume, dnd, buoy):
    """Per-(element,corner) force contributions: (B^T sigma + gravity) * vol
    (fields.cxx:626-656).  buoy: (nelem,) rho*g/NPE (0 when gravity==0).
    Returns (nelem, npe, ndims)."""
    ndims = dnd.shape[2]
    s = stress
    if ndims == 2:
        fx = s[:, 0, None] * dnd[:, :, 0] + s[:, 2, None] * dnd[:, :, 1]
        fz = (s[:, 2, None] * dnd[:, :, 0] + s[:, 1, None] * dnd[:, :, 1]
              + buoy[:, None])
        out = jnp.stack([fx, fz], axis=2)
    else:
        fx = (s[:, 0, None] * dnd[:, :, 0] + s[:, 3, None] * dnd[:, :, 1]
              + s[:, 4, None] * dnd[:, :, 2])
        fy = (s[:, 3, None] * dnd[:, :, 0] + s[:, 1, None] * dnd[:, :, 1]
              + s[:, 5, None] * dnd[:, :, 2])
        fz = (s[:, 4, None] * dnd[:, :, 0] + s[:, 5, None] * dnd[:, :, 1]
              + s[:, 2, None] * dnd[:, :, 2] + buoy[:, None])
        out = jnp.stack([fx, fy, fz], axis=2)
    return out * volume[:, None, None]


@jax.named_scope("assemble_force")
def assemble_force(contrib, asm):
    """Nodal force = -sum of element contributions (fields.cxx:662-681)."""
    f = asm(contrib)
    return -f


@jax.named_scope("apply_damping")
def apply_damping(force, vel, mass, ymass, damping_option: int,
                  damping_factor: float):
    """FLAC-style velocity-proportional damping, options 0-4
    (fields.cxx:486-582)."""
    small_vel = 1e-13
    if damping_option == 0:
        return force
    if damping_option == 1:
        # damp when |v| above threshold: f -= factor * |f| * sign(v)
        moving = jnp.abs(vel) > small_vel
        return force - jnp.where(
            moving, damping_factor * jnp.abs(force) * jnp.sign(vel), 0.0)
    if damping_option == 2:
        return force * (1.0 - damping_factor)
    if damping_option == 3:
        parallel = (force < 0) == (vel < 0)
        return jnp.where(parallel,
                         force * (1.0 - damping_factor),
                         force * (2.0 - damping_factor))
    if damping_option == 4:
        critical = 2.0 * jnp.sqrt(mass * ymass)
        moving = jnp.abs(vel) > small_vel
        f_C = damping_factor * jnp.abs(force) * jnp.sign(vel)
        f_V = critical[:, None] * vel
        f_damp = jnp.where(jnp.abs(f_C) < jnp.abs(f_V), f_V, f_C)
        return force - jnp.where(moving, f_damp, 0.0)
    raise ValueError(f"unknown damping_option {damping_option}")


@jax.named_scope("update_velocity")
def update_velocity(vel, force, mass, dt):
    """v += dt * f / m (fields.cxx:730-747)."""
    return vel + dt * force / mass[:, None]


@jax.named_scope("update_coordinate")
def update_coordinate(coord, vel, dt):
    """x += v * dt (fields.cxx:766-789)."""
    return coord + vel * dt


def residual_l2(force_residual, own_mask=None, axis_name=None):
    """RMS of nodal residual force (fields.cxx:705-727).

    With node-windowed sharding (ops/assembly.HaloSpec) each shard sums
    only its OWNED rows (overlap rows are computed on both neighbours)
    and the sum/count ride one psum."""
    import jax

    if own_mask is None:
        num = force_residual.size
        ss = jnp.sum(force_residual * force_residual)
    else:
        m = own_mask.reshape((-1,) + (1,) * (force_residual.ndim - 1))
        ss = jnp.sum(force_residual * force_residual * m)
        num = jnp.sum(own_mask) * (force_residual.size
                                   // force_residual.shape[0])
    if axis_name is not None:
        ss = jax.lax.psum(ss, axis_name)
        num = jax.lax.psum(num, axis_name)
    return jnp.sqrt(ss / num)


def temperature_diffusion_contrib(temperature, conn, dnd, volume, kappa,
                                  source_term):
    """Per-corner heat-diffusion contributions (fields.cxx:197-239).

    kappa: (nelem,) thermal conductivity; source_term: (nelem,) radiogenic
    source * vol * rho / NPE.  Returns (nelem, npe) of
    kv * sum_j (grad_i . grad_j) T_j - source.
    """
    T = temperature[conn] if conn is not None else temperature
    gradT = jnp.einsum("nj,njd->nd", T, dnd)  # (nelem, ndims)
    diffusion = jnp.einsum("nid,nd->ni", dnd, gradT)
    kv = kappa * volume
    return diffusion * kv[:, None] - source_term[:, None]


@jax.named_scope("update_pore_pressure")
def update_pore_pressure(ppressure, dppressure, coord, conn, dnd, volume,
                         stress, old_mean_stress, hmass, dt, gravity,
                         perm_e, mu_e, alpha_b, phi_e, beta_f, bulkm,
                         shearm, pp_bc_mask, asm, axis_name=None):
    """Explicit Darcy pore-pressure diffusion with the poroelastic source
    (fields.cxx:297-406).  Hydraulic head = p/gamma_w + z; the volumetric
    (Biot) source comes from the mean-stress change over the step.

    Returns (ppressure, dppressure, hydro_diff_max)."""
    from .tensor import trace

    ndims = coord.shape[1]
    npe = ndims + 1
    mean_change = trace(stress) / ndims - old_mean_stress
    matrix_comp = 1.0 / (bulkm + 4.0 * shearm / 3.0)
    if ndims == 2:
        bulk_comp = 1.0 / (bulkm + shearm / 3.0)
    else:
        bulk_comp = 1.0 / bulkm
    rho_f = 1000.0  # fields.cxx:330 hard-codes water density
    gamma_w = rho_f * gravity
    hydraulic_conductivity = perm_e * gamma_w / mu_e
    kv = hydraulic_conductivity * volume
    diff_e = hydraulic_conductivity / (phi_e * beta_f
                                       + alpha_b * matrix_comp) / gamma_w
    hydro_diff_max = jnp.maximum(diff_e.max(), 1e-38)
    if axis_name is not None:
        import jax

        hydro_diff_max = jax.lax.pmax(hydro_diff_max, axis_name)

    # poroelastic volume source (fields.cxx:342)
    pe = alpha_b * mean_change * bulk_comp * volume / npe / dt

    head = ppressure[conn] / gamma_w + coord[conn, ndims - 1]  # (nelem, npe)
    grad = jnp.einsum("nj,njd->nd", head, dnd)
    diffusion = jnp.einsum("nid,nd->ni", dnd, grad)
    contrib = kv[:, None] * diffusion + pe[:, None]
    tdot = asm(contrib)

    upd = jnp.where(hmass > 0.0, tdot * dt / jnp.where(hmass > 0, hmass, 1.0),
                    0.0)
    pp_new = jnp.where(pp_bc_mask, ppressure, ppressure - upd)
    dpp_new = jnp.where(pp_bc_mask, dppressure, upd)
    return pp_new, dpp_new, hydro_diff_max


@jax.named_scope("update_temperature")
def update_temperature(temperature, conn, dnd, volume, kappa, source_term,
                       tmass, dt, top_mask, surface_T, asm,
                       t_slots=None):
    """Explicit thermal diffusion step with Dirichlet top boundary
    (fields.cxx:197-283).  ``t_slots`` optionally supplies the pre-gathered
    corner temperatures (nelem, npe)."""
    contrib = temperature_diffusion_contrib(
        t_slots if t_slots is not None else temperature,
        None if t_slots is not None else conn, dnd, volume, kappa,
        source_term)
    tdot = asm(contrib)
    new_T = temperature - dt * tdot / tmass
    return jnp.where(top_mask, surface_T, new_T)
