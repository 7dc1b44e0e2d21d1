"""Element->node assembly as a padded-support GATHER.

The reference avoids scatter races with a two-phase gather: per-element
contributions land in an ``elem_cache`` and a second loop gathers via the
node->element support list (e.g. update_force, fields.cxx:612-703;
compute_mass, geometry.cxx:1020-1154; CSR support mesh.cxx:3240-3281).

On TPU this is ALSO the right primitive — XLA scatter-add serializes, while
a dense gather over a (nnode, max_degree) padded support table vectorizes on
the VPU.  Each node sums the contributions of its (masked, fixed-order)
corner slots: deterministic, race-free, one fused kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def node_sum(contrib: jnp.ndarray, gather_idx: jnp.ndarray,
             gather_mask: jnp.ndarray) -> jnp.ndarray:
    """Sum per-(element, corner) contributions onto nodes.

    contrib: (nelem, npe) or (nelem, npe, k)
    gather_idx/gather_mask: (nnode, max_degree) padded support table
    returns: (nnode,) or (nnode, k)
    """
    nslots = contrib.shape[0] * contrib.shape[1]
    flat = contrib.reshape(nslots, -1)
    vals = flat[gather_idx]  # (nnode, max_degree, k)
    vals = jnp.where(gather_mask[..., None], vals, 0.0)
    out = vals.sum(axis=1)
    if contrib.ndim == 2:
        return out[:, 0]
    return out


def gather_nodes(nodal: jnp.ndarray, conn: jnp.ndarray) -> jnp.ndarray:
    """Gather nodal values to element corners: (nnode, ...) -> (nelem, npe, ...)."""
    return nodal[conn]
