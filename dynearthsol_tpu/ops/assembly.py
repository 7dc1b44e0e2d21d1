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

import dataclasses
import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["own_mask"], meta_fields=["h", "ndev"])
@dataclasses.dataclass(frozen=True)
class HaloSpec:
    """Node-window halo bookkeeping for the sharded-nodal step
    (parallel/halo_step.py).

    Nodes are partitioned into contiguous blocks of B (renumbered order,
    mesh/generate.py longest-axis numbering gives index locality); each
    device holds a window of W = B + 2h rows.  ``h`` is the max
    index-space spread of any element's connectivity, so every element's
    corner nodes fall inside its shard's window.  ``own_mask`` marks the
    B owned rows (excluding the pad tail of the last shard)."""

    own_mask: jnp.ndarray  # (W,) f32 1/0 owned-row indicator (local)
    h: int                 # halo rows each side
    ndev: int              # devices on the node/element axis


def node_sum_halo(contrib: jnp.ndarray, conn: jnp.ndarray, width: int,
                  axis_name: str, halo: HaloSpec,
                  elem_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Halo-exchange assembly: local scatter into the W-row node window,
    then exchange the 2h-row overlap slabs with both neighbours and add.

    The element->node transfer is the ONLY communication of the core
    loop (SURVEY §2.3); exchanging 2h rows instead of psum-ing a
    full-length replicated nodal buffer (node_sum_scatter) makes the
    per-step traffic O(cut surface), not O(nnode), and lets nodal state
    shard ~1/N per device.  Overlap rows are computed by BOTH neighbours
    from identical complete sums (two-term adds are commutative in
    IEEE), so no second sync is needed after nodal updates."""
    if elem_mask is not None:
        contrib = contrib * elem_mask.reshape(
            (-1,) + (1,) * (contrib.ndim - 1))
    flat = contrib.reshape(contrib.shape[0] * contrib.shape[1], -1)
    out = jnp.zeros((width, flat.shape[1]), dtype=contrib.dtype)
    out = out.at[conn.ravel()].add(flat)
    out = halo_overlap_add(out, axis_name, halo)
    if contrib.ndim == 2:
        return out[:, 0]
    return out


def halo_overlap_add(out: jnp.ndarray, axis_name: str,
                     halo: HaloSpec) -> jnp.ndarray:
    """Exchange the 2h-row overlap slabs of a per-shard nodal partial-sum
    buffer with both neighbours and add.  After the exchange every
    overlap row holds own_partial + neighbour_partial — a two-term IEEE
    add, commutative, so the row is bit-identical on both owners.

    Used by node_sum_halo for element assembly, and standalone as the
    SECOND overlap exchange for facet-scattered partial sums (boundary
    tractions bc.cxx:632-875; surface-diffusion edge sums bc.cxx:879-1074)
    whose facets are partitioned by owning shard."""
    h2 = 2 * halo.h
    ndev = halo.ndev
    width = out.shape[0]
    # (src, dst) pairs: edge devices receive zeros
    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    from_left = jax.lax.ppermute(out[width - h2:], axis_name, fwd)
    from_right = jax.lax.ppermute(out[:h2], axis_name, bwd)
    out = out.at[:h2].add(from_left)
    out = out.at[width - h2:].add(from_right)
    return out


def node_sum(contrib: jnp.ndarray, gather_idx: jnp.ndarray,
             gather_mask: jnp.ndarray) -> jnp.ndarray:
    """Sum per-(element, corner) contributions onto nodes.

    contrib: (nelem, npe) or (nelem, npe, k)
    gather_idx/gather_mask: (nnode, max_degree) padded support table
    returns: (nnode,) or (nnode, k)
    """
    from .fastidx import support_sum

    nslots = contrib.shape[0] * contrib.shape[1]
    if contrib.ndim == 2:
        # flatten to 1-D (fast) + per-column support gather (fastidx.py:
        # the fused rank-2 gather form costs ~16 s of XLA compile at
        # production sizes on the tunneled TPU backend)
        return support_sum(contrib.reshape(nslots), gather_idx,
                           gather_mask)
    comps = [support_sum(contrib[..., d].reshape(nslots), gather_idx,
                         gather_mask)
             for d in range(contrib.shape[2])]
    return jnp.stack(comps, axis=1)


def node_sum_scatter(contrib: jnp.ndarray, conn: jnp.ndarray, nnode: int,
                     axis_name: str | None = None,
                     elem_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Scatter-add assembly for the shard_map path: each shard sums its
    LOCAL elements' contributions into a full-length nodal array, then a
    `psum` over the element axis merges the partial sums — the halo
    exchange of the domain decomposition (SURVEY §2.3).

    contrib: (nelem_local, npe) or (nelem_local, npe, k); conn holds GLOBAL
    node ids.  elem_mask zeroes padded elements."""
    import jax

    if elem_mask is not None:
        contrib = contrib * elem_mask.reshape(
            (-1,) + (1,) * (contrib.ndim - 1))
    flat = contrib.reshape(contrib.shape[0] * contrib.shape[1], -1)
    out = jnp.zeros((nnode, flat.shape[1]), dtype=contrib.dtype)
    out = out.at[conn.ravel()].add(flat)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    if contrib.ndim == 2:
        return out[:, 0]
    return out


def make_asm(ctx):
    """Assembly closure for a StepCtx: stencil pad-add on a structured
    grid, gather-based on one device otherwise; inside shard_map
    (ctx.axis set) either halo exchange over node windows (ctx.halo) or
    scatter+full psum (replicated nodal fallback)."""
    if ctx.axis is None:
        if ctx.sgrid is not None and len(ctx.sgrid) == 2:
            from .structured import scatter_corners_2d

            nx, nz = ctx.sgrid
            return lambda c: scatter_corners_2d(c, nx, nz)
        return lambda c: node_sum(c, ctx.gather_idx, ctx.gather_mask)
    if getattr(ctx, "halo", None) is not None:
        return lambda c: node_sum_halo(c, ctx.conn, ctx.nnode, ctx.axis,
                                       ctx.halo, ctx.elem_mask)
    return lambda c: node_sum_scatter(c, ctx.conn, ctx.nnode, ctx.axis,
                                      ctx.elem_mask)


def gather_nodes(nodal: jnp.ndarray, conn: jnp.ndarray) -> jnp.ndarray:
    """Gather nodal values to element corners: (nnode, ...) -> (nelem, npe, ...)."""
    return nodal[conn]
