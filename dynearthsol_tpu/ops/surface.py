"""Surface processes: hillslope diffusion erosion/sedimentation.

Reference: bc.cxx:877-1831.  ``simple_diffusion`` diffuses the topography
(1D FD along the surface in 2D, facet FEM in 3D, bc.cxx:879-1074);
``surface_processes`` applies dh to the surface nodes, accumulates ``dhacc``
(per-node) and ``edvacc_surf`` (per-facet deposited volume), corrects the
surface elements' stress/strain for the volume change
(bc.cxx:1615-1665), and decays surface plastic strain (bc.cxx:1593-1613).

TPU-native: all of this runs INSIDE the jitted step (it touches coordinates
every step); only the marker bookkeeping (sediment marker creation from
edvacc, markerset.cxx:261-458) stays on host at chunk boundaries.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..constants import YEAR2SEC

LN2 = 0.69314718056
PLSTRAIN_HALF_LIFE = 1.0e2 * YEAR2SEC  # bc.cxx:1599


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["top_nodes", "top_mask_f", "facet_nodes", "top_elems",
                 "all_top_elems", "top_elem_mask", "facet_mask"],
    meta_fields=["ntop", "etop"])
@dataclass(frozen=True)
class SurfInfo:
    """Static surface topology (SurfaceInfo, parameters.hpp:576-630)."""

    ntop: int
    etop: int
    top_nodes: jnp.ndarray   # (ntop,) int32, sorted by x in 2D
    top_mask_f: jnp.ndarray  # (nnode,) float 1/0 top-node indicator
    facet_nodes: jnp.ndarray  # (etop, ndims) global node ids per top facet
    top_elems: jnp.ndarray   # (etop,) element of each top facet
    # every element touching any top node via support (create_top_elems,
    # mesh.cxx:2879-2891) — the loop set of correct_surface_element and
    # surface_plstrain_diffusion, wider than the facet owners above
    all_top_elems: jnp.ndarray  # (ntop_elems,) unique, sorted
    # same set as a full-length 0/1 mask: the in-step form (elementwise,
    # no scatter -> TPU-friendly and element-shardable under shard_map)
    top_elem_mask: jnp.ndarray  # (nelem,) float 1/0
    # padded-row indicator for per-shard facet tables (the halo-sharded
    # step partitions top facets by owning element shard); None on a
    # single device where no padding exists
    facet_mask: jnp.ndarray | None = None  # (etop,) 1/0


def make_surf_info(topo) -> SurfInfo:
    """Build from topology (create_surface_info, mesh.cxx:2979-3056)."""
    import numpy as np

    from ..constants import IBOUNDZ1, dim

    ndims = topo.ndims
    nof = dim(ndims).node_of_facet
    bf = topo.bfacets[IBOUNDZ1]
    facet_nodes = np.zeros((len(bf), ndims), dtype=np.int32)
    top_elems = np.zeros(len(bf), dtype=np.int32)
    for i, (e, f) in enumerate(bf):
        facet_nodes[i] = topo.connectivity[e, list(nof[f])]
        top_elems[i] = e
    top_nodes = topo.bnodes[IBOUNDZ1].astype(np.int32)
    mask = np.zeros(topo.nnode)
    mask[top_nodes] = 1.0
    # all elements with at least one top node (create_top_elems set-union
    # over node supports, mesh.cxx:2879-2891)
    if len(top_nodes):
        touches = np.isin(topo.connectivity, top_nodes).any(axis=1)
        all_top = np.flatnonzero(touches).astype(np.int32)
    else:
        touches = np.zeros(topo.connectivity.shape[0], bool)
        all_top = np.zeros(0, dtype=np.int32)
    return SurfInfo(
        ntop=len(top_nodes), etop=len(bf),
        top_nodes=jnp.asarray(top_nodes),
        top_mask_f=jnp.asarray(mask),
        facet_nodes=jnp.asarray(facet_nodes),
        top_elems=jnp.asarray(top_elems),
        all_top_elems=jnp.asarray(all_top),
        top_elem_mask=jnp.asarray(touches.astype(np.float64)))


def surface_dh_2d(coord, surf: SurfInfo, surf_diff, dt, base_level,
                  ratio_terrig, ratio_marine, halo_exchange=None):
    """1D FD topography diffusion (bc.cxx:990-1073 2D branches).
    Returns dh as a full (nnode,) array (zero off-surface).

    ``halo_exchange`` (halo-sharded step): facets are per-shard subsets
    (padded rows zeroed by surf.facet_mask); the per-node edge sums are
    overlap-exchanged so every window row sees both shards' edges, then
    the dh formula is elementwise — identical across window copies."""
    nnode = coord.shape[0]
    n0 = surf.facet_nodes[:, 0]
    n1 = surf.facet_nodes[:, 1]
    dx = jnp.abs(coord[n1, 0] - coord[n0, 0])
    safe_edge = jnp.where(dx > 0, dx, 1.0)
    slope = (coord[n1, 1] - coord[n0, 1]) / safe_edge
    if surf.facet_mask is not None:
        dx = dx * surf.facet_mask
        slope = slope * surf.facet_mask
    # per-edge contributions: node0 gets -slope, node1 gets +slope
    total_slope = (jnp.zeros(nnode, dtype=coord.dtype)
                   .at[n0].add(-slope).at[n1].add(slope))
    total_dx = (jnp.zeros(nnode, dtype=coord.dtype)
                .at[n0].add(dx).at[n1].add(dx))
    if halo_exchange is not None:
        total_slope = halo_exchange(total_slope[:, None])[:, 0]
        total_dx = halo_exchange(total_dx[:, None])[:, 0]
    safe_dx = jnp.where(total_dx > 0, total_dx, 1.0)
    conv = surf_diff * dt * total_slope / safe_dx
    z = coord[:, 1]
    # terrigenous/marine diffusivity ratios around base level (bc.cxx:1060s)
    dh = jnp.where((z > base_level) & (conv > 0), -ratio_terrig * conv,
                   jnp.where((z <= base_level) & (conv < 0),
                             -ratio_marine * conv, -conv))
    return dh * surf.top_mask_f.astype(coord.dtype)


def surface_dh_3d(coord, surf: SurfInfo, surf_diff, dt,
                  halo_exchange=None):
    """Facet-FEM topography diffusion (bc.cxx:920-1050 3D branches)."""
    nnode = coord.shape[0]
    f = surf.facet_nodes  # (etop, 3)
    p0, p1, p2 = coord[f[:, 0]], coord[f[:, 1]], coord[f[:, 2]]
    d01 = p1 - p0
    d02 = p2 - p0
    nz = d01[:, 0] * d02[:, 1] - d01[:, 1] * d02[:, 0]
    parea = 0.5 * nz  # area projected on the horizontal plane
    # padded per-shard facet rows are degenerate (all nodes 0) -> parea=0;
    # guard the division, the mask below zeroes their contributions
    iv = 1.0 / (2.0 * jnp.where(parea != 0, parea, 1.0))
    shp2dx = jnp.stack([iv * (p1[:, 1] - p2[:, 1]),
                        iv * (p2[:, 1] - p0[:, 1]),
                        iv * (p0[:, 1] - p1[:, 1])], axis=1)
    shp2dy = jnp.stack([iv * (p2[:, 0] - p1[:, 0]),
                        iv * (p0[:, 0] - p2[:, 0]),
                        iv * (p1[:, 0] - p0[:, 0])], axis=1)
    zf = jnp.stack([p0[:, 2], p1[:, 2], p2[:, 2]], axis=1)  # (etop, 3)
    # slope_j = sum_k (dx_j dx_k + dy_j dy_k) z_k * parea
    gx = (shp2dx * zf).sum(axis=1)
    gy = (shp2dy * zf).sum(axis=1)
    slope = (shp2dx * gx[:, None] + shp2dy * gy[:, None]) * parea[:, None]
    if surf.facet_mask is not None:
        slope = slope * surf.facet_mask[:, None]
        parea = parea * surf.facet_mask

    total_slope = jnp.zeros(nnode, dtype=coord.dtype)
    total_dx = jnp.zeros(nnode, dtype=coord.dtype)
    for j in range(3):
        total_slope = total_slope.at[f[:, j]].add(slope[:, j])
        total_dx = total_dx.at[f[:, j]].add(parea)
    if halo_exchange is not None:
        total_slope = halo_exchange(total_slope[:, None])[:, 0]
        total_dx = halo_exchange(total_dx[:, None])[:, 0]
    safe_dx = jnp.where(total_dx > 0, total_dx, 1.0)
    conv = surf_diff * dt * total_slope / safe_dx
    return -conv * surf.top_mask_f.astype(coord.dtype)


def _find_basin(depth, side: int):
    """First (side 0) / last (side 1) submerged run bounded by land
    (find_basin, bc.cxx:1389-1436).  depth > 0 = below base level.
    Returns (b0, b1, found) as traced scalars; indices into the sorted
    top-node arrays."""
    n = depth.shape[0]
    bnd = depth[:-1] * depth[1:]
    idx = jnp.arange(n - 1)
    if side == 0:
        start_mask = (bnd <= 0.0) & (depth[:-1] < 0.0)
        i0 = jnp.argmax(start_mask)
        b0 = i0 + 1
        end_mask = (bnd <= 0.0) & (depth[1:] < 0.0) & (idx >= b0)
        b1 = jnp.argmax(end_mask)
        return b0, b1, start_mask.any() & end_mask.any()
    end_mask = (bnd <= 0.0) & (depth[1:] < 0.0)
    b1 = n - 2 - jnp.argmax(end_mask[::-1])
    start_mask = (bnd <= 0.0) & (depth[:-1] < 0.0) & (idx < b1)
    b0 = n - 2 - jnp.argmax(start_mask[::-1]) + 1
    return b0, b1, start_mask.any() & end_mask.any()


def terrigenous_dh(param, x_top, z_top, dt):
    """Depth-dependent terrigenous basin-fill sedimentation
    (terrigenous_deposition + terrigenous_diffusion, bc.cxx:1341-1589),
    2D only.  Source runs from both sides; each side fills the nearest
    basin over 10 adaptive sub-cycles.  Returns dh over the sorted top
    nodes (ntop,)."""
    ctrl = param.control
    S0 = ctrl.terrig_sediment_area
    C0 = ctrl.terrig_sediment_diffusivity
    C1 = ctrl.terrig_depth_coefficient
    iters = 10
    ntop = x_top.shape[0]
    ar = jnp.arange(ntop)
    top_depth = ctrl.surf_base_level - z_top
    xm1 = jnp.roll(x_top, 1)
    xp1 = jnp.roll(x_top, -1)
    dxm = jnp.abs(xp1 - xm1) / 2.0  # basin_dx at node m (interior only)

    no_basin_at_all = top_depth.max() * top_depth.min() >= 0.0

    def run_side(side, dh0):
        def cycle(_, carry):
            dh_tmp, dt_next = carry
            depth_tmp = top_depth - dh_tmp
            b0, b1, found = _find_basin(depth_tmp, side)
            in_basin = (ar >= b0) & (ar <= b1) & found
            dt_cycle = jnp.where(dt_next > 0.0, dt_next, dt / iters)
            area = jnp.where(in_basin,
                             dxm * (depth_tmp + 1e-2), 0.0).sum()
            area_ref = S0 * dt_cycle
            fill = area <= area_ref
            dt_next_new = jnp.where(
                found & fill, dt_cycle * (1.0 - area / area_ref), 0.0)

            # segment slopes with the source-side flux BC
            # (terrigenous_diffusion, bc.cxx:1352-1361)
            seg = -(depth_tmp[1:] - depth_tmp[:-1]) \
                / (x_top[1:] - x_top[:-1])  # slope of segment m..m+1
            idxs = jnp.arange(ntop - 1)
            if side == 0:
                seg = jnp.where(idxs == b0 - 1, -S0 / C0, seg)
            else:
                seg = jnp.where(idxs == b1, S0 / C0, seg)
            # dh[m] = dt C0 exp(-C1 depth[m]) (seg[m] - seg[m-1]) / dx[m]
            # (seg[k] = slope of segment k..k+1; interior nodes only —
            # the basin bounds guarantee 1 <= b0 <= b1 <= ntop-2)
            dslope = jnp.zeros(ntop, dtype=x_top.dtype) \
                .at[1:-1].set(seg[1:] - seg[:-1])
            dh_d = dt_cycle * C0 * jnp.exp(-C1 * depth_tmp) \
                * dslope / jnp.where(dxm != 0, dxm, 1.0)
            # multi-node basin: zero the far-end node (bc.cxx:1367-1372)
            far = b1 if side == 0 else b0
            dh_d = jnp.where((ar == far) & (b1 > b0), 0.0, dh_d)
            dh_d = jnp.clip(dh_d, 0.0, None)
            dh_d = jnp.where(dh_d > depth_tmp, depth_tmp + 1e-2, dh_d)
            dh_b = jnp.where(fill, depth_tmp + 1e-2, dh_d)
            return dh_tmp + jnp.where(in_basin, dh_b, 0.0), dt_next_new

        out, _ = jax.lax.fori_loop(0, iters, cycle,
                                   (dh0, jnp.zeros((), x_top.dtype)))
        return out

    dh = run_side(0, jnp.zeros_like(x_top))
    dh = run_side(1, dh)
    return jnp.where(no_basin_at_all, 0.0, dh)


def hemipelagic_dh(param, z_top, dt):
    """Hemipelagic + pelagic sedimentation, Emmerich et al. 2009
    (hemipelagic_deposition, bc.cxx:1438-1474).  Returns dh (ntop,)."""
    ctrl = param.control
    depth = ctrl.surf_base_level - z_top
    dhi = (ctrl.hemipelagic_sedimentation_rate * dt
           * jnp.exp(-((depth - ctrl.hemipelagic_max_depth)
                       / ctrl.hemipelagic_width) ** 2)
           + ctrl.pelagic_sedimentation_rate * dt
           * (1.0 - jnp.exp(-(depth / ctrl.pelagic_increasing_width) ** 2)))
    return jnp.where(depth > 0.0, dhi, 0.0)


def apply_surface_processes(param, surf: SurfInfo, coord, dt, dhacc,
                            edvacc_surf, halo_exchange=None):
    """One step of surface processes (surface_processes, bc.cxx:1667-1831).

    Takes post-advection coordinates; returns
    (coord, dhacc, edvacc_surf, dh).

    ``halo_exchange`` (halo-sharded step, option 1 only — option 102's
    basin scan is a global serial reduction and stays on the GSPMD
    path): surf carries per-shard facet subsets; the edge scatters are
    overlap-exchanged inside surface_dh_*, everything downstream is
    elementwise/per-owned-facet."""
    ctrl = param.control
    ndims = coord.shape[1]
    opt = ctrl.surface_process_option

    if opt in (1, 102):
        if ndims == 2:
            dh = surface_dh_2d(coord, surf, ctrl.surface_diffusivity, dt,
                               ctrl.surf_base_level,
                               ctrl.surf_diff_ratio_terrig,
                               ctrl.surf_diff_ratio_marine,
                               halo_exchange=halo_exchange)
        else:
            dh = surface_dh_3d(coord, surf, ctrl.surface_diffusivity, dt,
                               halo_exchange=halo_exchange)
    else:
        dh = jnp.zeros(coord.shape[0], dtype=coord.dtype)

    if opt == 102 and ndims == 2:
        # diffusion + terrigenous basin fill + hemi/pelagic rain
        # (surface_processes case 102, bc.cxx:1810-1822); top_nodes are
        # x-sorted so the basin scan is well-defined
        # the reference computes both from the PRE-diffusion coordinates
        # (dh is only applied to coord after all contributions accumulate)
        x_top = coord[surf.top_nodes, 0]
        z_top = coord[surf.top_nodes, 1]
        dh_top = terrigenous_dh(param, x_top, z_top, dt)
        if (ctrl.hemipelagic_sedimentation_rate > 0.0
                or ctrl.pelagic_sedimentation_rate > 0.0):
            dh_top = dh_top + hemipelagic_dh(param, z_top, dt)
        dh = dh.at[surf.top_nodes].add(dh_top)

    coord2 = coord.at[:, ndims - 1].add(dh)
    dhacc2 = dhacc + dh

    # per-facet deposited volume (bc.cxx:1745-1760)
    f = surf.facet_nodes
    dh_e = dh[f].sum(axis=1)
    if ndims == 2:
        base = jnp.abs(coord2[f[:, 1], 0] - coord2[f[:, 0], 0])
    else:
        d01 = coord2[f[:, 1]] - coord2[f[:, 0]]
        d02 = coord2[f[:, 2]] - coord2[f[:, 0]]
        base = 0.5 * (d01[:, 0] * d02[:, 1] - d01[:, 1] * d02[:, 0])
    dv = dh_e * base / ndims
    if surf.facet_mask is not None:
        dv = dv * surf.facet_mask
    edvacc2 = edvacc_surf + dv
    return coord2, dhacc2, edvacc2, dh


def correct_surface_elements(surf: SurfInfo, volume_new, volume_pre,
                             stress, strain, strain_rate, plstrain):
    """Surface-element volume correction (correct_surface_element,
    bc.cxx:1613-1665).  For every element touching a top node: scale
    stress/strain/strain_rate/plstrain by 1/rdv when the element grew
    (rdv = V_new/V_old >= 1), and write the new volume into the pre-swap
    volume array — so the subsequent volume/volume_old swap leaves
    volume_old[top] = V_new, making the next step's maxwell dv zero for
    surface elements.  Returns the mutated pre-swap volume as well."""
    # elementwise via the top-element mask (no scatter: TPU-friendly and
    # element-shardable under shard_map)
    top = surf.top_elem_mask > 0
    rdv = volume_new / volume_pre
    scale = jnp.where(top & (rdv >= 1.0), 1.0 / rdv, 1.0)
    stress = stress * scale[:, None]
    strain = strain * scale[:, None]
    strain_rate = strain_rate * scale[:, None]
    plstrain = plstrain * scale
    volume_mut = jnp.where(top, volume_new, volume_pre)
    return stress, strain, strain_rate, plstrain, volume_mut


def surface_plstrain_decay(surf: SurfInfo, plstrain, emw, dt,
                           mattype_oceanic_crust: int, apply: jnp.ndarray):
    """Exponential decay of surface plastic strain (anti-landslide,
    bc.cxx:1593-1613), skipped for oceanic-crust elements."""
    lam = LN2 / PLSTRAIN_HALF_LIFE
    top = surf.top_elem_mask > 0
    dominant = jnp.argmax(emw, axis=1)
    dec = jnp.where(top & (dominant != mattype_oceanic_crust),
                    plstrain * lam * dt, 0.0)
    return plstrain - jnp.where(apply, dec, 0.0)
