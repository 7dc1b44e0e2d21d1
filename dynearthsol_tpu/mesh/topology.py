"""Mesh topology derivation: boundary flags/nodes/facets and the
element->node assembly permutation.

Replaces the reference's create_boundary_flags / create_boundary_nodes /
create_boundary_facets / create_support (mesh.cxx:2811-3281).  The reference
assembles element contributions to nodes via a two-phase gather over a
node->element "support" list; the TPU-native equivalent is a *sorted
segment-sum*: each (element, local-corner) slot is pre-sorted by its global
node id once at topology-build time, so the per-step assembly is one gather +
one `jax.ops.segment_sum` with ``indices_are_sorted=True`` — deterministic,
contiguous and XLA-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..constants import (BOUNDX0, BOUNDX1, BOUNDY0, BOUNDY1, BOUNDZ0, BOUNDZ1,
                         IBOUNDX0, IBOUNDX1, IBOUNDY0, IBOUNDY1, IBOUNDZ0,
                         IBOUNDZ1, NBDRYTYPES, dim)
from .generate import MeshData


@dataclass
class Topology:
    """Static (per-mesh) topology arrays, all host numpy.

    Attributes
    ----------
    bcflag : (nnode,) uint32 boundary membership bits (mesh.cxx:2811).
    bnodes : per-boundary node-id lists (mesh.cxx:2828).
    bfacets : per-boundary (elem, facet) pairs (mesh.cxx:3114-3236).
    gather_idx / gather_mask : padded per-node support table — for node n,
        gather_idx[n, k] indexes into the flattened (nelem*npe) corner-slot
        array; gather_mask[n, k] marks valid entries.  This is the CSR
        support of mesh.cxx:3240-3281 padded to the max node degree so the
        per-step assembly is a dense GATHER + masked sum — scatters are
        serial on the TPU, gathers are vectorized.
    asm_perm : permutation sorting the flattened (nelem*npe) corner slots by
        global node id; asm_node_ids = conn.ravel()[asm_perm] is sorted
        (kept for segment-sum fallback / remap bookkeeping).
    """

    ndims: int
    nnode: int
    nelem: int
    connectivity: np.ndarray  # (nelem, npe) int32
    bcflag: np.ndarray  # (nnode,) uint32
    bnodes: List[np.ndarray]  # NBDRYTYPES lists
    bfacets: List[np.ndarray]  # NBDRYTYPES arrays of (elem, facet) pairs
    asm_perm: np.ndarray  # (nelem*npe,) int32
    asm_node_ids: np.ndarray  # (nelem*npe,) int32, sorted
    gather_idx: np.ndarray  # (nnode, max_degree) int32
    gather_mask: np.ndarray  # (nnode, max_degree) bool
    segment: np.ndarray = None  # (nseg, ndims) int32 boundary facet nodes
    segflag: np.ndarray = None  # (nseg,) int32 boundary bit of each segment
    support: Dict[int, List[int]] = field(default_factory=dict)

    @property
    def nseg(self) -> int:
        return 0 if self.segment is None else self.segment.shape[0]


def _boundary_facets(conn: np.ndarray, npe: int) -> np.ndarray:
    """Return (nelem, facets_per_elem) bool: facet f of elem e is on the
    domain boundary (not shared with another element)."""
    nelem = conn.shape[0]
    nof = dim(npe - 1).node_of_facet
    keys = {}
    for f, locs in enumerate(nof):
        fac = np.sort(conn[:, list(locs)], axis=1)
        for e in range(nelem):
            key = tuple(fac[e])
            keys[key] = keys.get(key, 0) + 1
    onb = np.zeros((nelem, len(nof)), dtype=bool)
    for f, locs in enumerate(nof):
        fac = np.sort(conn[:, list(locs)], axis=1)
        for e in range(nelem):
            onb[e, f] = keys[tuple(fac[e])] == 1
    return onb


def build_topology(mesh: MeshData, xlength: float, ylength: float,
                   zlength: float, tol_rel: float = 1e-9) -> Topology:
    """Derive node boundary flags and boundary facets from coordinates.

    The reference flags nodes from mesher segment attributes; a box domain is
    equivalent to coordinate tests at generation time.  Flags persist through
    the Lagrangian motion (they are material labels, mesh.cxx:2811-2854).
    """
    ndims = mesh.ndims
    coord, conn = mesh.coord, mesh.connectivity
    nnode, nelem = mesh.nnode, mesh.nelem
    d = dim(ndims)

    tolx = tol_rel * max(xlength, 1.0)
    tolz = tol_rel * max(zlength, 1.0)
    bcflag = np.zeros(nnode, dtype=np.uint32)
    x = coord[:, 0]
    z = coord[:, ndims - 1]
    bcflag[np.abs(x - 0.0) < tolx] |= BOUNDX0
    bcflag[np.abs(x - xlength) < tolx] |= BOUNDX1
    if ndims == 3:
        toly = tol_rel * max(ylength, 1.0)
        y = coord[:, 1]
        bcflag[np.abs(y - 0.0) < toly] |= BOUNDY0
        bcflag[np.abs(y - ylength) < toly] |= BOUNDY1
    bcflag[np.abs(z + zlength) < tolz] |= BOUNDZ0
    bcflag[np.abs(z - 0.0) < tolz] |= BOUNDZ1

    # internal segments kept by the mesher (mesh.is_discarding_internal_
    # segments = False, mesh.cxx:3442): append them to the derived
    # boundary segments so they persist through checkpoints like the
    # reference's var.segment does
    return finish_topology(ndims, conn, bcflag,
                           extra_segment=mesh.segment,
                           extra_segflag=mesh.segflag)


def finish_topology(ndims: int, conn: np.ndarray, bcflag: np.ndarray,
                    extra_segment: np.ndarray = None,
                    extra_segflag: np.ndarray = None) -> Topology:
    """Derive everything downstream of (conn, bcflag): boundary node lists,
    boundary facets, segments, and the assembly gather tables.  Shared by
    initial meshing, remeshing, and the restart path."""
    nnode = bcflag.shape[0]
    nelem = conn.shape[0]
    d = dim(ndims)

    bnodes = [np.nonzero(bcflag & (1 << i))[0].astype(np.int32)
              for i in range(NBDRYTYPES)]

    # boundary facets: all facet nodes carry the boundary bit AND the facet
    # is unshared (mesh.cxx:3114-3236)
    onb = _boundary_facets(conn, d.nodes_per_elem)
    nof = d.node_of_facet
    bfacets: List[np.ndarray] = []
    for i in range(NBDRYTYPES):
        pairs = []
        if i < 6:
            bit = 1 << i
            for f, locs in enumerate(nof):
                fnodes = conn[:, list(locs)]
                allb = (bcflag[fnodes] & bit).astype(bool).all(axis=1)
                sel = np.nonzero(allb & onb[:, f])[0]
                pairs.extend((e, f) for e in sel)
        arr = (np.asarray(sorted(pairs), dtype=np.int32).reshape(-1, 2)
               if pairs else np.zeros((0, 2), dtype=np.int32))
        bfacets.append(arr)

    # boundary segments (2D: edges, 3D: tri facets) with flags, the
    # equivalent of the mesher's segment/segflag output (mesh.cxx:2811)
    seen = set()
    segs: List[tuple] = []
    segflags: List[int] = []
    for i in range(NBDRYTYPES):
        for e, f in bfacets[i]:
            nodes = tuple(conn[e, list(nof[f])])
            key = tuple(sorted(nodes))
            if key in seen:
                continue
            seen.add(key)
            segs.append(nodes)
            segflags.append(1 << i)
    segment = (np.asarray(segs, dtype=np.int32) if segs
               else np.zeros((0, ndims), dtype=np.int32))
    segflag = np.asarray(segflags, dtype=np.int32)
    if extra_segment is not None and len(extra_segment):
        segment = np.concatenate(
            [segment, np.asarray(extra_segment, dtype=np.int32)])
        segflag = np.concatenate(
            [segflag, np.zeros(len(extra_segment), dtype=np.int32)
             if extra_segflag is None
             else np.asarray(extra_segflag, dtype=np.int32)])

    flat = conn.ravel().astype(np.int32)
    asm_perm = np.argsort(flat, kind="stable").astype(np.int32)
    asm_node_ids = flat[asm_perm]

    # padded per-node support table (gather-based assembly)
    counts = np.bincount(flat, minlength=nnode)
    max_deg = int(counts.max())
    gather_idx = np.zeros((nnode, max_deg), dtype=np.int32)
    gather_mask = np.zeros((nnode, max_deg), dtype=bool)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # position of each sorted slot within its node's run
    pos_in_run = np.arange(flat.size) - starts[asm_node_ids]
    gather_idx[asm_node_ids, pos_in_run] = asm_perm
    gather_mask[asm_node_ids, pos_in_run] = True

    return Topology(ndims=ndims, nnode=nnode, nelem=nelem,
                    connectivity=conn.astype(np.int32), bcflag=bcflag,
                    bnodes=bnodes, bfacets=bfacets,
                    asm_perm=asm_perm, asm_node_ids=asm_node_ids,
                    gather_idx=gather_idx, gather_mask=gather_mask,
                    segment=segment, segflag=segflag)


def build_topology_from_arrays(ndims: int, conn: np.ndarray,
                               bcflag: np.ndarray, segment: np.ndarray,
                               segflag: np.ndarray) -> Topology:
    """Rebuild topology from checkpointed arrays (restart path,
    dynearthsol.cxx:284-306): node flags and segments come from the files —
    the mesh has deformed, so coordinate tests would mislabel boundaries."""
    nnode = bcflag.shape[0]
    nelem = conn.shape[0]
    d = dim(ndims)
    nof = d.node_of_facet

    bnodes = [np.nonzero(bcflag & (1 << i))[0].astype(np.int32)
              for i in range(NBDRYTYPES)]

    # map facet node-sets -> (elem, facet)
    owner = {}
    for f, locs in enumerate(nof):
        fac = np.sort(conn[:, list(locs)], axis=1)
        for e in range(nelem):
            owner[tuple(fac[e])] = (e, f)
    bfacets: List[np.ndarray] = []
    for i in range(NBDRYTYPES):
        sel = np.nonzero(segflag == (1 << i))[0]
        pairs = sorted(owner[tuple(sorted(segment[s]))] for s in sel
                       if tuple(sorted(segment[s])) in owner)
        arr = (np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
               if pairs else np.zeros((0, 2), dtype=np.int32))
        bfacets.append(arr)

    flat = conn.ravel().astype(np.int32)
    asm_perm = np.argsort(flat, kind="stable").astype(np.int32)
    asm_node_ids = flat[asm_perm]
    counts = np.bincount(flat, minlength=nnode)
    max_deg = int(counts.max())
    gather_idx = np.zeros((nnode, max_deg), dtype=np.int32)
    gather_mask = np.zeros((nnode, max_deg), dtype=bool)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_in_run = np.arange(flat.size) - starts[asm_node_ids]
    gather_idx[asm_node_ids, pos_in_run] = asm_perm
    gather_mask[asm_node_ids, pos_in_run] = True

    return Topology(ndims=ndims, nnode=nnode, nelem=nelem,
                    connectivity=conn.astype(np.int32),
                    bcflag=bcflag.astype(np.uint32),
                    bnodes=bnodes, bfacets=bfacets,
                    asm_perm=asm_perm, asm_node_ids=asm_node_ids,
                    gather_idx=gather_idx, gather_mask=gather_mask,
                    segment=segment.astype(np.int32),
                    segflag=segflag.astype(np.int32))
