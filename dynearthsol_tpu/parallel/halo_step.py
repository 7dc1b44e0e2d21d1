"""Node-sharded multi-chip step: contiguous node windows + halo exchange.

The replicated-nodal shard_map path (shard_step.py) psums a full-length
nodal buffer per assembly — O(nnode) ICI traffic per step and no nodal
memory scaling.  This module implements the domain decomposition SURVEY
§2.3/§5.8 actually calls for:

* Nodes are partitioned into ``ndev`` CONTIGUOUS blocks of B rows in the
  renumbered order (mesh/generate.py renumbers along the longest axis,
  so index distance tracks spatial distance and element supports span a
  bounded index range H = max over elements of ``max(conn)-min(conn)``).
* Each device owns block d and holds a window of W = B + 2H rows
  [d*B - H, (d+1)*B + H); every element is assigned to the shard owning
  its smallest corner node, so all its corners fall inside that shard's
  window (proof: corners lie in [min, min+H] ⊂ [d*B - H, (d+1)*B + H)).
* The element->node assembly scatters into the local window, then
  exchanges only the 2H-row overlap slabs with the two neighbours
  (ops/assembly.node_sum_halo) — O(cut surface) traffic on the ICI
  instead of O(nnode).
* Overlap rows are computed by both owners from identical complete sums
  (a two-term IEEE add is commutative), so all downstream elementwise
  nodal updates (velocity, coordinates, vbcs) stay bit-identical across
  the overlap with NO second exchange per step.

Facet-based terms (boundary tractions bc.cxx:632-875, surface diffusion
bc.cxx:879-1074) ride the same machinery: facets are partitioned by
their owning element's shard into padded per-shard tables, their
scattered partial sums go through a SECOND overlap exchange
(ops/assembly.halo_overlap_add), and every window row again ends up a
commutative two-term sum — bit-identical across copies.

Supported feature set: the full production loop — all rheologies incl.
RSF, thermal + hydraulic diffusion, damping, vbcs, PT, NMD, Winkler/
water/lithostatic/Neumann tractions, surface processes option 1.
Option 102's terrigenous basin fill (a serial scan over the x-sorted
global surface) and GoSPL coupling (option 11, host calls) use the
GSPMD path.

Reference mapping: this replaces the reference's OpenMP shared-memory
assembly (elem_cache + node-support gather, fields.cxx:612-703) with an
explicit distributed-memory decomposition the reference never had.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.assembly import HaloSpec
from ..simulation import StepCtx, make_step_fn
from ..state import State

AXIS = "e"

# element State fields that default to 1.0 on shard-padding rows (so the
# maxwell dv = volume/volume_old and material mixing stay finite there)
_ELEM_ONE = {"volume", "volume_old", "emw"}


def _supported(param, ctx) -> None:
    if param.control.surface_process_option not in (0, 1):
        # option 102's terrigenous basin fill is a serial scan over the
        # x-sorted surface (global coupling); option 11 couples to GoSPL
        # on host.  Those use the GSPMD path.
        raise NotImplementedError(
            "surface process option != 0/1 uses the GSPMD path, not the "
            "halo step")


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Host-side partition bookkeeping (numpy, built once per mesh)."""

    ndev: int
    nnode: int
    nelem: int
    h: int                 # halo rows per side
    block: int             # owned rows per device (B)
    width: int             # window rows per device (B + 2H)
    eperm: np.ndarray      # (ndev, E) global element id, -1 = padding
    win_idx: np.ndarray    # (ndev, W) clipped global node row per window
    own_mask: np.ndarray   # (ndev, W) 1.0 where the row is owned & real
    valid: np.ndarray      # (ndev, W) True where the row is a real node
    shard_of_elem: np.ndarray  # (nelem,) owning shard of each element
    eslot: np.ndarray      # (nelem,) slot of each element in its eperm row
    # top-facet partition by owning element's shard (None when etop == 0);
    # also the layout of the sharded edvacc_surf state field
    sperm: np.ndarray | None = None  # (ndev, S) global facet id, -1 = pad


def _partition(shard_of: np.ndarray, ndev: int) -> np.ndarray:
    """Stable partition of item ids by shard: (ndev, F) global id, -1
    padding, F = max per-shard count (>= 1 so facet tables stay
    non-empty under jit)."""
    counts = np.bincount(shard_of, minlength=ndev)
    fmax = max(int(counts.max()) if counts.size else 0, 1)
    perm = np.full((ndev, fmax), -1, dtype=np.int64)
    order = np.argsort(shard_of, kind="stable")
    off = 0
    for d in range(ndev):
        perm[d, :counts[d]] = order[off:off + counts[d]]
        off += counts[d]
    return perm


def _take_facets(perm: np.ndarray, arr, fill=0) -> np.ndarray:
    """Gather per-facet rows through a partition table; padded rows get
    ``fill``."""
    a = np.asarray(arr)
    out = a[np.where(perm < 0, 0, perm)]
    m = (perm >= 0).reshape(perm.shape + (1,) * (a.ndim - 1))
    return np.where(m, out, np.asarray(fill, dtype=a.dtype))


def build_plan(ctx, ndev: int) -> HaloPlan:
    conn = np.asarray(ctx.conn)
    nnode, nelem = int(ctx.nnode), int(ctx.nelem)
    spread = int((conn.max(axis=1) - conn.min(axis=1)).max())
    h = spread
    block = math.ceil(nnode / ndev)
    if block < 2 * h:
        raise NotImplementedError(
            f"halo step needs block >= 2*halo rows (block={block}, "
            f"h={h}): mesh too small for {ndev} devices or numbering "
            "not local enough")
    width = block + 2 * h

    shard_of_elem = np.clip(conn.min(axis=1) // block, 0, ndev - 1)
    eperm = _partition(shard_of_elem, ndev)
    counts = np.bincount(shard_of_elem, minlength=ndev)
    eslot = np.zeros(nelem, dtype=np.int64)
    for d in range(ndev):
        ids = eperm[d, :counts[d]]
        eslot[ids] = np.arange(ids.size)

    sperm = None
    if int(ctx.surf.etop) > 0:
        sperm = _partition(
            shard_of_elem[np.asarray(ctx.surf.top_elems)], ndev)

    base = np.arange(ndev)[:, None] * block - h            # (ndev, 1)
    idx = base + np.arange(width)[None, :]                 # (ndev, W)
    valid = (idx >= 0) & (idx < nnode)
    own = valid & (idx >= np.arange(ndev)[:, None] * block) \
        & (idx < (np.arange(ndev)[:, None] + 1) * block)
    win_idx = np.clip(idx, 0, nnode - 1)

    # every element's corners must land in its shard's window
    for d in range(ndev):
        ids = eperm[d, :counts[d]]
        if ids.size:
            loc = conn[ids] - (d * block - h)
            assert loc.min() >= 0 and loc.max() < width, \
                "element corners escape the shard window"
    return HaloPlan(ndev=ndev, nnode=nnode, nelem=nelem, h=h,
                    block=block, width=width, eperm=eperm,
                    win_idx=win_idx, own_mask=own.astype(np.float64),
                    valid=valid, shard_of_elem=shard_of_elem,
                    eslot=eslot, sperm=sperm)


def _window_nodal(a, plan: HaloPlan, zero_invalid: bool = False):
    """(nnode, ...) -> stacked windows (ndev, W, ...).

    Non-real rows (window clipped at the array ends) duplicate the edge
    node; for indicator/mask arrays that duplication would re-activate a
    boundary node on the dead rows, so ``zero_invalid`` clears them."""
    arr = np.asarray(a)
    out = arr[plan.win_idx]
    if zero_invalid:
        v = plan.valid.reshape(plan.valid.shape + (1,) * (arr.ndim - 1))
        out = np.where(v, out, np.zeros((), dtype=arr.dtype))
    return jnp.asarray(out)


def _shard_elem(a, plan: HaloPlan, name: str = ""):
    """(nelem, ...) -> stacked shards (ndev, E, ...), padded rows
    defaulted (volume-like fields get 1.0)."""
    arr = np.asarray(a)
    out = arr[np.where(plan.eperm < 0, 0, plan.eperm)]
    if name in _ELEM_ONE:
        out = np.where((plan.eperm < 0).reshape(
            plan.eperm.shape + (1,) * (arr.ndim - 1)), 1.0, out)
    return jnp.asarray(out, dtype=arr.dtype)


def _spec_by_shape(tree, nnode: int):
    """Spec tree for a nested pytree: window (P(AXIS)) every array leaf
    with leading dim == nnode, replicate the rest."""
    return jax.tree.map(
        lambda leaf: P(AXIS) if (hasattr(leaf, "shape") and leaf.ndim >= 1
                                 and leaf.shape[0] == nnode) else P(),
        tree)


def _window_by_shape(tree, plan: HaloPlan, nnode: int):
    """Window nodal leaves; boolean leaves are node masks — clear their
    dead (clip-duplicated) rows so boundary extents don't re-count the
    edge node."""
    return jax.tree.map(
        lambda leaf: _window_nodal(
            leaf, plan,
            zero_invalid=np.asarray(leaf).dtype == np.bool_)
        if (hasattr(leaf, "shape") and leaf.ndim >= 1
            and leaf.shape[0] == nnode) else leaf,
        tree)


def build_halo_ctx(sim, plan: HaloPlan):
    """Stacked (leading ndev axis on sharded leaves) ctx + its spec tree.

    Facet tables (boundary tractions ctx.sbc, surface facets ctx.surf)
    are PARTITIONED by shard — grav/surface facets by their owning
    element's shard, Neumann facets by their smallest node's block — and
    padded to the max per-shard count with mask rows.  Facet node ids
    translate to window-local rows (they fit: a facet's nodes are corners
    of one element, whose span is <= h, so nodes lie in
    [d*block, (d+1)*block + h) ⊂ the shard window); facet element ids
    translate to local eperm slots.  Their scattered contributions go
    through a second overlap exchange inside the step (see
    ops/assembly.halo_overlap_add)."""
    ctx = sim.ctx
    nnode = plan.nnode
    fdt = np.asarray(sim.state.coord).dtype  # mask dtype = force dtype
    off = np.arange(plan.ndev) * plan.block - plan.h  # window starts

    conn = np.asarray(ctx.conn)
    conn_l = conn[np.where(plan.eperm < 0, 0, plan.eperm)] \
        - (np.arange(plan.ndev)[:, None, None] * plan.block - plan.h)
    conn_l = np.where((plan.eperm < 0)[:, :, None], 0, conn_l)
    elem_mask = jnp.asarray((plan.eperm >= 0),
                            dtype=np.asarray(ctx.elem_mask).dtype)

    def _local_nodes(perm, facet_nodes):
        m = perm >= 0
        fn = _take_facets(perm, facet_nodes)
        return jnp.asarray(
            np.where(m[:, :, None], fn - off[:, None, None], 0),
            dtype=np.asarray(facet_nodes).dtype)

    # --- traction facet tables, partitioned per shard -------------------
    sbc2 = _window_by_shape(ctx.sbc, plan, nnode)  # windows z0_mask
    if int(ctx.sbc.n_grav) > 0:
        fel = np.asarray(ctx.sbc.facet_elem)
        gperm = _partition(plan.shard_of_elem[fel], plan.ndev)
        sbc2 = dataclasses.replace(
            sbc2, n_grav=int(gperm.shape[1]),
            facet_nodes=_local_nodes(gperm, ctx.sbc.facet_nodes),
            facet_elem=jnp.asarray(_take_facets(gperm, plan.eslot[fel]),
                                   dtype=np.asarray(fel).dtype),
            kind=jnp.asarray(_take_facets(gperm, ctx.sbc.kind)),
            grav_mask=jnp.asarray((gperm >= 0).astype(fdt)))
    if int(ctx.sbc.n_neu) > 0:
        nfn = np.asarray(ctx.sbc.neu_facet_nodes)
        nperm = _partition(
            np.clip(nfn.min(axis=1) // plan.block, 0, plan.ndev - 1),
            plan.ndev)
        sbc2 = dataclasses.replace(
            sbc2, n_neu=int(nperm.shape[1]),
            neu_facet_nodes=_local_nodes(nperm, nfn),
            neu_dir=jnp.asarray(_take_facets(nperm, ctx.sbc.neu_dir)),
            neu_val=jnp.asarray(_take_facets(nperm, ctx.sbc.neu_val)),
            neu_mask=jnp.asarray((nperm >= 0).astype(fdt)))

    # --- surface facet tables, partitioned per shard --------------------
    surf2 = dataclasses.replace(
        ctx.surf,
        top_mask_f=_window_nodal(ctx.surf.top_mask_f, plan,
                                 zero_invalid=True),
        top_elem_mask=_shard_elem(ctx.surf.top_elem_mask, plan))
    if plan.sperm is not None:
        tel = np.asarray(ctx.surf.top_elems)
        surf2 = dataclasses.replace(
            surf2, etop=int(plan.sperm.shape[1]),
            facet_nodes=_local_nodes(plan.sperm, ctx.surf.facet_nodes),
            top_elems=jnp.asarray(
                _take_facets(plan.sperm, plan.eslot[tel]),
                dtype=tel.dtype),
            facet_mask=jnp.asarray((plan.sperm >= 0).astype(fdt)))

    own_f = jnp.asarray(plan.own_mask,
                        dtype=np.asarray(sim.state.coord).dtype)
    ctx2 = dataclasses.replace(
        ctx,
        nnode=plan.width, nelem=int(plan.eperm.shape[1]),
        conn=jnp.asarray(conn_l, dtype=np.asarray(conn).dtype),
        gather_idx=jnp.zeros((1, 1), dtype=jnp.int32),
        gather_mask=jnp.zeros((1, 1), dtype=bool),
        elem_mask=elem_mask,
        top_mask=_window_nodal(ctx.top_mask, plan, zero_invalid=True),
        pp_bc_mask=_window_nodal(ctx.pp_bc_mask, plan, zero_invalid=True),
        vbc=dataclasses.replace(
            _window_by_shape(ctx.vbc, plan, nnode), axis=AXIS),
        sbc=sbc2,
        surf=surf2,
        axis=AXIS, sgrid=None,
        halo=HaloSpec(own_mask=own_f, h=plan.h, ndev=plan.ndev))

    # spec trees are built from the NEW dataclasses so meta fields
    # (padded per-shard counts n_grav/n_neu/etop) match the ctx tree
    sbc_spec = dataclasses.replace(
        jax.tree.map(lambda _: P(), sbc2), z0_mask=P(AXIS))
    if int(ctx.sbc.n_grav) > 0:
        sbc_spec = dataclasses.replace(
            sbc_spec, facet_nodes=P(AXIS), facet_elem=P(AXIS),
            kind=P(AXIS), grav_mask=P(AXIS))
    if int(ctx.sbc.n_neu) > 0:
        sbc_spec = dataclasses.replace(
            sbc_spec, neu_facet_nodes=P(AXIS), neu_dir=P(AXIS),
            neu_val=P(AXIS), neu_mask=P(AXIS))
    surf_spec = dataclasses.replace(
        jax.tree.map(lambda _: P(), surf2),
        top_mask_f=P(AXIS), top_elem_mask=P(AXIS))
    if plan.sperm is not None:
        surf_spec = dataclasses.replace(
            surf_spec, facet_nodes=P(AXIS), top_elems=P(AXIS),
            facet_mask=P(AXIS))
    specs = dataclasses.replace(
        ctx2,
        conn=P(AXIS), gather_idx=P(), gather_mask=P(),
        elem_mask=P(AXIS), top_mask=P(AXIS), pp_bc_mask=P(AXIS),
        vbc=_spec_by_shape(dataclasses.replace(ctx.vbc, axis=AXIS), nnode),
        sbc=sbc_spec,
        mat=jax.tree.map(lambda _: P(), ctx.mat),
        surf=surf_spec,
        halo=HaloSpec(own_mask=P(AXIS), h=plan.h, ndev=plan.ndev))
    return ctx2, specs


def build_halo_state(sim, plan: HaloPlan):
    """Stacked State + its spec tree.  Nodal fields -> windows, element
    fields -> shard blocks, the per-top-facet surface accumulator
    ``edvacc_surf`` -> facet shards (plan.sperm), scalars replicate."""
    s = sim.state
    nnode, nelem = plan.nnode, plan.nelem
    upd, spec = {}, {}
    for f in dataclasses.fields(s):
        a = getattr(s, f.name)
        if f.name == "edvacc_surf":
            if plan.sperm is not None:
                upd[f.name] = jnp.asarray(_take_facets(plan.sperm, a),
                                          dtype=a.dtype)
                spec[f.name] = P(AXIS)
            else:
                upd[f.name] = a
                spec[f.name] = P()
        elif not hasattr(a, "shape") \
                or a.ndim == 0 or a.shape[0] not in (nnode, nelem):
            upd[f.name] = a
            spec[f.name] = P()
        elif a.shape[0] == nnode:
            upd[f.name] = _window_nodal(a, plan)
            spec[f.name] = P(AXIS)
        else:
            upd[f.name] = _shard_elem(a, plan, f.name)
            spec[f.name] = P(AXIS)
    return State(**upd), State(**spec)


def unpack_state(stacked: State, specs: State, plan: HaloPlan,
                 template: State) -> State:
    """Stacked sharded State -> flat single-device State."""
    upd = {}
    inv = plan.eperm.reshape(-1)
    keep = inv >= 0
    for f in dataclasses.fields(stacked):
        a = getattr(stacked, f.name)
        sp = getattr(specs, f.name)
        t = getattr(template, f.name)
        if sp == P():
            upd[f.name] = a
        elif f.name == "edvacc_surf":
            flat = np.asarray(a).reshape(-1)
            sinv = plan.sperm.reshape(-1)
            skeep = sinv >= 0
            out = np.zeros(t.shape[0], dtype=flat.dtype)
            out[sinv[skeep]] = flat[skeep]
            upd[f.name] = jnp.asarray(out)
        elif hasattr(t, "shape") and t.ndim >= 1 \
                and t.shape[0] == plan.nnode:
            owned = np.asarray(a)[:, plan.h:plan.h + plan.block]
            upd[f.name] = jnp.asarray(
                owned.reshape((-1,) + owned.shape[2:])[:plan.nnode])
        else:
            flat = np.asarray(a).reshape((-1,) + np.asarray(a).shape[2:])
            out = np.zeros((plan.nelem,) + flat.shape[1:], flat.dtype)
            out[inv[keep]] = flat[keep]
            upd[f.name] = jnp.asarray(out)
    return State(**upd)


def make_halo_runner(sim, mesh: Mesh):
    """Build (ctx_stacked, state_stacked, run_chunk, plan, specs).

    run_chunk(ctx, state, n) scans n halo steps under shard_map; nodal
    state stays sharded ~1/ndev (+halo) per device throughout."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    _supported(sim.param, sim.ctx)
    ndev = mesh.devices.size
    plan = build_plan(sim.ctx, ndev)
    ctx2, ctx_specs = build_halo_ctx(sim, plan)
    s2, s_specs = build_halo_state(sim, plan)

    step = make_step_fn(sim.param, sim.compensation_pressure)

    # nodal State fields: their dead window rows (clip-duplicated, no
    # element support) assemble 0 mass and would go 0/0 -> NaN on step 2,
    # then poison the vbc boundary-extent minima; pin them to the step
    # output of a real row's arithmetic shape by zeroing after each step
    nodal_fields = tuple(
        f.name for f in dataclasses.fields(sim.state)
        if f.name != "edvacc_surf"
        and hasattr(getattr(sim.state, f.name), "shape")
        and getattr(sim.state, f.name).ndim >= 1
        and getattr(sim.state, f.name).shape[0] == plan.nnode)
    valid_st = jnp.asarray(plan.valid)  # (ndev, W) bool

    def chunk_local(n, ctx_l, s_l, valid_l):
        squeeze = lambda leaf, sp: leaf[0] if sp == P(AXIS) else leaf
        ctx_1 = jax.tree.map(squeeze, ctx_l, ctx_specs)
        s_1 = jax.tree.map(squeeze, s_l, s_specs)
        valid_1 = valid_l[0]

        def scrub(s):
            upd = {}
            for nm in nodal_fields:
                a = getattr(s, nm)
                v = valid_1.reshape((-1,) + (1,) * (a.ndim - 1))
                # masses fill with 1 so the next step's dead-row
                # divisions stay finite instead of 0/0
                fill = 1.0 if nm in ("mass", "tmass", "hmass", "ymass",
                                     "volume_n") else 0.0
                upd[nm] = jnp.where(v, a, jnp.asarray(fill, a.dtype))
            return dataclasses.replace(s, **upd)

        def body(s, _):
            return scrub(step(ctx_1, s)), None

        out, _ = jax.lax.scan(body, s_1, length=n)
        return jax.tree.map(
            lambda leaf, sp: leaf[None] if sp == P(AXIS) else leaf,
            out, s_specs)

    import functools

    def make(n):
        fn = functools.partial(chunk_local, n)
        specs_in = (ctx_specs, s_specs, P(AXIS))
        try:
            sh = shard_map(fn, mesh=mesh, in_specs=specs_in,
                           out_specs=s_specs, check_vma=False)
        except TypeError:  # older jax uses check_rep
            sh = shard_map(fn, mesh=mesh, in_specs=specs_in,
                           out_specs=s_specs, check_rep=False)
        return jax.jit(sh)

    cache = {}

    def run_chunk(ctx, state, n: int):
        if n not in cache:
            cache[n] = make(n)
        return cache[n](ctx, state, valid_st)

    ctx_sh = jax.device_put(ctx2, jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), ctx_specs))
    state_sh = jax.device_put(s2, jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), s_specs))
    return ctx_sh, state_sh, run_chunk, plan, s_specs


def run_halo(sim, mesh: Mesh, nsteps: int, chunk: int = 100):
    """Run nsteps on the device mesh with node-sharded state; returns the
    final flat state and writes it back to sim.state."""
    ctx_sh, state_sh, run_chunk, plan, s_specs = make_halo_runner(sim, mesh)
    done = 0
    while done < nsteps:
        c = min(chunk, nsteps - done)
        state_sh = run_chunk(ctx_sh, state_sh, c)
        done += c
    out = unpack_state(jax.device_get(state_sh), s_specs, plan, sim.state)
    sim.state = jax.tree.map(jnp.asarray, out)
    return sim.state
