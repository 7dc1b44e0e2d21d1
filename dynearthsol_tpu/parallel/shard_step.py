"""Hand-tuned multi-chip step: shard_map over the element axis.

The domain decomposition (SURVEY §2.3): element arrays shard across devices
on axis 0; nodal arrays replicate; the element->node assembly becomes a
per-shard scatter into a full-length nodal buffer followed by one `psum`
over the ICI — the single true communication pattern of the algorithm
(partial nodal sums on nodes shared between element shards).  Scalar
reductions (dt limits, vmax) ride the same axis via pmin/pmax.

This is the tuned hot path for the core loop (all rheologies, thermal +
hydraulic diffusion, damping, vbcs, PT).  Features that index elements from
replicated facet tables (surface processes, Winkler/water tractions) run
through the general GSPMD path (sharding.py) instead.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..simulation import StepCtx, make_step_fn
from ..state import State

AXIS = "e"

# State fields with a leading ELEMENT axis (everything else replicates)
ELEM_FIELDS = {
    "volume", "volume_old", "stress", "stressyy", "old_mean_stress",
    "strain", "strain_rate", "plstrain", "delta_plstrain", "viscosity",
    "dpressure", "edvoldt", "radiogenic_source", "dyn_fric_coeff",
    "state_variable", "emw", "stress_avg", "delta_plstrain_avg",
    "strain_avg0",
}
CTX_ELEM_FIELDS = {"conn", "elem_mask", "top_elem_mask"}


def _supported(param, ctx) -> None:
    if param.control.surface_process_option != 0:
        raise NotImplementedError(
            "surface processes use the GSPMD path, not shard_map")
    if int(ctx.sbc.n_grav) > 0 or int(ctx.sbc.n_neu) > 0:
        raise NotImplementedError(
            "facet traction BCs use the GSPMD path, not shard_map")


def _pad_elem(arr, pad):
    if pad == 0:
        return arr
    width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, width)


def pad_for_mesh(sim, n_devices: int):
    """Pad element arrays to a multiple of n_devices and return
    (ctx, state) ready for shard_map.  Padded elements carry volume 1,
    uniform material weights, degenerate connectivity [0...0] and
    elem_mask 0 (they contribute nothing: node_sum_scatter masks them and
    compute_dt ignores them)."""
    ctx, s = sim.ctx, sim.state
    nelem = ctx.nelem
    pad = (-nelem) % n_devices

    conn = _pad_elem(ctx.conn, pad)
    elem_mask = jnp.concatenate(
        [jnp.ones(nelem, ctx.elem_mask.dtype),
         jnp.zeros(pad, ctx.elem_mask.dtype)])
    surf2 = dataclasses.replace(
        ctx.surf, top_elem_mask=_pad_elem(ctx.surf.top_elem_mask, pad))
    ctx2 = dataclasses.replace(
        ctx, conn=conn, elem_mask=elem_mask, surf=surf2,
        nelem=nelem + pad, axis=AXIS,
        # gather tables are unused in scatter mode; shrink to placeholders
        gather_idx=jnp.zeros((1, 1), dtype=jnp.int32),
        gather_mask=jnp.zeros((1, 1), dtype=bool))

    updates = {}
    for name in ELEM_FIELDS:
        arr = getattr(s, name)
        arr = _pad_elem(arr, pad)
        if name in ("volume", "volume_old"):
            arr = arr.at[nelem:].set(1.0)
        if name == "emw":
            arr = arr.at[nelem:].set(1.0)
        updates[name] = arr
    s2 = State(**{**s.__dict__, **updates})
    return ctx2, s2, pad


def unpad_state(s: State, nelem: int) -> State:
    updates = {name: getattr(s, name)[:nelem] for name in ELEM_FIELDS}
    return State(**{**s.__dict__, **updates})


def _specs_for(tree, mesh, elem_names):
    def leaf_spec(path, leaf):
        name = None
        for entry in path:
            if hasattr(entry, "name"):
                name = entry.name
        if name in elem_names:
            return P(AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, tree)


def make_sharded_runner(sim, mesh: Mesh):
    """Build (ctx_sharded, state_sharded, run_chunk) where run_chunk(ctx,
    state, n) scans n steps of the shard_map step."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    param = sim.param
    _supported(param, sim.ctx)
    ndev = mesh.devices.size
    ctx2, s2, pad = pad_for_mesh(sim, ndev)

    step = make_step_fn(param, sim.compensation_pressure)
    ctx_specs = _specs_for(ctx2, mesh, CTX_ELEM_FIELDS)
    state_specs = _specs_for(s2, mesh, ELEM_FIELDS)

    try:
        sharded_step = shard_map(step, mesh=mesh,
                                 in_specs=(ctx_specs, state_specs),
                                 out_specs=state_specs, check_vma=False)
    except TypeError:  # older jax uses check_rep
        sharded_step = shard_map(step, mesh=mesh,
                                 in_specs=(ctx_specs, state_specs),
                                 out_specs=state_specs, check_rep=False)

    def run_chunk(ctx, state, n: int):
        def body(s, _):
            return sharded_step(ctx, s), None

        out, _ = jax.lax.scan(body, state, length=n)
        return out

    # place the data
    ctx_sh = jax.device_put(
        ctx2, jax.tree.map(lambda sp: NamedSharding(mesh, sp), ctx_specs))
    state_sh = jax.device_put(
        s2, jax.tree.map(lambda sp: NamedSharding(mesh, sp), state_specs))
    return ctx_sh, state_sh, jax.jit(run_chunk, static_argnums=2)


def run_sharded(sim, mesh: Mesh, nsteps: int, chunk: int = 100):
    """Run nsteps of sim on the device mesh; returns the final (unpadded)
    state and writes it back to sim.state."""
    nelem = sim.ctx.nelem
    ctx_sh, state_sh, run_chunk = make_sharded_runner(sim, mesh)
    done = 0
    while done < nsteps:
        c = min(chunk, nsteps - done)
        state_sh = run_chunk(ctx_sh, state_sh, c)
        done += c
    out = unpad_state(jax.device_get(state_sh), nelem)
    sim.state = jax.tree.map(jnp.asarray, out)
    return sim.state
