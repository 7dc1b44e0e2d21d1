"""Multi-device domain decomposition over the TPU ICI mesh.

The reference has NO distributed backend (SURVEY §2.3): OpenMP shared memory
plus one optional GPU.  The TPU-native scaling axis is domain decomposition:
element arrays shard across devices on their leading (element) axis; nodal
arrays are replicated; the element->node `segment_sum` becomes partial sums
+ an XLA all-reduce over the ICI — exactly the halo-exchange pattern of the
algorithm (shared nodes between element shards are the only inter-shard
dependency per step).

This v1 uses GSPMD (jit + NamedSharding constraints) and lets XLA place the
collectives.  A shard_map + `psum_scatter` refinement over node blocks comes
with the perf pass.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ELEM_AXIS = "elem"


def make_device_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (ELEM_AXIS,))


def state_shardings(state, mesh: Mesh, nelem: int):
    """Per-leaf shardings: element-leading arrays shard on ELEM_AXIS,
    everything else replicated."""
    elem_spec = NamedSharding(mesh, P(ELEM_AXIS))
    repl = NamedSharding(mesh, P())

    def spec(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and \
                leaf.shape[0] == nelem:
            return elem_spec
        return repl

    return jax.tree.map(spec, state)


def shard_simulation_state(state, mesh: Mesh, nelem: int):
    shardings = state_shardings(state, mesh, nelem)
    return jax.device_put(state, shardings), shardings
