"""Compile-fast gather/assembly forms for the tunneled TPU backend.

The XLA TPU pipeline on this backend compiles reshapes that regroup a
large major dimension against a small kept minor dimension — and any op
lowered through one, notably multi-column gathers on rank>=2 operands
(``coord[conn]`` -> flatten-gather-split) — in time that grows
pathologically with the array size (measured round 4: a bare
``(786432,2)->(262144,3,2)`` reshape costs 47 s of server-side XLA
compile; ``coord[conn]`` at 262k elements costs 42-52 s; the same
program at 2k elements costs 0.8 s).  Decomposed per-column/per-component
forms compile in ~1 s at any size and execute identically (XLA fuses the
columns back together), so every hot gather in the framework routes
through these helpers.

Fast primitives (measured):       Slow primitives (avoid):
  1-D operand, any-shape index      rank>=2 operand advanced indexing
  per-column takes + stack          flatten/merge reshape with kept minor
  same-shape .at[idx].add(vals)     support-table gather with >3 columns
  rank-3 slices, stacks, einsum     middle-axis slice feeding a scatter
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fast_reshape(x: jnp.ndarray, *shape: int) -> jnp.ndarray:
    """``x.reshape(shape)`` decomposed into steps the backend compiles
    fast: progressive minor-dim merges down to 1-D, then progressive
    minor-dim splits up to the target, with optimization barriers so the
    algebraic simplifier cannot recombine them into one pathological
    reshape.  Runtime cost: the barrier pins one materialization, which
    a bare reshape needs anyway (it is a relayout copy on TPU)."""
    if len(shape) == 1 and not isinstance(shape[0], int):
        shape = tuple(shape[0])
    if x.shape == tuple(shape):
        return x
    bar = jax.lax.optimization_barrier
    y = x
    while y.ndim > 1:  # merge the last two dims (fast at any size)
        y = bar(y.reshape(y.shape[:-2] + (y.shape[-2] * y.shape[-1],)))
    for i, d in enumerate(shape[:-1]):  # split leading dims one by one
        y = bar(y.reshape(y.shape[:i] + (d, -1)))
    return y


def take_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``arr[idx]`` in the compile-fast per-column form.

    arr: (m,) or (m, k...); idx: (n,) or (n, d).
    Returns the same values/shape as advanced indexing: (n[, d], k...).
    """
    if arr.ndim == 1:
        return arr[idx]  # 1-D operands lower fast at any index rank
    if idx.ndim == 1:
        return jnp.take(arr, idx, axis=0)
    cols = [jnp.take(arr, idx[:, j], axis=0) for j in range(idx.shape[1])]
    return jnp.stack(cols, axis=1)


def support_sum(flat: jnp.ndarray, gather_idx: jnp.ndarray,
                gather_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked padded-support gather-sum: ``where(mask, flat[gidx], 0)
    .sum(axis=1)`` decomposed per support column.

    flat: (nslots,) or (nslots, k); gather_idx/mask: (nnode, max_degree).
    Returns (nnode,) or (nnode, k).  Summation is in fixed slot order
    (left-associated), deterministic run to run.
    """
    deg = gather_idx.shape[1]

    def col(j):
        v = jnp.take(flat, gather_idx[:, j], axis=0)
        m = gather_mask[:, j]
        return jnp.where(m[:, None] if flat.ndim == 2 else m, v, 0.0)

    out = col(0)
    for j in range(1, deg):
        out = out + col(j)
    return out
