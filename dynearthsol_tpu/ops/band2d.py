"""Banded gather/assembly engine for unstructured meshes on TPU.

Why this exists (measured on TPU v5e, 277k-tri post-remesh mesh):
XLA lowers per-element corner gathers and support-table assembly
gathers to dynamic-gather custom-calls that stream HBM at ~100-156M
ROWS/s regardless of row width (~7 ns per random row), with a ~1.4 ms
floor per in-program gather op.  The flat SoA step issues ~21 such
gathers -> 43 of its 46 ms/step is gather time (6M elem*steps/s).

The TPU-native fix: exploit mesh locality.  After the generator's
band-friendly numbering, every block of EB consecutive elements touches
a node window of <~820 ids (measured: structured 514, post-Ruppert
unstructured 818 at EB=512).  The engine therefore:

  * packs nodal fields as SUPERNODE rows: (nnode8, 8*K) -- 8
    consecutive nodes x K fields per row (K=8, zero-padded);
  * per element block, fetches one (W8, 8K) window of those rows
    (a contiguous slice -- DMA, not random access);
  * corner gather = chunk-select one-hot MATMUL (MXU) over the W8
    window rows + an in-register sublane select among the 8 nodes of
    the chosen row;
  * assembly (the scatter transpose) = the same one-hot matmul
    transposed, accumulating window rows, then one block->global
    window-row scatter-add of ~nblk*W8 rows (69k rows, not 1.1M).

Everything is shaped for the hardware: matmuls are (EB, W8)x(W8, 8K)
with EB=512, W8=128, 8K=64 -- MXU-tiled on every dim; the one-hot is
built in-register from an iota compare (no HBM footprint).

This module provides the host-side table builder and a pure-jnp
engine (runs on any backend; the Pallas kernel variant reuses the same
tables).  Numerics: matmul-reassociated sums -- equivalence to
ops/assembly.node_sum is at float tolerance, not bit-exact; the exact
column engine in flat2d remains the oracle.

Reference: the gathers replace the EFFECTIVE work of the reference's
per-element loops (fields.cxx:612-703 assembly, dynearthsol.cxx
update_strain_rate corner reads); there is no CUDA/C++ counterpart to
this formulation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True (tests) to run the kernels in the Pallas interpreter
INTERPRET = False

EB = 512          # elements per block
KF = 8            # fields per engine call (zero-padded)
SN = 16           # nodes per supernode row
ROWK = SN * KF    # 128 lanes per supernode row (DMA lane tiling)
# KF=8/SN=16 (vs the original 16/8): every flat-step call packs <=7
# fields, so halving KF halves the window row count -- and with it the
# one-hot matmul FLOPs, the window DMA bytes, and the output rows --
# at no loss.  TPU-measured at the 277k-tri flagship: gather
# 1.46->0.85 ms, scatter 1.52->0.93 ms.


@dataclasses.dataclass(frozen=True)
class BandTables:
    """Static banding tables (jit-argument pytree).

    nelem/nnode/npe/nblk/w8 are Python ints (static); arrays ride
    the pytree so gathers see them as runtime parameters.

    Megablock grouping (the Pallas kernels' DMA unit): MB consecutive
    element blocks share one window DMA of mw8 supernode rows based at
    W0_8[m]; each sub-block's 128-row sub-window starts rel0_8[m*MB+sb]
    rows into it.  nblk is padded to nmega*MB (padded blocks carry
    b_e=SN so they gather garbage that is sliced off and scatter
    exactly zero)."""
    nelem: int
    nnode: int
    npe: int
    nblk: int
    w8: int               # window height in supernode rows
    nnode8: int           # padded supernode row count
    nmega: int            # megablock count (nblk == nmega * MB)
    mw8: int              # megablock window height in supernode rows
    w0_8: jnp.ndarray     # (nblk,) window base row of each block
    a_e: jnp.ndarray      # (nblk, npe, EB) window row of each corner
    b_e: jnp.ndarray      # (nblk, npe, EB) subnode of each corner;
                          #   padded elements carry SN (matches nothing)
    W0_8: jnp.ndarray     # (nmega,) megablock window base row
    rel0_8: jnp.ndarray   # (nblk,) sub-window offset inside megawindow

    def tree_flatten(self):
        return ((self.w0_8, self.a_e, self.b_e, self.W0_8, self.rel0_8),
                (self.nelem, self.nnode, self.npe, self.nblk, self.w8,
                 self.nnode8, self.nmega, self.mw8))

    @classmethod
    def tree_unflatten(cls, aux, children):
        w0_8, a_e, b_e, W0_8, rel0_8 = children
        nelem, nnode, npe, nblk, w8, nnode8, nmega, mw8 = aux
        return cls(nelem, nnode, npe, nblk, w8, nnode8, nmega, mw8,
                   w0_8, a_e, b_e, W0_8, rel0_8)


jax.tree_util.register_pytree_node(
    BandTables, BandTables.tree_flatten, BandTables.tree_unflatten)


MB = 16           # element blocks per megablock (one DMA set each);
                  # re-swept round 4 at the 277k-tri flagship on the
                  # current backend: step throughput 35.1/35.8/36.1/35.5M
                  # at MB=4/8/16/32 — MB=16 wins, the knob is now nearly
                  # flat (the per-call floor, not DMA grouping, binds)


def build_band_tables(conn: np.ndarray, nnode: int,
                      w8_cap: int = 512) -> BandTables | None:
    """Host-side banding preprocessing.  Returns None when the mesh
    numbering is not band-friendly (a block's window would exceed
    w8_cap supernode rows = 8*w8_cap nodes) -- callers then fall back
    to the exact column engine."""
    conn = np.asarray(conn)
    nelem, npe = conn.shape
    nblk = (nelem + EB - 1) // EB
    nmega = (nblk + MB - 1) // MB
    nblk = nmega * MB                        # whole-block padding too
    pad = nblk * EB - nelem
    # pad with the LAST element's conn (zeros would blow the last
    # block's window span); padded contributions are masked anyway
    connp = np.concatenate(
        [conn, np.repeat(conn[-1:], pad, axis=0)]) if pad else conn
    blk = connp.reshape(nblk, EB, npe)

    lo = blk.reshape(nblk, -1).min(axis=1)
    hi = blk.reshape(nblk, -1).max(axis=1)
    # base aligned to a supernode row multiple that is also DMA-friendly
    w0 = (lo // 128) * 128
    span8 = int(np.max((hi - w0) // SN + 1))
    w8 = ((span8 + 15) // 16) * 16           # sublane-multiple window
    if w8 > w8_cap:
        return None

    w0_8 = (w0 // SN).astype(np.int32)                    # (nblk,)
    rel = blk - w0[:, None, None]                         # node - base
    a = (rel // SN).astype(np.int32)                      # window row
    b = (rel % SN).astype(np.int32)                       # subnode
    npad_e = nblk * EB - nelem
    if npad_e:
        # padded elements: subnode SN matches no compare -> they gather
        # garbage that is sliced off and scatter exactly zero
        b.reshape(nblk * EB, npe)[nelem:, :] = SN

    # megablock windows: MB consecutive blocks share one DMA window
    w0m = w0_8.reshape(nmega, MB)
    him = (w0_8 + w8).reshape(nmega, MB)
    W0_8 = w0m.min(axis=1).astype(np.int32)               # (nmega,)
    mw8 = int(np.max(him.max(axis=1) - W0_8))
    mw8 = ((mw8 + 15) // 16) * 16
    rel0_8 = (w0_8 - np.repeat(W0_8, MB)).astype(np.int32)

    nnode8 = max(int(np.max(w0_8)) + w8, int(np.max(W0_8)) + mw8)
    nnode8 = max(nnode8, (nnode + SN - 1) // SN)
    nnode8 = ((nnode8 + 15) // 16) * 16

    return BandTables(
        nelem=nelem, nnode=nnode, npe=npe, nblk=nblk, w8=w8,
        nnode8=nnode8, nmega=nmega, mw8=mw8,
        w0_8=jnp.asarray(w0_8),
        a_e=jnp.asarray(a.transpose(0, 2, 1)),
        b_e=jnp.asarray(b.transpose(0, 2, 1)),
        W0_8=jnp.asarray(W0_8),
        rel0_8=jnp.asarray(rel0_8))


# ---- nodal pack <-> supernode rows ----

def pack_nodal(cols, bt: BandTables, dtype=None):
    """K column vectors (nnode,) -> (nnode8, 8*KF) supernode rows."""
    dtype = dtype or cols[0].dtype
    k = len(cols)
    assert k <= KF
    full = jnp.stack(list(cols)
                     + [jnp.zeros_like(cols[0])] * (KF - k),
                     axis=1).astype(dtype)                # (nnode, KF)
    pad_rows = bt.nnode8 * SN - bt.nnode
    full = jnp.pad(full, ((0, pad_rows), (0, 0)))
    return full.reshape(bt.nnode8, ROWK)


def unpack_nodal(rows, bt: BandTables, k: int):
    """(nnode8, 8*KF) -> k column vectors (nnode,)."""
    full = rows.reshape(bt.nnode8 * SN, KF)[:bt.nnode]
    return tuple(full[:, f] for f in range(k))


# ---- pure-jnp engine (reference; any backend) ----

def _windows(npack8, bt: BandTables):
    """(nblk, w8, ROWK) window stack: ONE row-gather of nblk*w8 rows."""
    rows = bt.w0_8[:, None] + jnp.arange(bt.w8, dtype=jnp.int32)[None, :]
    return npack8[rows]


def gather_corners(npack8, bt: BandTables, k: int):
    """Corner gather: -> [corner][field] tuple of (nelem,) columns."""
    win = _windows(npack8, bt)                      # (nblk, w8, ROWK)
    dtype = npack8.dtype
    out = []
    for c in range(bt.npe):
        a = bt.a_e[:, c]                            # (nblk, EB)
        oh = (a[:, :, None]
              == jnp.arange(bt.w8, dtype=jnp.int32)[None, None, :]
              ).astype(dtype)                       # (nblk, EB, w8)
        cand = jnp.einsum('bew,bwr->ber', oh, win,
                          precision=jax.lax.Precision.HIGHEST)
        cand = cand.reshape(bt.nblk, EB, SN, KF)
        b = bt.b_e[:, c]                            # (nblk, EB)
        sel = jnp.take_along_axis(
            cand, jnp.minimum(b, SN - 1)[:, :, None, None],
            axis=2)[:, :, 0, :]
        sel = sel.reshape(bt.nblk * EB, KF)[:bt.nelem]
        out.append(tuple(sel[:, f] for f in range(k)))
    return out


def scatter_corners(slot_cols, bt: BandTables):
    """Assembly: [corner][field] (nelem,) columns -> k columns (nnode,).

    The transpose of gather_corners: per block, expand contributions to
    their subnode lane, one-hot matmul onto window rows, then ONE
    window-row scatter-add onto the global supernode rows."""
    k = len(slot_cols[0])
    dtype = slot_cols[0][0].dtype
    pad = bt.nblk * EB - bt.nelem
    acc_win = jnp.zeros((bt.nblk, bt.w8, ROWK), dtype)
    for c in range(bt.npe):
        contrib = jnp.stack(
            list(slot_cols[c]) + [jnp.zeros_like(slot_cols[c][0])]
            * (KF - k), axis=1)                     # (nelem, KF)
        contrib = jnp.pad(contrib, ((0, pad), (0, 0)))
        contrib = contrib.reshape(bt.nblk, EB, KF)
        b = bt.b_e[:, c]
        ohb = (b[:, :, None]
               == jnp.arange(SN, dtype=jnp.int32)[None, None, :]
               ).astype(dtype)                      # (nblk, EB, SN)
        expanded = (ohb[:, :, :, None]
                    * contrib[:, :, None, :]).reshape(bt.nblk, EB, ROWK)
        a = bt.a_e[:, c]
        oha = (a[:, :, None]
               == jnp.arange(bt.w8, dtype=jnp.int32)[None, None, :]
               ).astype(dtype)                      # (nblk, EB, w8)
        acc_win = acc_win + jnp.einsum(
            'bew,ber->bwr', oha, expanded,
            precision=jax.lax.Precision.HIGHEST)
    rows = bt.w0_8[:, None] + jnp.arange(bt.w8, dtype=jnp.int32)[None, :]
    out = jnp.zeros((bt.nnode8, ROWK), dtype)
    out = out.at[rows.reshape(-1)].add(acc_win.reshape(-1, ROWK))
    return unpack_nodal(out, bt, k)


# ---- Pallas kernels (TPU perf path; same tables, same math) ----
#
# Transposed working space: candidates/contributions live as (ROWK, EB)
# -- 128 sublanes x 512 lanes -- so every matmul is MXU-tiled and the
# only transpose is the (w8, ROWK) <-> (ROWK, w8) window flip, once per
# block.  The one-hot never exists outside VMEM registers.
#
# All inputs are ANY/SMEM with manual per-block DMA and an internal
# fori_loop (the repo's pallas2d/pallas3d pattern): blocked BlockSpecs
# with index maps generate i64 index math under jax x64 that Mosaic
# fails to legalize.

def _iota2(n0, n1, dim):
    return jax.lax.broadcasted_iota(jnp.int32, (n0, n1), dim)


def _divk(x, k):
    return jax.lax.div(x, jnp.int32(k))


def _remk(x, k):
    return jax.lax.rem(x, jnp.int32(k))


def _i32(v):
    return jnp.asarray(v, jnp.int32)


ABR = 8   # a|b table rows per block, padded to the sublane DMA tiling


def _split3(x):
    """Exact 3-way bf16 split: hi + mid + lo == x for every finite f32
    (24-bit mantissa covered by three 8-bit bf16 pieces; each residual
    subtraction is exact by Sterbenz)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _sel_dot(data, oh_bool, dims, data_left=True, acc=None):
    """One-hot contraction with the DATA operand split 3-way to bf16.

    The one-hot side is exactly representable in bf16 and every
    bf16 x bf16 product is exact in the f32 accumulator, so the
    3-term sum reconstructs the f32 selection EXACTLY — in 3 MXU
    passes instead of the 6 that Precision.HIGHEST costs on f32
    operands.  ``dims`` orders (lhs, rhs) where lhs is the data when
    ``data_left`` else the one-hot; pass ``acc`` to add the result
    onto an existing f32 array.  Non-f32 dtypes keep the
    HIGHEST-precision f32 path (the engine is f32-gated anyway)."""
    dtype = data.dtype

    def dot(a, b, **kw):
        return jax.lax.dot_general(a if data_left else b,
                                   b if data_left else a, dims, **kw)

    if dtype != jnp.float32:
        out = dot(data, oh_bool.astype(dtype),
                  preferred_element_type=dtype,
                  precision=jax.lax.Precision.HIGHEST)
        return out if acc is None else acc + out
    oh = oh_bool.astype(jnp.bfloat16)
    out = acc
    for part in _split3(data):
        t = dot(part, oh, preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def _ab_rows(bt):
    ab = jnp.concatenate(
        [bt.a_e, bt.b_e,
         jnp.zeros((bt.nblk, ABR - 2 * bt.npe, EB), jnp.int32)], axis=1)
    return ab.reshape(bt.nblk * ABR, EB)


def scatter_gather_corners(slot_cols, bt: BandTables, kg: int):
    """Pure-jnp reference for the fused assembly + immediate corner
    re-gather: returns (k nodal sum columns, [corner][field<kg]
    re-gathered columns)."""
    sums = scatter_corners(slot_cols, bt)
    pack = pack_nodal(list(sums[:kg]), bt)
    return sums, gather_corners(pack, bt, kg)


def scatter_gather_corners_tpu(slot_cols, bt: BandTables, kg: int):
    """Fused Pallas assembly + immediate corner re-gather.

    The flat step's transfer hops (dvoldt, NMD pressure smoothing) are
    scatter-then-gather of the SAME nodal sums: fusing them means the
    gather phase reads the VMEM-resident accumulator directly — no
    second kernel launch, no window DMAs at all for the gather (only
    the a|b tables stream again).  Returns (k nodal sum columns, the
    first ``kg`` fields re-gathered as [corner][field] columns).

    Numerics match scatter_corners_tpu followed by gather_corners_tpu
    exactly (same matmul shapes and order)."""
    k = len(slot_cols[0])
    npe, nmega, w8, mw8 = bt.npe, bt.nmega, bt.w8, bt.mw8
    meb = MB * EB
    nelemp = bt.nblk * EB
    dtype = slot_cols[0][0].dtype
    pad = nelemp - bt.nelem
    npair = (nmega + 1) // 2

    cols = []
    for c in range(npe):
        for f in range(KF):
            col = slot_cols[c][f] if f < k else \
                jnp.zeros_like(slot_cols[c][0])
            cols.append(jnp.pad(col, (0, pad)))
    contrib = jnp.stack(cols)                       # (npe*KF, nelemp)

    def kernel(W0_ref, rel0_ref, c_hbm, ab_hbm, outn_hbm, outg_hbm,
               cc0, cc1, ab0, ab1, acc_vm, go0, go1, sems):
        ccs = (cc0, cc1)
        abs_ = (ab0, ab1)
        gouts = (go0, go1)
        acc_vm[...] = jnp.zeros_like(acc_vm)

        def in_copies(mm, slot):
            return (pltpu.make_async_copy(
                        c_hbm.at[:, pl.ds(mm * _i32(meb), meb)],
                        ccs[slot], sems.at[_i32(slot)]),
                    pltpu.make_async_copy(
                        ab_hbm.at[pl.ds(mm * _i32(MB * ABR), MB * ABR)],
                        abs_[slot], sems.at[_i32(2 + slot)]))

        def ab_copy(mm, slot):
            return pltpu.make_async_copy(
                ab_hbm.at[pl.ds(mm * _i32(MB * ABR), MB * ABR)],
                abs_[slot], sems.at[_i32(2 + slot)])

        def gout_copy(mm, slot):
            return pltpu.make_async_copy(
                gouts[slot], outg_hbm.at[:, pl.ds(mm * _i32(meb), meb)],
                sems.at[_i32(4 + slot)])

        def start_in(mm, slot):
            for c in in_copies(mm, slot):
                c.start()

        def wait_in(mm, slot):
            for c in in_copies(mm, slot):
                c.wait()

        sub_j = _divk(_iota2(ROWK, EB, 0), KF)

        def scatter_compute(mm, slot):
            for sb in range(MB):
                win_t = jnp.zeros((w8, ROWK), dtype)
                for c in range(npe):
                    cc = ccs[slot][c * KF:(c + 1) * KF,
                                   sb * EB:(sb + 1) * EB]  # (KF, EB)
                    a = abs_[slot][sb * ABR + c]
                    b = abs_[slot][sb * ABR + npe + c]
                    expanded = jnp.concatenate([cc] * SN, axis=0)
                    mask = (sub_j == b[None, :]).astype(dtype)
                    expanded = expanded * mask            # (ROWK, EB)
                    oh = _iota2(w8, EB, 0) == a[None, :]  # (w8, EB)
                    win_t = _sel_dot(expanded, oh,
                                     (((1,), (1,)), ((), ())),
                                     data_left=False, acc=win_t)
                w0 = W0_ref[mm] + rel0_ref[mm * _i32(MB) + _i32(sb)]
                cur = acc_vm[pl.ds(w0, w8)]
                acc_vm[pl.ds(w0, w8)] = cur + win_t

        def gather_compute(mm, slot):
            for sb in range(MB):
                w0 = W0_ref[mm] + rel0_ref[mm * _i32(MB) + _i32(sb)]
                win = acc_vm[pl.ds(w0, w8)]             # (w8, ROWK)
                for c in range(npe):
                    a = abs_[slot][sb * ABR + c]
                    b = abs_[slot][sb * ABR + npe + c]
                    oh = _iota2(w8, EB, 0) == a[None, :]
                    cand = _sel_dot(win, oh,
                                    (((0,), (0,)), ((), ())))
                    mask = (sub_j == b[None, :]).astype(dtype)
                    masked = cand * mask
                    red = masked[0:KF, :]
                    for j in range(1, SN):
                        red = red + masked[j * KF:(j + 1) * KF, :]
                    gouts[slot][c * KF:(c + 1) * KF,
                                sb * EB:(sb + 1) * EB] = red

        # ---- phase 1: assembly over all megablocks ----
        start_in(_i32(0), 0)

        def pair(i, carry):
            t0 = _i32(2) * _i32(i)
            t1 = t0 + _i32(1)
            wait_in(t0, 0)

            @pl.when(t1 < _i32(nmega))
            def _():
                start_in(t1, 1)
            scatter_compute(t0, 0)

            @pl.when(t1 < _i32(nmega))
            def _():
                wait_in(t1, 1)

                @pl.when(t1 + _i32(1) < _i32(nmega))
                def _():
                    start_in(t1 + _i32(1), 0)
                scatter_compute(t1, 1)
            return carry

        jax.lax.fori_loop(_i32(0), _i32(npair), pair, _i32(0))
        dma_n = pltpu.make_async_copy(acc_vm, outn_hbm, sems.at[_i32(6)])
        dma_n.start()

        # ---- phase 2: re-gather from the VMEM accumulator ----
        ab_copy(_i32(0), 0).start()

        def gpair(i, carry):
            t0 = _i32(2) * _i32(i)
            t1 = t0 + _i32(1)
            ab_copy(t0, 0).wait()

            @pl.when(t1 < _i32(nmega))
            def _():
                ab_copy(t1, 1).start()

            @pl.when(t0 > _i32(0))
            def _():
                gout_copy(t0, 0).wait()
            gather_compute(t0, 0)
            gout_copy(t0, 0).start()

            @pl.when(t1 < _i32(nmega))
            def _():
                ab_copy(t1, 1).wait()

                @pl.when(t1 + _i32(1) < _i32(nmega))
                def _():
                    ab_copy(t1 + _i32(1), 0).start()

                @pl.when(t1 > _i32(1))
                def _():
                    gout_copy(t1, 1).wait()
                gather_compute(t1, 1)
                gout_copy(t1, 1).start()
            return carry

        jax.lax.fori_loop(_i32(0), _i32(npair), gpair, _i32(0))
        gout_copy(_i32(nmega - 1), (nmega - 1) % 2).wait()
        if nmega > 1:
            gout_copy(_i32(nmega - 2), (nmega - 2) % 2).wait()
        dma_n.wait()

    ab = _ab_rows(bt)

    outn, outg = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # W0_8
            pl.BlockSpec(memory_space=pltpu.SMEM),      # rel0_8
            pl.BlockSpec(memory_space=pl.ANY),          # contrib
            pl.BlockSpec(memory_space=pl.ANY),          # a|b table
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((bt.nnode8, ROWK), dtype),
                   jax.ShapeDtypeStruct((npe * KF, nelemp), dtype)],
        scratch_shapes=[
            pltpu.VMEM((npe * KF, meb), dtype),
            pltpu.VMEM((npe * KF, meb), dtype),
            pltpu.VMEM((MB * ABR, EB), jnp.int32),
            pltpu.VMEM((MB * ABR, EB), jnp.int32),
            pltpu.VMEM((bt.nnode8, ROWK), dtype),
            pltpu.VMEM((npe * KF, meb), dtype),
            pltpu.VMEM((npe * KF, meb), dtype),
            pltpu.SemaphoreType.DMA((7,)),
        ],
        interpret=INTERPRET,
    )(bt.W0_8, bt.rel0_8, contrib, ab)

    nodal = unpack_nodal(outn, bt, k)
    gath = [tuple(outg[c * KF + f, :bt.nelem] for f in range(kg))
            for c in range(npe)]
    return nodal, gath


def gather_corners_tpu(npack8, bt: BandTables, k: int):
    """Pallas corner gather: (nnode8, ROWK) rows -> [corner][field]
    (nelem,) columns, via per-MEGABLOCK window DMA + one-hot matmuls.

    The DMA unit is the megablock (MB element blocks, one window of
    mw8 rows + one table row-range + one output range): per-block DMAs
    measured 2.3 us/block of pure issue/semaphore latency on v5e --
    more than the matmuls themselves.  Each sub-block slices its
    128-row sub-window out of the VMEM megawindow (dynamic sublane
    offset, 16-aligned) and runs a transposed-LHS dot_general, so no
    in-kernel transposes exist.  Double-buffered: the megablock loop is
    unrolled in pairs with static ping-pong slots so megablock m+1's
    DMAs overlap megablock m's matmuls."""
    npe, nmega, w8, mw8 = bt.npe, bt.nmega, bt.w8, bt.mw8
    meb = MB * EB
    nelemp = bt.nblk * EB
    dtype = npack8.dtype
    npair = (nmega + 1) // 2

    def kernel(W0_ref, rel0_ref, npack_hbm, ab_hbm, out_hbm,
               win0, win1, ab0, ab1, out0, out1, sems):
        wins = (win0, win1)
        abs_ = (ab0, ab1)
        outs = (out0, out1)

        def in_copies(mm, slot):
            return (pltpu.make_async_copy(
                        npack_hbm.at[pl.ds(W0_ref[mm], mw8)], wins[slot],
                        sems.at[_i32(slot)]),
                    pltpu.make_async_copy(
                        ab_hbm.at[pl.ds(mm * _i32(MB * ABR), MB * ABR)],
                        abs_[slot], sems.at[_i32(2 + slot)]))

        def out_copy(mm, slot):
            return pltpu.make_async_copy(
                outs[slot], out_hbm.at[:, pl.ds(mm * _i32(meb), meb)],
                sems.at[_i32(4 + slot)])

        def start_in(mm, slot):
            for c in in_copies(mm, slot):
                c.start()

        def wait_in(mm, slot):
            for c in in_copies(mm, slot):
                c.wait()

        sub_j = _divk(_iota2(ROWK, EB, 0), KF)

        def compute(mm, slot):
            for sb in range(MB):
                rel0 = rel0_ref[mm * _i32(MB) + _i32(sb)]
                win = wins[slot][pl.ds(rel0, w8)]       # (w8, ROWK)
                for c in range(npe):
                    a = abs_[slot][sb * ABR + c]        # (EB,) s32
                    b = abs_[slot][sb * ABR + npe + c]
                    oh = _iota2(w8, EB, 0) == a[None, :]  # (w8, EB)
                    # (ROWK, EB) via transposed-LHS contraction: the
                    # MXU streams win as-is, no transpose op emitted
                    cand = _sel_dot(win, oh,
                                    (((0,), (0,)), ((), ())))
                    mask = (sub_j == b[None, :]).astype(dtype)
                    masked = cand * mask
                    # field extraction: sum the SN subnode row-groups
                    # (static sublane slices -- an MXU matmul here would
                    # be M=KF-padded 8x against the 128x128 array)
                    red = masked[0:KF, :]
                    for j in range(1, SN):
                        red = red + masked[j * KF:(j + 1) * KF, :]
                    outs[slot][c * KF:(c + 1) * KF,
                               sb * EB:(sb + 1) * EB] = red

        start_in(_i32(0), 0)

        def pair(i, carry):
            t0 = _i32(2) * _i32(i)
            t1 = t0 + _i32(1)
            # slot 0: megablock t0
            wait_in(t0, 0)

            @pl.when(t1 < _i32(nmega))
            def _():
                start_in(t1, 1)

            @pl.when(t0 > _i32(0))
            def _():
                out_copy(t0, 0).wait()      # frees out0 for rewrite
            compute(t0, 0)
            out_copy(t0, 0).start()

            # slot 1: megablock t1 (may not exist on an odd tail)
            @pl.when(t1 < _i32(nmega))
            def _():
                wait_in(t1, 1)

                @pl.when(t1 + _i32(1) < _i32(nmega))
                def _():
                    start_in(t1 + _i32(1), 0)

                @pl.when(t1 > _i32(1))
                def _():
                    out_copy(t1, 1).wait()
                compute(t1, 1)
                out_copy(t1, 1).start()
            return carry

        jax.lax.fori_loop(_i32(0), _i32(npair), pair, _i32(0))
        # drain the last outstanding output DMAs
        out_copy(_i32(nmega - 1), (nmega - 1) % 2).wait()
        if nmega > 1:
            out_copy(_i32(nmega - 2), (nmega - 2) % 2).wait()

    ab = _ab_rows(bt)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # W0_8
            pl.BlockSpec(memory_space=pltpu.SMEM),      # rel0_8
            pl.BlockSpec(memory_space=pl.ANY),          # npack8
            pl.BlockSpec(memory_space=pl.ANY),          # a|b table
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((npe * KF, nelemp), dtype),
        scratch_shapes=[
            pltpu.VMEM((mw8, ROWK), dtype),
            pltpu.VMEM((mw8, ROWK), dtype),
            pltpu.VMEM((MB * ABR, EB), jnp.int32),
            pltpu.VMEM((MB * ABR, EB), jnp.int32),
            pltpu.VMEM((npe * KF, meb), dtype),
            pltpu.VMEM((npe * KF, meb), dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=INTERPRET,
    )(bt.W0_8, bt.rel0_8, npack8, ab)

    return [tuple(out[c * KF + f, :bt.nelem] for f in range(k))
            for c in range(npe)]


def scatter_corners_tpu(slot_cols, bt: BandTables):
    """Pallas assembly: [corner][field] (nelem,) columns -> k columns
    (nnode,).  The gather transpose: expand to subnode lane-groups,
    one-hot matmul onto window rows, accumulate into a VMEM-resident
    global supernode-row array, write out once.

    Megablocked like the gather (MB blocks per DMA set); contributions
    ride k-major (npe*KF, nelemp) -- lane-exact HBM column slices --
    and the per-corner one-hot matmul contracts both operands on their
    EB dim (transposed-RHS dot_general), producing window rows directly
    with no transpose op.  Input DMAs are double-buffered
    (pair-unrolled, static slots); the window accumulations are
    ordered, so the summation order is deterministic (block-major,
    corner-major within)."""
    k = len(slot_cols[0])
    npe, nmega, w8, mw8 = bt.npe, bt.nmega, bt.w8, bt.mw8
    meb = MB * EB
    nelemp = bt.nblk * EB
    dtype = slot_cols[0][0].dtype
    pad = nelemp - bt.nelem
    npair = (nmega + 1) // 2

    cols = []
    for c in range(npe):
        for f in range(KF):
            col = slot_cols[c][f] if f < k else \
                jnp.zeros_like(slot_cols[c][0])
            cols.append(jnp.pad(col, (0, pad)))
    contrib = jnp.stack(cols)                       # (npe*KF, nelemp)

    def kernel(W0_ref, rel0_ref, c_hbm, ab_hbm, out_hbm,
               cc0, cc1, ab0, ab1, acc_vm, sems):
        ccs = (cc0, cc1)
        abs_ = (ab0, ab1)
        acc_vm[...] = jnp.zeros_like(acc_vm)

        def in_copies(mm, slot):
            return (pltpu.make_async_copy(
                        c_hbm.at[:, pl.ds(mm * _i32(meb), meb)],
                        ccs[slot], sems.at[_i32(slot)]),
                    pltpu.make_async_copy(
                        ab_hbm.at[pl.ds(mm * _i32(MB * ABR), MB * ABR)],
                        abs_[slot], sems.at[_i32(2 + slot)]))

        def start_in(mm, slot):
            for c in in_copies(mm, slot):
                c.start()

        def wait_in(mm, slot):
            for c in in_copies(mm, slot):
                c.wait()

        sub_j = _divk(_iota2(ROWK, EB, 0), KF)

        def compute(mm, slot):
            for sb in range(MB):
                win_t = jnp.zeros((w8, ROWK), dtype)
                for c in range(npe):
                    cc = ccs[slot][c * KF:(c + 1) * KF,
                                   sb * EB:(sb + 1) * EB]  # (KF, EB)
                    a = abs_[slot][sb * ABR + c]
                    b = abs_[slot][sb * ABR + npe + c]
                    # subnode expansion: tile the KF rows SN times
                    # (static sublane concat), mask to the target subnode
                    expanded = jnp.concatenate([cc] * SN, axis=0)
                    mask = (sub_j == b[None, :]).astype(dtype)
                    expanded = expanded * mask            # (ROWK, EB)
                    oh = _iota2(w8, EB, 0) == a[None, :]  # (w8, EB)
                    # (w8, ROWK): both operands contract on their EB
                    # dim -- the MXU streams them as-is, no transpose
                    win_t = _sel_dot(expanded, oh,
                                     (((1,), (1,)), ((), ())),
                                     data_left=False, acc=win_t)
                w0 = W0_ref[mm] + rel0_ref[mm * _i32(MB) + _i32(sb)]
                cur = acc_vm[pl.ds(w0, w8)]
                acc_vm[pl.ds(w0, w8)] = cur + win_t

        start_in(_i32(0), 0)

        def pair(i, carry):
            t0 = _i32(2) * _i32(i)
            t1 = t0 + _i32(1)
            wait_in(t0, 0)

            @pl.when(t1 < _i32(nmega))
            def _():
                start_in(t1, 1)
            compute(t0, 0)

            @pl.when(t1 < _i32(nmega))
            def _():
                wait_in(t1, 1)

                @pl.when(t1 + _i32(1) < _i32(nmega))
                def _():
                    start_in(t1 + _i32(1), 0)
                compute(t1, 1)
            return carry

        jax.lax.fori_loop(_i32(0), _i32(npair), pair, _i32(0))
        dma_o = pltpu.make_async_copy(acc_vm, out_hbm, sems.at[_i32(4)])
        dma_o.start()
        dma_o.wait()

    ab = _ab_rows(bt)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # W0_8
            pl.BlockSpec(memory_space=pltpu.SMEM),      # rel0_8
            pl.BlockSpec(memory_space=pl.ANY),          # contrib
            pl.BlockSpec(memory_space=pl.ANY),          # a|b table
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bt.nnode8, ROWK), dtype),
        scratch_shapes=[
            pltpu.VMEM((npe * KF, meb), dtype),
            pltpu.VMEM((npe * KF, meb), dtype),
            pltpu.VMEM((MB * ABR, EB), jnp.int32),
            pltpu.VMEM((MB * ABR, EB), jnp.int32),
            pltpu.VMEM((bt.nnode8, ROWK), dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        interpret=INTERPRET,
    )(bt.W0_8, bt.rel0_8, contrib, ab)

    return unpack_nodal(out, bt, k)


# ---------------------------------------------------------------------------
# ROUND-5 MEASUREMENT: the VMEM-resident banded multi-step kernel was
# prototyped and measured on the real chip (277k-tri flagship tables,
# v5e) — and does NOT deliver the projected win.  Measured in-kernel
# per-(gather+scatter)-sweep-pair costs:
#   naive fori over blocks, per-block dynamic slices ... 3.8-3.9 ms
#   matmuls only (mask/select stripped)  ............... 3.7 ms
#   one bf16 pass instead of exact 3-pass .............. 3.2 ms
#   8-aligned offsets (w0/8 trick) ..................... 3.5 ms
#   megablock staging + 16x-unrolled static slices ..... 3.2 ms
# vs 0.85 + 0.93 ms for the standalone per-call kernels on the SAME
# tables.  Decomposition: matmul FLOPs are ~0.2 ms and HBM ~0.05 ms per
# sweep; the floor is per-block DYNAMIC VMEM ADDRESSING — each dynamic
# sublane/lane slice costs ~1 us of issue overhead and a sweep needs
# ~4-5 of them per block x 544 blocks.  A 6-sweep resident step would
# run ~10 ms (~28M elem*steps/s): WORSE than the existing 6-call flat
# path (7.9 ms).  The per-call kernels already sit near this floor
# (1 window slice + 2 acc slices per block, DMA-staged everything
# else), so the unstructured gather path is addressing-bound, not
# FLOP- or bandwidth-bound — see tools/ROOFLINE.md.
#
# CONSEQUENCE (round 5): the post-remesh production gap is closed
# structurally instead — remeshing_option 100 (boundary-fitted
# STRUCTURED regeneration, remesh_impl.structured_regen_2d/3d) returns
# grid topology fitted to the deformed boundaries, so a production run
# re-enters the fused VMEM-resident pallas2d path after every remesh
# (measured: postremesh 876M elem*steps/s vs 36M on this path) with
# shape-stable (zero-recompile) remeshes.  The banded engine remains
# the static-unstructured-topology path.  The original design sketch is
# kept below for the record.
# ---------------------------------------------------------------------------
# Measured bound (round 4): the flat step makes 6 band-engine calls per
# step at ~0.9 ms each (gather, thermal+dvoldt asm, NMD asm, force asm,
# post-move gather, mass asm) -> ~5.5 of 7.9 ms/step is per-CALL floor
# (launch + window DMA + out-buffer roundtrip), not FLOPs (matmuls are
# ~0.2 ms) and not HBM streaming (~0.05 ms).  MB/EB re-sweeps are flat
# to +-3%: the knob space is exhausted.  The fix is structural:
#
#   * the whole 277k-tri state fits VMEM: element SoA planes ~28 MB
#     (25 fields f32) + nodal supernode pack ~7 MB + a_e/b_e tables
#     6.6 MB (int16-ify: 3.3 MB) + w0_8 ~ 40 MB total, leaving ~80 MB
#     working set — a pallas2d-style RESIDENT multi-step kernel holds
#     everything on-chip for an entire scan chunk;
#   * per step, iterate element blocks (541 at EB=512) as an in-kernel
#     fori_loop: slice the block's node window from the RESIDENT nodal
#     pack (pl.ds on VMEM, no DMA), run the one-hot-matmul corner
#     gather (reuse _sel_dot), compute the full per-element physics
#     (port update_stress_cols from flat2d — it is already
#     columnwise), and accumulate assembly contributions back into the
#     resident nodal pack via the transposed matmul + window-row adds;
#   * the two transfer hops (dvoldt, NMD) and the force->velocity->
#     coordinate nodal phase are full-pack VPU passes between block
#     loops — all in VMEM;
#   * dt/CFL: same SMEM reduction scheme as pallas2d's resident kernel
#     (per-step dt history out, 10-step refresh cadence);
#   * expected: the 6 x 0.9 ms call floor collapses to ~6 in-kernel
#     block loops at matmul+VPU cost (~0.2-0.4 ms each) -> ~150-300M
#     elem*steps/s, the VERDICT r3 #3 target.
# Correctness harness: interpreter-mode equivalence vs flat2d at f32
# (the band engine's matmul reassociation precludes bit-parity; gate
# like tests/test_band2d.py does today).
