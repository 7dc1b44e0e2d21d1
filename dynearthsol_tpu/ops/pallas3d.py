"""Fused Pallas plane-step for 3D structured 5-tet meshes.

Same architecture as pallas2d.py (see its module docstring): the ENTIRE
time step (the dynearthsol.cxx:746-956 kernel sequence) fuses into ONE
Pallas kernel so each state plane crosses HBM once per step, instead of
the ~40 phase-boundary round-trips of the XLA grid3d step (measured 10x
slower per element than the 2D fused path).

3D-specific design:

* Plane layout ``(slot, tet, y, z, x)``: x cells are lanes (128-tiled),
  z cells are sublanes (8-tiled), and **y is the tile axis** as a pure
  leading dim — leading-dim DMA slices have no Mosaic alignment
  constraint, so the halo is the exact physics halo of 3 cell rows
  (the element->node->element transfer chain dvoldt -> stress -> force
  -> velocity -> post-move masses widens the stencil by one row per
  hop), not the 8 the 2D kernel pays for sublane alignment.
* The 5-tet cell decomposition runs as an UNROLLED per-tet loop inside
  each phase, with the 8 shifted corner views + the checkerboard parity
  select of structured.tet_tables.  Per-tet intermediates are single
  (NWy, nzc, nxc) planes, keeping the live VMEM set ~15 MB; nodal
  accumulators (dvoldt, tdot, force, masses) are SSA values carried
  across the unrolled loop.
* Gathers/shape-functions are recomputed per phase instead of stashed
  (a few hundred VPU flops/elem) — stashing all per-tet intermediates
  would cost ~60 MB of VMEM.
* Pre-Jaumann stress/strain are staged in the element out-buffer and
  rotated in place after the coordinate move (the rotation is linear in
  the rotated tensor, so rotate-then-scale == the reference's
  scale-then-rotate for the surface correction).

Gating (pallas3d_step_applicable): float32, damping 0-3, no Winkler/
water/Neumann tractions, no inclined vbcs, and nxc % 128 == nzc % 8 == 0
so element planes are exactly lane/sublane aligned (ghost masking is
then y-only).  Multi-material models ride the const-property-plane pack
(the 2D kernel's design): per-chunk mixed-property planes + nmat weight
planes DMA'd per tile, with in-kernel material loops for viscosity and
plastic weakening; single-material models keep compile-time scalars and
skip that DMA entirely.
The NMD mixed-stress smoothing is supported (it adds the 4th transfer
hop, hence H=4).  Everything else falls back to the XLA grid3d step,
which remains the oracle in tests/test_pallas3d.py.

Reference per-step kernel order: dynearthsol.cxx:746-956.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import bc as bc_mod
from ..config import RH_ELASTIC, RH_EP, RH_EVP, RH_MAXWELL, RH_VISCOUS, Param
from . import matprops as M
from .matprops import CELSIUS0, GAS_CONSTANT, MIN_STRAIN_RATE
from .structured import tet_tables

# ---- packed-state slot maps ----
# element pack, each slot (5, nyp_c, nzc, nxc).  Slots 0..NE_IN-1 are
# kernel inputs; edvoldt/strain_rate are carry-only outputs.
E_SCALAR_IN = ("volume", "volume_old", "plstrain", "delta_plstrain",
               "viscosity", "dpressure")
T_SLOTS = ("stress", "strain")          # 6 planes each, in+out
NE_IN = len(E_SCALAR_IN) + 6 * len(T_SLOTS)          # 18
E_SLOTS = E_SCALAR_IN + ("edvoldt",)
NE = NE_IN + 1 + 6                                   # 25 (+ strain_rate)

# nodal pack, each slot (nyp_n, LZN, LXN).  Slots 0..NN_IN-1 are inputs.
# "dhacc" is the surface-process height accumulator; "edv_a"/"edv_b"
# carry edvacc_surf per top FACET (2 triangles per top cell, stored at
# the cell's (y, z=top, x) node position — see _surf_maps)
N_SLOTS = ("coord_x", "coord_y", "coord_z", "vel_x", "vel_y", "vel_z",
           "temperature", "mass", "tmass", "volume_n",
           "dhacc", "edv_a", "edv_b",
           "hmass", "force_x", "force_y", "force_z")
NN_IN = 13
NN = len(N_SLOTS)

# const nodal pack (per chunk)
CN_SLOTS = ("top_mask", "vbc_mask_x", "vbc_mask_y", "vbc_mask_z")
NCN = len(CN_SLOTS)

# const element pack (per chunk): radiogenic source + the nmat raw
# material-weight planes.  Unlike the 2D kernel (which also carries the
# pre-mixed property planes), the 3D pack stores ONLY the weights and
# the kernel mixes properties in-place from the compile-time material
# tables — the 983k-tet tile budget cannot afford ~11 extra
# (5, TY+2H, nzc, nxc) property slabs in VMEM (measured: the
# const-plane variant oversubscribed scoped vmem by 6.4 MB at TY=8).
CE3_SLOTS = ("radiogenic_source",)


def _ce3slot(name: str) -> int:
    return CE3_SLOTS.index(name)

H = 4            # y halo (exact chained-stencil depth incl. the NMD hop)
PAD = 4          # ghost cell rows each side of the packed y axis

# set True (tests) to run the kernel in the Pallas interpreter — the CPU
# oracle path for validating against grid3d
INTERPRET = False


def _eslot(name: str) -> int:
    if name == "edvoldt":
        return NE_IN
    if name == "strain_rate":
        return NE_IN + 1
    if name in T_SLOTS:
        return len(E_SCALAR_IN) + 6 * T_SLOTS.index(name)
    return E_SCALAR_IN.index(name)


def _nslot(name: str) -> int:
    return N_SLOTS.index(name)


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _uniform_mat(param: Param) -> bool:
    """Single material + uniform ICs: property mixtures are compile-time
    scalars and the const element pack is skipped entirely (the mixing
    mean of one material is the material value regardless of marker
    weights, matprops.cxx:115-144)."""
    return (len(param.mat.rho0) == 1
            and param.ic.temperature_option in (0, 1, 90))


def _nce(param: Param) -> int:
    return 0 if _uniform_mat(param) else \
        len(CE3_SLOTS) + len(param.mat.rho0)


def _pick_ty(nyc: int, nzc: int, nxc: int, nce: int = 0,
             halo: int = H):
    """Largest tile height keeping the big VMEM slabs under budget."""
    import os

    force = os.environ.get("DES_PALLAS3D_TY")
    if force and nyc % int(force) == 0:
        return int(force)
    for ty in (64, 32, 16, 12, 8, 6, 4):
        if nyc % ty:
            continue
        # the big VMEM slabs: input pack + full-extent output staging
        # + (multi-material) the const property pack.  Total kernel VMEM
        # (incl. nodal slabs + Mosaic stack temporaries) measures 2.0x
        # this estimate on the real chip (round-4 calibration: TY=6
        # surf -> 60.3M est / 120.4M real; TY=8 surf -> 67.8M / 141.2M),
        # so the cap is half the 126M usable VMEM.
        slab = (NE_IN + NE + nce) * (ty + 2 * halo) * 5 * nzc * nxc * 4
        if slab <= 63 * 1024 * 1024:
            return ty
    return None


def _grav_facets_structured_3d(param, ctx):
    """Decode the gravity-traction facet tables (ctx.sbc) on a 3D
    structured 5-tet grid into compile-time constants for the in-kernel
    Winkler/water blocks (apply_stress_bcs, bc.cxx:632-790).

    Each boundary cell's quad face is covered by two triangles owned by
    two corner tets; which tets and which corner triples depends on cell
    parity.  Returns {"winkler","water","bottom","top"} where bottom/top
    map parity -> [(tet_slot, (code0, code1, code2)), ...] with corner
    codes (a*4 + b*2 + d) IN THE STORED facet-node order, so the kernel's
    cross product reproduces the generic path's outward normal exactly.
    Returns None when there are no gravity facets; raises ValueError when
    the tables are not canonical full bottom/top coverage (sidewall
    lithostatic facets, partial rows) — the gate rejects those configs."""
    n_grav = int(ctx.sbc.n_grav)
    if n_grav == 0:
        return None
    nx, ny, nz = ctx.sgrid
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    fn = np.asarray(ctx.sbc.facet_nodes)      # (n, 3)
    fe = np.asarray(ctx.sbc.facet_elem)       # (n,)
    kind = np.asarray(ctx.sbc.kind)           # (n,)
    if not set(np.unique(kind)).issubset({0, 1}):
        raise ValueError("sidewall lithostatic facets not supported "
                         "in-kernel")
    spec = {"winkler": False, "water": False, "bottom": None, "top": None}
    for kval, name in ((0, "bottom"), (1, "top")):
        rows = np.where(kind == kval)[0]
        if rows.size == 0:
            continue
        if rows.size != 2 * nxc * nyc:
            raise ValueError(f"{name} facet coverage incomplete")
        f = fn[rows]
        # node id = (i*ny + j)*nz + k; elem id = ((i*nyc + j)*nzc + k)*5+t
        k_n = f % nz
        j_n = (f // nz) % ny
        i_n = f // (nz * ny)
        lane = 0 if kval == 0 else nz - 1
        if not (k_n == lane).all():
            raise ValueError(f"{name} facets off the boundary lane")
        e = fe[rows]
        t_id = e % 5
        cell = e // 5
        kz = cell % nzc
        jy = (cell // nzc) % nyc
        ix = cell // (nzc * nyc)
        if not (kz == (0 if kval == 0 else nzc - 1)).all():
            raise ValueError(f"{name} facet elements off the boundary row")
        a = i_n - ix[:, None]
        b = j_n - jy[:, None]
        d = k_n - kz[:, None]
        if not (((a == 0) | (a == 1)) & ((b == 0) | (b == 1))
                & ((d == 0) | (d == 1))).all():
            raise ValueError(f"{name} facet nodes outside the owner cell")
        codes = a * 4 + b * 2 + d
        parv = (ix + jy + kz) % 2
        groups = {0: {}, 1: {}}
        for r in range(rows.size):
            key = (int(t_id[r]), tuple(int(c) for c in codes[r]))
            groups[int(parv[r])].setdefault(key, set()).add(
                (int(ix[r]), int(jy[r])))
        out = {}
        for pv in (0, 1):
            cells_pv = {(i, j) for i in range(nxc) for j in range(nyc)
                        if (i + j + (0 if kval == 0 else nzc - 1)) % 2
                        == pv}
            if len(groups[pv]) != 2 or any(
                    cs != cells_pv for cs in groups[pv].values()):
                raise ValueError(f"{name} facet groups not canonical")
            out[pv] = sorted(groups[pv].keys())
        spec[name] = out
        spec["winkler" if kval == 0 else "water"] = True
    return spec


def _surf_on(param, ctx) -> bool:
    return (param.control.surface_process_option == 1
            and int(ctx.surf.etop) > 0)


def _halo_for(param, ctx) -> int:
    # surface diffusion reads the post-move coords of +-1 neighbour
    # cells: one extra chained-stencil hop (cf. bc.cxx:920-1050 running
    # between update_coordinate and the post-move geometry)
    return H + 1 if _surf_on(param, ctx) else H


def _surf_maps(ctx, nx: int, ny: int, nz: int):
    """Host map from top-facet index to (triangle slot, flat node id).

    Each top cell's quad face splits into two triangles along the
    parity diagonal (tet_tables): even cells {1,3,7}/{1,5,7}, odd cells
    {1,3,5}/{3,5,7} in corner codes a*4+b*2+d.  Triangle slot 0 is the
    one containing corner (0,1) and (0,0)... classified by corner SET;
    the accumulator value lives at the owning cell's (x0, y0, z=top)
    node.  Returns (tri (etop,), nid (etop,)) int32 arrays."""
    nzc = nz - 1
    fn = np.asarray(ctx.surf.facet_nodes)        # (etop, 3) node ids
    k_n = fn % nz
    j_n = (fn // nz) % ny
    i_n = fn // (nz * ny)
    if not (k_n == nz - 1).all():
        raise ValueError("top facets off the top lane")
    i0 = i_n.min(axis=1)
    j0 = j_n.min(axis=1)
    a = i_n - i0[:, None]
    b = j_n - j0[:, None]
    codes = [frozenset(zip(a[r], b[r])) for r in range(fn.shape[0])]
    par = (i0 + j0 + nzc - 1) % 2
    tri = np.empty(fn.shape[0], dtype=np.int32)
    even0 = frozenset({(0, 0), (0, 1), (1, 1)})   # {1,3,7}
    even1 = frozenset({(0, 0), (1, 0), (1, 1)})   # {1,5,7}
    odd0 = frozenset({(0, 0), (0, 1), (1, 0)})    # {1,3,5}
    odd1 = frozenset({(0, 1), (1, 0), (1, 1)})    # {3,5,7}
    for r in range(fn.shape[0]):
        want0 = even0 if par[r] == 0 else odd0
        want1 = even1 if par[r] == 0 else odd1
        if codes[r] == want0:
            tri[r] = 0
        elif codes[r] == want1:
            tri[r] = 1
        else:
            raise ValueError("top facet is not a parity-diagonal "
                             "triangle of the 5-tet decomposition")
    nid = ((i0 * ny + j0) * nz + (nz - 1)).astype(np.int32)
    return tri, nid


def pallas3d_step_applicable(param: Param, ctx) -> bool:
    """Static gate for the fused 3D Pallas path; see module docstring."""
    from . import grid3d

    if not grid3d.grid_step_applicable(param, ctx):
        return False
    ctrl = param.control
    if ctrl.surface_process_option not in (0, 1) and ctx.surf.etop > 0:
        # options 11/101/102 need host/basin machinery -> grid3d path
        return False
    if _surf_on(param, ctx):
        try:
            _surf_maps(ctx, *ctx.sgrid)
        except ValueError:
            return False
    if param.sim.float_dtype != "float32":
        return False
    if param.sim.is_outputting_averaged_fields:
        return False
    if not ctrl.has_moving_mesh:
        return False
    if ctrl.damping_option not in (0, 1, 2, 3):
        return False
    if ctx.sbc.n_neu > 0 or param.bc.has_elastic_foundation:
        return False
    if ctx.sbc.n_grav > 0:
        try:
            _grav_facets_structured_3d(param, ctx)
        except ValueError:
            return False
    if ctx.vbc.incl is not None:
        return False
    nx, ny, nz = ctx.sgrid
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    if nxc % 128 != 0 or nzc % 8 != 0:
        return False
    if _pick_ty(nyc, nzc, nxc, _nce(param),
                halo=_halo_for(param, ctx)) is None:
        return False
    return True


# ---- packing / unpacking (chunk boundaries) ----

def state_to_pgrid(s, nx: int, ny: int, nz: int, pad: int = PAD,
                   surf_maps=None):
    """AoS State -> packed ghost-padded planes (epack in .volume, npack
    in .coord; every other field is passthrough, cf. pallas2d).
    ``surf_maps`` (from _surf_maps) additionally packs dhacc and the
    per-facet edvacc_surf accumulators into their nodal slots."""
    PAD = pad
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    LZN, LXN = _pad8(nz), _pad128(nx)

    def e2p(a):  # (nelem,) -> (5, nyc, nzc, nxc)
        return a.reshape(nxc, nyc, nzc, 5).transpose(3, 1, 2, 0)

    planes = [e2p(getattr(s, f)) for f in E_SCALAR_IN]
    for f in T_SLOTS:
        t = getattr(s, f)  # (nelem, 6)
        p = t.reshape(nxc, nyc, nzc, 5, 6).transpose(4, 3, 1, 2, 0)
        planes.extend([p[i] for i in range(6)])
    planes.append(e2p(s.edvoldt))
    p = s.strain_rate.reshape(nxc, nyc, nzc, 5, 6).transpose(4, 3, 1, 2, 0)
    planes.extend([p[i] for i in range(6)])
    epack = jnp.stack(planes)  # (NE, 5, nyc, nzc, nxc)
    epack = jnp.pad(epack, ((0, 0), (0, 0), (PAD, PAD), (0, 0), (0, 0)))
    # ghost volume = 1 keeps 1/vol finite without masking in shape_fn
    for nm in ("volume", "volume_old"):
        k = _eslot(nm)
        epack = epack.at[k, :, :PAD].set(1.0)
        epack = epack.at[k, :, PAD + nyc:].set(1.0)

    def n2p(a):  # (nnode,) -> (ny, nz, nx); node id = (i*ny + j)*nz + k
        return a.reshape(nx, ny, nz).transpose(1, 2, 0)

    nnode = nx * ny * nz
    if surf_maps is not None:
        tri, nid = surf_maps
        eva = jnp.zeros(nnode, s.edvacc_surf.dtype).at[
            jnp.asarray(nid[tri == 0])].set(s.edvacc_surf[tri == 0])
        evb = jnp.zeros(nnode, s.edvacc_surf.dtype).at[
            jnp.asarray(nid[tri == 1])].set(s.edvacc_surf[tri == 1])
        dhacc = s.dhacc
    else:
        eva = evb = dhacc = jnp.zeros(nnode, s.coord.dtype)
    nplanes = [n2p(s.coord[:, 0]), n2p(s.coord[:, 1]), n2p(s.coord[:, 2]),
               n2p(s.vel[:, 0]), n2p(s.vel[:, 1]), n2p(s.vel[:, 2]),
               n2p(s.temperature), n2p(s.mass), n2p(s.tmass),
               n2p(s.volume_n),
               n2p(dhacc), n2p(eva), n2p(evb),
               n2p(s.hmass),
               n2p(s.force[:, 0]), n2p(s.force[:, 1]), n2p(s.force[:, 2])]
    npack = jnp.stack(nplanes)  # (NN, ny, nz, nx)
    npack = jnp.pad(npack, ((0, 0), (PAD, PAD), (0, LZN - nz),
                            (0, LXN - nx)))
    # ghost mass/tmass/volume_n = 1: never read at real nodes, keeps the
    # first-step ghost divisions finite (outputs re-set them each step)
    for nm in ("mass", "tmass", "volume_n"):
        k = _nslot(nm)
        npack = npack.at[k, :PAD].set(1.0)
        npack = npack.at[k, PAD + ny:].set(1.0)
        npack = npack.at[k, :, nz:].set(1.0)
        npack = npack.at[k, :, :, nx:].set(1.0)
    return dataclasses.replace(s, coord=npack, volume=epack)


def pgrid_to_state(g, nx: int, ny: int, nz: int, pad: int = PAD,
                   surf_maps=None):
    """Packed planes -> AoS State."""
    PAD = pad
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    nelem = nxc * nyc * nzc * 5
    epack = g.volume[:, :, PAD:PAD + nyc]
    npack = g.coord[:, PAD:PAD + ny, :nz, :nx]

    def p2e(p):  # (5, nyc, nzc, nxc) -> (nelem,)
        return p.transpose(3, 1, 2, 0).reshape(nelem)

    def p2t(k):  # 6 slot planes -> (nelem, 6)
        return epack[k:k + 6].transpose(4, 2, 3, 1, 0).reshape(nelem, 6)

    upd = {f: p2e(epack[_eslot(f)]) for f in E_SLOTS}
    upd["stress"] = p2t(_eslot("stress"))
    upd["strain"] = p2t(_eslot("strain"))
    upd["strain_rate"] = p2t(_eslot("strain_rate"))

    def p2n(k):  # (ny, nz, nx) -> (nnode,)
        return npack[k].transpose(2, 0, 1).reshape(nx * ny * nz)

    upd["coord"] = jnp.stack([p2n(0), p2n(1), p2n(2)], axis=1)
    upd["vel"] = jnp.stack([p2n(3), p2n(4), p2n(5)], axis=1)
    upd["temperature"] = p2n(6)
    upd["mass"] = p2n(7)
    upd["tmass"] = p2n(8)
    upd["volume_n"] = p2n(9)
    upd["hmass"] = p2n(_nslot("hmass"))
    upd["force"] = jnp.stack([p2n(_nslot("force_x")),
                              p2n(_nslot("force_y")),
                              p2n(_nslot("force_z"))], axis=1)
    if surf_maps is not None:
        tri, nid = surf_maps
        upd["dhacc"] = p2n(_nslot("dhacc"))
        pa = p2n(_nslot("edv_a"))
        pb = p2n(_nslot("edv_b"))
        nid_j = jnp.asarray(nid)
        upd["edvacc_surf"] = jnp.where(jnp.asarray(tri) == 0,
                                       pa[nid_j], pb[nid_j])
    return dataclasses.replace(g, **upd)


def _const_npack(param, ctx, s, nx, ny, nz, pad: int = PAD):
    """Per-chunk constant nodal planes: top mask + vbc component masks."""
    PAD = pad
    LZN, LXN = _pad8(nz), _pad128(nx)
    dtype = jnp.float32

    def n2p(a):
        return jnp.asarray(a, dtype).reshape(nx, ny, nz).transpose(1, 2, 0)

    top = n2p(ctx.top_mask.astype(dtype))
    coord_flat = s.coord
    zeros = jnp.zeros_like(coord_flat)
    ones = jnp.ones_like(coord_flat)
    a = bc_mod.apply_vbcs(ctx.vbc, zeros, coord_flat, s.time)
    b = bc_mod.apply_vbcs(ctx.vbc, ones, coord_flat, s.time)
    mask = (a == b).astype(dtype)  # constrained components
    cnpack = jnp.stack([top, n2p(mask[:, 0]), n2p(mask[:, 1]),
                        n2p(mask[:, 2])])
    return jnp.pad(cnpack, ((0, 0), (PAD, PAD), (0, LZN - nz),
                            (0, LXN - nx)))


def _const_epack(param, ctx, s, nx, ny, nz, pad: int = PAD):
    """Per-chunk constant element planes (multi-material path):
    radiogenic source + the nmat raw marker-weight planes.  Property
    MIXTURES are computed in-kernel from the weights (see CE3_SLOTS
    note — the pre-mixed-plane design oversubscribes VMEM at the
    983k-tet tile size).  (NCE, 5, nyp_c, nzc, nxc), ghost y rows
    zero."""
    PAD = pad
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    dtype = s.emw.dtype
    nmat = s.emw.shape[1]
    # (nelem, nmat) -> (5, nyc, nzc, nxc, nmat), cf. state_to_pgrid.e2p
    emw = s.emw.reshape(nxc, nyc, nzc, 5, nmat).transpose(3, 1, 2, 0, 4)

    rad = s.radiogenic_source.reshape(nxc, nyc, nzc, 5).transpose(3, 1,
                                                                  2, 0)
    planes = [rad]
    for m in range(nmat):
        planes.append(emw[..., m])
    cepack = jnp.stack(planes).astype(dtype)
    return jnp.pad(cepack, ((0, 0), (0, 0), (PAD, PAD), (0, 0), (0, 0)))


def _np_tab(tab):
    class NS:
        pass

    out = NS()
    for f in dataclasses.fields(tab):
        v = getattr(tab, f.name)
        out.__dict__[f.name] = np.asarray(v) if hasattr(v, "shape") \
            else float(v)
    return out


def make_pallas_step(param: Param, ctx, compensation_pressure: float = 0.0):
    """Build step(ctx, pstate) -> pstate on packed padded planes."""
    ctrl = param.control
    mat = param.mat
    nx, ny, nz = ctx.sgrid
    nxc, nyc, nzc = nx - 1, ny - 1, nz - 1
    surf_on = _surf_on(param, ctx)
    H = _halo_for(param, ctx)   # shadows the module constant on purpose
    PAD = H                     # (surface diffusion adds one stencil hop)
    LZN, LXN = _pad8(nz), _pad128(nx)
    TY = _pick_ty(nyc, nzc, nxc, _nce(param), halo=H)
    T = nyc // TY
    NWy = TY + 2 * H          # local cell rows
    NYN = NWy + 1             # local node rows
    TYN = TY + 1              # node rows written out (overlaps next tile)
    nyp_c = nyc + 2 * PAD
    nyp_n = ny + 2 * PAD
    rheol = mat.rheol_type
    npe = 4.0
    dtype = jnp.float32
    tabn = _np_tab(ctx.mat)
    visc_min = float(tabn.visc_min)
    visc_max = float(tabn.visc_max)
    tension_max = float(tabn.tension_max)
    therm_diff_max = float(tabn.therm_diff_max)
    max_vbc_val = float(ctx.max_vbc_val)
    pseudo_speed = max_vbc_val * ctrl.inertial_scaling
    surface_T = float(param.bc.surface_temperature)
    swave_ref = float(np.sqrt(mat.bulk_modulus[mat.mattype_ref]
                              / mat.rho0[mat.mattype_ref]))
    even_t, odd_t = tet_tables()
    nmat = int(np.asarray(tabn.rho0).shape[0])
    NCE = len(CE3_SLOTS) + nmat
    uniform_mat = _uniform_mat(param)
    grav3 = _grav_facets_structured_3d(param, ctx)
    # timing-ablation knob (DEV ONLY — produces wrong physics): comma
    # list of phase tags to stub out, for locating kernel time on real
    # hardware.  e.g. DES_P3D_ABLATE=cfl,jaumann
    import os as _os

    _ablate = set(filter(None, _os.environ.get(
        "DES_P3D_ABLATE", "").split(",")))

    # single material + uniform ICs: property mixtures are compile-time
    # scalars (matprops.cxx:115-144 — the mixing mean of one material is
    # the material value regardless of marker weights); otherwise they
    # are per-chunk const planes from _const_epack
    CE_CONST = {}
    if uniform_mat:
        phi_s = float(tabn.porosity[0])
        rho0_s = float(tabn.rho0[0])
        alpha_s = float(tabn.alpha[0])
        g_s = float(ctrl.gravity)
        K_s = float(tabn.bulk_modulus[0])
        G_s = float(tabn.shear_modulus[0])
        cp_s = float(tabn.heat_capacity[0])
        ab_s = float(tabn.biot_coeff[0])
        bf_s = 1.0 / float(tabn.fluid_bulk_modulus[0])
        CE_CONST = {
            "radiogenic_source": 0.0,
            "bulkm": K_s, "shearm": G_s,
            "kappa": float(tabn.therm_cond[0]),
            "rhoA": rho0_s, "rhoB": rho0_s * alpha_s,
            "buoyA": ((1 - phi_s) * rho0_s + 1000.0 * phi_s) * g_s / npe,
            "buoyB": (1 - phi_s) * rho0_s * alpha_s * g_s / npe,
            "cpA": cp_s * rho0_s, "cpB": cp_s * rho0_s * alpha_s,
            # hmass coefficient: 3D bulk_comp = 1/K (geometry.cxx:1098)
            "hmA": ((ab_s + phi_s - ab_s * phi_s) / K_s
                    + phi_s * bf_s) / npe,
        }

    # ---------------- kernel-local physics helpers ----------------

    def _c(v):
        """Typed f32 scalar (weak python floats inside where become f64
        Mosaic constants, which the TPU lowering rejects)."""
        return jnp.asarray(v, dtype)

    def visc_core_local(w, Tm, s0, edot):
        """matprops.visc_core with the mat axis as a python loop."""
        log_edot = jnp.log(edot)
        acc = jnp.zeros_like(Tm)
        wsum = jnp.zeros_like(Tm)
        for m in range(nmat):
            pw = 1.0 / float(tabn.visc_exponent[m]) - 1.0
            pw1 = -1.0 / float(tabn.visc_exponent[m])
            log_coef = float(np.log(0.75 * tabn.visc_coefficient[m]))
            expo = ((float(tabn.visc_activation_energy[m])
                     + float(tabn.visc_activation_volume[m]) * s0)
                    / (float(tabn.visc_exponent[m]) * GAS_CONSTANT * Tm))
            log_v0 = (float(np.log(0.25)) + pw * log_edot
                      + pw1 * log_coef + expo + float(np.log(1e6)))
            acc = acc + w[m] * jnp.exp(-log_v0)
            wsum = wsum + w[m]
        v = wsum / acc
        return jnp.clip(v, jnp.asarray(visc_min, dtype),
                        jnp.asarray(visc_max, dtype))

    def plastic_props_local(w, pls):
        """matprops.plastic_props/plastic_weakening, mat loop."""
        c = f = d = h = wsum = None
        for m in range(nmat):
            pls0 = float(tabn.pls0[m])
            pls1 = float(tabn.pls1[m])
            span = max(pls1 - pls0, 1e-300)
            p = jnp.clip((pls - pls0) / span, 0.0, 1.0)
            c_m = float(tabn.cohesion0[m]) + p * (
                float(tabn.cohesion1[m]) - float(tabn.cohesion0[m]))
            f_m = float(tabn.friction_angle0[m]) + p * (
                float(tabn.friction_angle1[m])
                - float(tabn.friction_angle0[m]))
            d_m = float(tabn.dilation_angle0[m]) + p * (
                float(tabn.dilation_angle1[m])
                - float(tabn.dilation_angle0[m]))
            in_w = (pls >= pls0) & (pls < pls1)
            # both branches must be typed f32: a scalar/scalar where of
            # weak python floats becomes an f64 vector select in Mosaic
            h_m = jnp.where(
                in_w,
                jnp.asarray((float(tabn.cohesion1[m])
                             - float(tabn.cohesion0[m])) / span, dtype),
                jnp.asarray(0.0, dtype))
            if c is None:
                c, f, d, h = w[m] * c_m, w[m] * f_m, w[m] * d_m, \
                    w[m] * h_m
                wsum = w[m] + 0.0 * c_m
            else:
                c = c + w[m] * c_m
                f = f + w[m] * f_m
                d = d + w[m] * d_m
                h = h + w[m] * h_m
                wsum = wsum + w[m]
        c, f, d, h = c / wsum, f / wsum, d / wsum, h / wsum
        DEG2RAD = np.pi / 180.0
        sphi = jnp.sin(f * DEG2RAD)
        spsi = jnp.sin(d * DEG2RAD)
        anphi = (1.0 + sphi) / (1.0 - sphi)
        anpsi = (1.0 + spsi) / (1.0 - spsi)
        amc = 2.0 * c * jnp.sqrt(anphi)
        tanphi = jnp.tan(f * DEG2RAD)
        ten_max = jnp.where(
            f == 0.0, jnp.asarray(tension_max, dtype),
            jnp.minimum(tension_max,
                        c / jnp.where(tanphi == 0.0, _c(1.0), tanphi)))
        return amc, anphi, anpsi, h, ten_max

    # corner code = a*4 + b*2 + d for offsets (a, b, d) in x/y/z
    def nviews(g):
        """Nodal local plane (NYN, LZN, LXN) -> 8 shifted cell views,
        each (NWy, nzc, nxc).

        z/x shifts are rolls + PREFIX slices, not offset slices: an
        offset slice gives the view a Mosaic offset layout in the
        (sublane, lane) dims that then poisons every downstream
        pad/concat ("result/input offset mismatch on non-concat
        dimension", same story as pad_corner).  Rolls materialize the
        shift at offset {0,0}; shifts are the positive n-1 (Mosaic
        checks on negative rotate amounts), and the wrapped-in far
        row/lane lands outside the [:nzc,:nxc] prefix.  The y (dim 0)
        shift is a plain slice — the leading dim is untiled, so its
        offsets don't enter the vector layout."""
        sz = jnp.asarray(LZN - 1, jnp.int32)   # == roll by -1 along z
        sx = jnp.asarray(LXN - 1, jnp.int32)   # == roll by -1 along x
        out = []
        for a in (0, 1):
            ga = pltpu.roll(g, sx, 2) if a else g
            for b in (0, 1):
                gb = ga[b:b + NWy]
                for d in (0, 1):
                    gd = pltpu.roll(gb, sz, 1) if d else gb
                    out.append(gd[:, :nzc, :nxc])
        return out

    def _code(a, b, d):
        return a * 4 + b * 2 + d

    def gather_tet(views, t, par):
        """4 corner-slot planes of tet t from the 8 shifted views."""
        return tuple(jnp.where(par, views[even_t[t][s]],
                               views[odd_t[t][s]])
                     for s in range(4))

    def pad_corner(v, code):
        """Cell plane (NWy, nzc, nxc) -> node plane (NYN, LZN, LXN),
        offset to corner `code`.

        z/x offsets are applied as trailing-only zero pads + unit rolls,
        NOT leading pads: a leading lane/sublane pad gives the operand a
        Mosaic offset layout, and the later concat along another dim then
        fails to compile ("result/input offset mismatch on non-concat
        dimension").  The roll wraps a trailing zero to the front, which
        is exactly the leading pad.  The y (dim 0) offset stays a plain
        pad — the leading dim is untiled."""
        a, b, d = code >> 2 & 1, code >> 1 & 1, code & 1
        one = jnp.asarray(1, jnp.int32)  # weak 1 promotes to i64 under x64
        w = jnp.pad(v, ((b, 1 - b), (0, LZN - nzc), (0, LXN - nxc)))
        if d:
            w = pltpu.roll(w, one, 1)
        if a:
            w = pltpu.roll(w, one, 2)
        return w

    def scatter_tet(acc, contribs, t, par):
        """Transpose of gather_tet: add 4 corner-slot cell planes of tet
        t into the nodal accumulator (contribs must be pre-masked)."""
        per_e = [None] * 8
        per_o = [None] * 8
        for s in range(4):
            ce, co = even_t[t][s], odd_t[t][s]
            c = contribs[s]
            per_e[ce] = c if per_e[ce] is None else per_e[ce] + c
            per_o[co] = c if per_o[co] is None else per_o[co] + c
        for code in range(8):
            e, o = per_e[code], per_o[code]
            if e is None and o is None:
                continue
            if e is None:
                v = jnp.where(par, _c(0.0), o)
            elif o is None:
                v = jnp.where(par, e, _c(0.0))
            else:
                v = jnp.where(par, e, o)
            acc = acc + pad_corner(v, code)
        return acc

    def scatter_tet_equal(acc, v, t, par):
        """scatter_tet when all 4 slots carry the same value."""
        return scatter_tet(acc, (v, v, v, v), t, par)

    def volume_of(xs, ys, zs):
        d1 = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
        d2 = (xs[2] - xs[0], ys[2] - ys[0], zs[2] - zs[0])
        d3 = (xs[3] - xs[0], ys[3] - ys[0], zs[3] - zs[0])
        return (d1[0] * (d2[1] * d3[2] - d2[2] * d3[1])
                + d1[1] * (d2[2] * d3[0] - d2[0] * d3[2])
                + d1[2] * (d2[0] * d3[1] - d2[1] * d3[0])) / 6.0

    def shape_fn(xs, ys, zs, vol_safe):
        iv = 1.0 / (6.0 * vol_safe)

        def d(a, i, j):
            return a[i] - a[j]

        x01, x02, x03 = d(xs, 0, 1), d(xs, 0, 2), d(xs, 0, 3)
        x12, x13, x23 = d(xs, 1, 2), d(xs, 1, 3), d(xs, 2, 3)
        y01, y02, y03 = d(ys, 0, 1), d(ys, 0, 2), d(ys, 0, 3)
        y12, y13, y23 = d(ys, 1, 2), d(ys, 1, 3), d(ys, 2, 3)
        z01, z02, z03 = d(zs, 0, 1), d(zs, 0, 2), d(zs, 0, 3)
        z12, z13, z23 = d(zs, 1, 2), d(zs, 1, 3), d(zs, 2, 3)
        dndx = (iv * (y13 * z12 - y12 * z13), iv * (y02 * z23 - y23 * z02),
                iv * (y13 * z03 - y03 * z13), iv * (y01 * z02 - y02 * z01))
        dndy = (iv * (z13 * x12 - z12 * x13), iv * (z02 * x23 - z23 * x02),
                iv * (z13 * x03 - z03 * x13), iv * (z01 * x02 - z02 * x01))
        dndz = (iv * (x13 * y12 - x12 * y13), iv * (x02 * y23 - x23 * y02),
                iv * (x13 * y03 - x03 * y13), iv * (x01 * y02 - x02 * y01))
        return dndx, dndy, dndz

    def min_height(xs, ys, zs, vol):
        """3*V / largest facet area (geometry.cxx:830-852)."""
        def tri_area(i, j, k):
            ux, uy, uz = xs[j] - xs[i], ys[j] - ys[i], zs[j] - zs[i]
            vx, vy, vz = xs[k] - xs[i], ys[k] - ys[i], zs[k] - zs[i]
            cx = uy * vz - uz * vy
            cy = uz * vx - ux * vz
            cz = ux * vy - uy * vx
            return 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)

        maxa = jnp.maximum(
            jnp.maximum(tri_area(0, 1, 2), tri_area(0, 1, 3)),
            jnp.maximum(tri_area(2, 3, 0), tri_area(2, 3, 1)))
        return 3.0 * vol / maxa

    def inv2_6(t):
        a = (t[0] + t[1] + t[2]) / 3.0
        return (0.5 * ((t[0] - a) ** 2 + (t[1] - a) ** 2 + (t[2] - a) ** 2)
                + t[3] ** 2 + t[4] ** 2 + t[5] ** 2)

    # parity is static across tiles: tile starts are multiples of TY
    # (even), so the (i+j+k) parity offset of every local block is (-H)%2
    par_off = (-H) % 2

    def make_parity():
        iy = jax.lax.broadcasted_iota(jnp.int32, (NWy, nzc, nxc), 0)
        iz = jax.lax.broadcasted_iota(jnp.int32, (NWy, nzc, nxc), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (NWy, nzc, nxc), 2)
        return jnp.bitwise_and(ix + iy + iz + par_off, 1) == 0

    # ---------------- the fused kernel ----------------

    def kernel(dt_ref, epack_hbm, npack_hbm, cep_hbm, cnp_hbm, tgt_hbm,
               eout_hbm, nout_hbm, red_ref,
               e_vm, n_vm, ce_vm, cn_vm, tgt_vm, eo_vm, no_vm, sems):
        big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)
        red_ref[0, 0] = big
        red_ref[0, 1] = big
        red_ref[0, 2] = jnp.asarray(0.0, dtype)
        red_ref[0, 3] = jnp.asarray(0.0, dtype)

        def tile_body(t, carry):
            _tile(t, dt_ref, epack_hbm, npack_hbm, cep_hbm, cnp_hbm,
                  tgt_hbm, eout_hbm, nout_hbm, red_ref,
                  e_vm, n_vm, ce_vm, cn_vm, tgt_vm, eo_vm, no_vm, sems)
            return carry

        jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                          jnp.asarray(T, jnp.int32), tile_body,
                          jnp.asarray(0, jnp.int32))

    def _tile(tt, dt_ref, epack_hbm, npack_hbm, cep_hbm, cnp_hbm,
              tgt_hbm, eout_hbm, nout_hbm, red_ref,
              e_vm, n_vm, ce_vm, cn_vm, tgt_vm, eo_vm, no_vm, sems):
        # all index math in explicit int32 (x64 weak-int promotion breaks
        # the Mosaic verification); c0 = a + PAD - H = a since PAD == H
        a = tt * jnp.asarray(TY, jnp.int32)

        dma_e = pltpu.make_async_copy(
            epack_hbm.at[pl.ds(0, NE_IN), :, pl.ds(a, NWy)], e_vm,
            sems.at[jnp.asarray(0, jnp.int32)])
        dma_n = pltpu.make_async_copy(
            npack_hbm.at[pl.ds(0, NN_IN), pl.ds(a, NYN)], n_vm,
            sems.at[jnp.asarray(1, jnp.int32)])
        if not uniform_mat:
            dma_ce = pltpu.make_async_copy(
                cep_hbm.at[:, :, pl.ds(a, NWy)], ce_vm,
                sems.at[jnp.asarray(6, jnp.int32)])
        dma_cn = pltpu.make_async_copy(
            cnp_hbm.at[:, pl.ds(a, NYN)], cn_vm,
            sems.at[jnp.asarray(2, jnp.int32)])
        dma_t = pltpu.make_async_copy(
            tgt_hbm.at[:, pl.ds(a, NYN)], tgt_vm,
            sems.at[jnp.asarray(3, jnp.int32)])
        dma_e.start()
        dma_n.start()
        if not uniform_mat:
            dma_ce.start()
        dma_cn.start()
        dma_t.start()
        dma_e.wait()
        dma_n.wait()
        if not uniform_mat:
            dma_ce.wait()
        dma_cn.wait()
        dma_t.wait()

        dt = dt_ref[0, 0]
        par = make_parity()

        # y-ghost cell mask: global cell row in [0, nyc)
        gy = jax.lax.broadcasted_iota(jnp.int32, (NWy, nzc, nxc), 0) \
            + (a - jnp.asarray(H, jnp.int32))
        vmask = (gy >= 0) & (gy < jnp.asarray(nyc, jnp.int32))
        # real-node indicator (ghost rows/lanes): keeps mass/volume_n
        # outputs 1 at ghosts so next step's ghost divisions stay finite
        gyn = jax.lax.broadcasted_iota(jnp.int32, (NYN, LZN, LXN), 0) \
            + (a - jnp.asarray(H, jnp.int32))
        nzi = jax.lax.broadcasted_iota(jnp.int32, (NYN, LZN, LXN), 1)
        nxi = jax.lax.broadcasted_iota(jnp.int32, (NYN, LZN, LXN), 2)
        node_ghost = ((gyn < 0) | (gyn > jnp.asarray(nyc, jnp.int32))
                      | (nzi >= jnp.asarray(nz, jnp.int32))
                      | (nxi >= jnp.asarray(nx, jnp.int32)))
        ghost1 = jnp.where(node_ghost, _c(1.0), _c(0.0))

        def E(nm, t):
            return e_vm[_eslot(nm), t]

        def TEN(nm, t):
            k = _eslot(nm)
            return tuple(e_vm[k + i, t] for i in range(6))

        def N(nm):
            return n_vm[_nslot(nm)]

        if uniform_mat:
            def CE(nm, t):
                return CE_CONST[nm]

            def W(t):
                return [1.0]
        else:
            def W(t):
                return [ce_vm[len(CE3_SLOTS) + m, t]
                        for m in range(nmat)]

            # property mixtures recomputed in-kernel from the weight
            # planes (matprops.cxx:115-144 means; same formulas as the
            # 2D glue's _const_packs).  Deliberately NOT memoized: a
            # (name, tet) cache extends every mixture's live range
            # across the whole tile body, and the resulting scoped-vmem
            # stack blows the 120 MB budget at the 983k-tet tile size
            # (measured: kernel-vmem-stack OOM); recomputing costs a
            # handful of VPU ops per use
            def CE(nm, t):
                if nm == "radiogenic_source":
                    return ce_vm[_ce3slot(nm), t]
                w = W(t)
                ws = w[0]
                for wm in w[1:]:
                    ws = ws + wm
                ws = jnp.where(ws > 0, ws, _c(1.0))

                def amean(vals):
                    acc = w[0] * _c(float(vals[0]))
                    for m in range(1, nmat):
                        acc = acc + w[m] * _c(float(vals[m]))
                    return acc / ws

                def hmean(vals):
                    acc = w[0] / _c(float(vals[0]))
                    for m in range(1, nmat):
                        acc = acc + w[m] / _c(float(vals[m]))
                    return ws / acc

                gg = float(ctrl.gravity)
                if nm == "bulkm":
                    r = hmean(tabn.bulk_modulus)
                elif nm == "shearm":
                    r = hmean(tabn.shear_modulus)
                elif nm == "kappa":
                    r = amean(tabn.therm_cond)
                elif nm == "rhoA":
                    r = amean(tabn.rho0)
                elif nm == "rhoB":
                    r = amean(tabn.rho0 * tabn.alpha)
                elif nm == "buoyA":
                    phi = amean(tabn.porosity)
                    r = ((1.0 - phi) * CE("rhoA", t)
                         + 1000.0 * phi) * _c(gg / npe)
                elif nm == "buoyB":
                    phi = amean(tabn.porosity)
                    r = (1.0 - phi) * CE("rhoB", t) * _c(gg / npe)
                elif nm == "cpA":
                    r = amean(tabn.heat_capacity) * CE("rhoA", t)
                elif nm == "cpB":
                    r = amean(tabn.heat_capacity) * CE("rhoB", t)
                elif nm == "hmA":
                    phi = amean(tabn.porosity)
                    ab = amean(tabn.biot_coeff)
                    bf = hmean(1.0 / tabn.fluid_bulk_modulus)
                    # 3D bulk_comp = 1/K (geometry.cxx:1098)
                    r = ((ab + phi - ab * phi) / CE("bulkm", t)
                         + phi * bf) / _c(npe)
                else:  # pragma: no cover
                    raise KeyError(nm)
                return r

        zero_n = jnp.zeros((NYN, LZN, LXN), dtype=dtype)
        cx_v = nviews(N("coord_x"))
        cy_v = nviews(N("coord_y"))
        cz_v = nviews(N("coord_z"))
        vx_v = nviews(N("vel_x"))
        vy_v = nviews(N("vel_y"))
        vz_v = nviews(N("vel_z"))
        ts_v = nviews(N("temperature"))

        # ---- phase 1: dvoldt numerator + temperature diffusion ----
        dv_acc = zero_n
        tdot_acc = zero_n
        for t in range(5 if "ph1" not in _ablate else 0):
            xs = gather_tet(cx_v, t, par)
            ys = gather_tet(cy_v, t, par)
            zs = gather_tet(cz_v, t, par)
            vxs = gather_tet(vx_v, t, par)
            vys = gather_tet(vy_v, t, par)
            vzs = gather_tet(vz_v, t, par)
            vol = E("volume", t)
            vol_safe = jnp.where(vmask, vol, _c(1.0))
            dndx, dndy, dndz = shape_fn(xs, ys, zs, vol_safe)
            tr = (sum(vxs[i] * dndx[i] for i in range(4))
                  + sum(vys[i] * dndy[i] for i in range(4))
                  + sum(vzs[i] * dndz[i] for i in range(4)))
            dv_acc = scatter_tet_equal(
                dv_acc, jnp.where(vmask, tr * vol, _c(0.0)), t, par)
            if ctrl.has_thermal_diffusion:
                ts = gather_tet(ts_v, t, par)
                gx = sum(dndx[i] * ts[i] for i in range(4))
                gy_ = sum(dndy[i] * ts[i] for i in range(4))
                gz = sum(dndz[i] * ts[i] for i in range(4))
                kv = CE("kappa", t) * vol
                if uniform_mat:
                    # radiogenic source = 0 (temperature options 0/1/90)
                    source = _c(0.0)
                else:
                    # radiogenic source (fields.cxx:197-283)
                    TinC1 = (ts[0] + ts[1] + ts[2] + ts[3]) / npe \
                        - CELSIUS0
                    rho_e1 = CE("rhoA", t) - CE("rhoB", t) * TinC1
                    source = CE("radiogenic_source", t) * vol \
                        * rho_e1 / npe
                contribs = tuple(
                    jnp.where(vmask,
                              kv * (dndx[i] * gx + dndy[i] * gy_
                                    + dndz[i] * gz) - source, _c(0.0))
                    for i in range(4))
                tdot_acc = scatter_tet(tdot_acc, contribs, t, par)

        dvoldt = dv_acc / N("volume_n")
        dv_views = nviews(dvoldt)
        temperature_new = N("temperature")
        if ctrl.has_thermal_diffusion:
            temperature_new = jnp.where(
                cn_vm[0] > 0, _c(surface_T),
                N("temperature") - dt * tdot_acc / N("tmass"))

        # ---- phase 2: constitutive update + force assembly ----
        # (2a: stress update on the full halo extent, staged in eo_vm;
        #  with NMD, the nodal dpressure smoothing runs between 2a and
        #  the force scatter of 2b, cf. geometry.cxx NMD + grid3d:394-400)
        nmd = bool(ctrl.is_using_mixed_stress)
        fx_acc = zero_n
        fy_acc = zero_n
        fz_acc = zero_n
        dp_acc = zero_n

        def put_e(nm, t, v):
            eo_vm[_eslot(nm), t] = v

        def put_t6(nm, t, comps):
            k = _eslot(nm)
            for i in range(6):
                eo_vm[k + i, t] = comps[i]

        def force_scatter(t, stress_c, buoy, vol, dndx, dndy, dndz,
                          fx_acc, fy_acc, fz_acc):
            fxc = tuple(jnp.where(
                vmask,
                (stress_c[0] * dndx[i] + stress_c[3] * dndy[i]
                 + stress_c[4] * dndz[i]) * vol, _c(0.0))
                for i in range(4))
            fyc = tuple(jnp.where(
                vmask,
                (stress_c[3] * dndx[i] + stress_c[1] * dndy[i]
                 + stress_c[5] * dndz[i]) * vol, _c(0.0))
                for i in range(4))
            fzc = tuple(jnp.where(
                vmask,
                (stress_c[4] * dndx[i] + stress_c[5] * dndy[i]
                 + stress_c[2] * dndz[i] + buoy) * vol, _c(0.0))
                for i in range(4))
            return (scatter_tet(fx_acc, fxc, t, par),
                    scatter_tet(fy_acc, fyc, t, par),
                    scatter_tet(fz_acc, fzc, t, par))

        for t in range(5):
            xs = gather_tet(cx_v, t, par)
            ys = gather_tet(cy_v, t, par)
            zs = gather_tet(cz_v, t, par)
            vxs = gather_tet(vx_v, t, par)
            vys = gather_tet(vy_v, t, par)
            vzs = gather_tet(vz_v, t, par)
            ts = gather_tet(ts_v, t, par)
            vol = E("volume", t)
            vol_safe = jnp.where(vmask, vol, _c(1.0))
            dndx, dndy, dndz = shape_fn(xs, ys, zs, vol_safe)
            temp_e = (ts[0] + ts[1] + ts[2] + ts[3]) / npe
            TinC = temp_e - CELSIUS0
            bulkm = _c(K_s) if uniform_mat else CE("bulkm", t)
            shearm = _c(G_s) if uniform_mat else CE("shearm", t)

            # strain rate (fields.cxx:408-483)
            lxx = sum(vxs[i] * dndx[i] for i in range(4))
            lyy = sum(vys[i] * dndy[i] for i in range(4))
            lzz = sum(vzs[i] * dndz[i] for i in range(4))
            lxy = 0.5 * (sum(vxs[i] * dndy[i] for i in range(4))
                         + sum(vys[i] * dndx[i] for i in range(4)))
            lxz = 0.5 * (sum(vxs[i] * dndz[i] for i in range(4))
                         + sum(vzs[i] * dndx[i] for i in range(4)))
            lyz = 0.5 * (sum(vys[i] * dndz[i] for i in range(4))
                         + sum(vzs[i] * dndy[i] for i in range(4)))
            sr = (lxx, lyy, lzz, lxy, lxz, lyz)

            # edvoldt anti-locking (geometry.cxx:202-276)
            dvs = gather_tet(dv_views, t, par)
            edvoldt = (dvs[0] + dvs[1] + dvs[2] + dvs[3]) / npe
            adj = (edvoldt - (lxx + lyy + lzz)) / 3.0
            edot = (lxx + adj, lyy + adj, lzz + adj, lxy, lxz, lyz)
            de = tuple(edot[i] * dt for i in range(6))
            strain_old = TEN("strain", t)
            strain = tuple(strain_old[i] + de[i] for i in range(6))

            # constitutive switch (rheology.cxx:676-991)
            stress_old = TEN("stress", t)
            plstrain = E("plstrain", t)
            delta_plstrain = E("delta_plstrain", t)
            viscosity = E("viscosity", t)

            def creep_visc():
                s0 = (stress_old[0] + stress_old[1] + stress_old[2]) / 3.0
                ed = jnp.maximum(jnp.sqrt(inv2_6(sr)), MIN_STRAIN_RATE)
                Tm_safe = jnp.where(vmask, temp_e, _c(300.0))
                return visc_core_local(W(t), Tm_safe, s0, ed)

            from . import rheology as R

            if "rheol" in _ablate:
                stress_c = tuple(stress_old[i] + de[i] for i in range(6))
            elif rheol == RH_ELASTIC:
                stress_c = R.elastic3_c(bulkm, shearm, de, stress_old)
            elif rheol == RH_VISCOUS:
                viscosity = creep_visc()
                total_dv = strain[0] + strain[1] + strain[2]
                stress_c = R.viscous3_c(bulkm, viscosity, total_dv, edot)
            elif rheol == RH_MAXWELL:
                viscosity = creep_visc()
                dv = vol / jnp.where(vmask, E("volume_old", t),
                                     _c(1.0)) - 1.0
                stress_c = R.maxwell3_c(bulkm, shearm, viscosity, dt, dv,
                                        de, stress_old)
            elif rheol == RH_EP:
                pls_safe = jnp.where(vmask, plstrain, _c(0.0))
                amc, anphi, anpsi, hardn, ten_max = plastic_props_local(
                    W(t), pls_safe)
                stress_c, depls, _ = R.elasto_plastic3_c(
                    bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                    de, stress_old)
                plstrain = plstrain + depls
                delta_plstrain = depls
            elif rheol == RH_EVP:
                viscosity = creep_visc()
                dv = vol / jnp.where(vmask, E("volume_old", t),
                                     _c(1.0)) - 1.0
                sv = R.maxwell3_c(bulkm, shearm, viscosity, dt, dv, de,
                                  stress_old)
                pls_safe = jnp.where(vmask, plstrain, _c(0.0))
                amc, anphi, anpsi, hardn, ten_max = plastic_props_local(
                    W(t), pls_safe)
                sp, depls, _ = R.elasto_plastic3_c(
                    bulkm, shearm, amc, anphi, anpsi, hardn, ten_max,
                    de, stress_old)
                use_v = inv2_6(sv) < inv2_6(sp)
                stress_c = tuple(jnp.where(use_v, p, q)
                                 for p, q in zip(sv, sp))
                plstrain = jnp.where(use_v, plstrain, plstrain + depls)
                delta_plstrain = jnp.where(use_v, delta_plstrain, depls)
            else:  # pragma: no cover - gated
                raise ValueError(f"pallas3d: unsupported rheology {rheol}")

            # force assembly (fields.cxx:612-703); with NMD the scatter
            # waits for the nodal dpressure smoothing (pass 2b)
            if ctrl.gravity != 0:
                buoy = (_c(CE_CONST["buoyA"]) - _c(CE_CONST["buoyB"])
                        * TinC) if uniform_mat else \
                    (CE("buoyA", t) - CE("buoyB", t) * TinC)
            else:
                buoy = jnp.zeros_like(vol)
            if nmd:
                old_tr = stress_old[0] + stress_old[1] + stress_old[2]
                dpress = (stress_c[0] + stress_c[1] + stress_c[2]
                          - old_tr)
                dp_acc = scatter_tet_equal(
                    dp_acc, jnp.where(vmask, dpress * vol, _c(0.0)),
                    t, par)
                put_e("dpressure", t, dpress)
            else:
                fx_acc, fy_acc, fz_acc = force_scatter(
                    t, stress_c, buoy, vol, dndx, dndy, dndz,
                    fx_acc, fy_acc, fz_acc)
                put_e("dpressure", t, E("dpressure", t))  # carry

            # stage pre-Jaumann outputs (rotated in phase 4)
            put_t6("stress", t, stress_c)
            put_t6("strain", t, strain)
            put_t6("strain_rate", t, edot)
            put_e("edvoldt", t, edvoldt)
            put_e("plstrain", t, plstrain)
            put_e("delta_plstrain", t, delta_plstrain)
            put_e("viscosity", t, viscosity)

        if nmd:
            # nodal mean-stress smoothing (grid3d:394-400): adjust the
            # staged stress diagonals, then scatter forces (pass 2b)
            dp_nd = dp_acc / N("volume_n")
            dp_views = nviews(dp_nd)
            for t in range(5):
                xs = gather_tet(cx_v, t, par)
                ys = gather_tet(cy_v, t, par)
                zs = gather_tet(cz_v, t, par)
                ts = gather_tet(ts_v, t, par)
                vol = E("volume", t)
                vol_safe = jnp.where(vmask, vol, _c(1.0))
                dndx, dndy, dndz = shape_fn(xs, ys, zs, vol_safe)
                temp_e = (ts[0] + ts[1] + ts[2] + ts[3]) / npe
                if ctrl.gravity != 0:
                    TinC2 = temp_e - CELSIUS0
                    buoy = (_c(CE_CONST["buoyA"])
                            - _c(CE_CONST["buoyB"]) * TinC2) \
                        if uniform_mat else \
                        (CE("buoyA", t) - CE("buoyB", t) * TinC2)
                else:
                    buoy = jnp.zeros_like(vol)
                dps = gather_tet(dp_views, t, par)
                dp_t = eo_vm[_eslot("dpressure"), t]
                ddp = ((dps[0] + dps[1] + dps[2] + dps[3]) / npe
                       - dp_t) / 3.0
                k = _eslot("stress")
                stress_c = (eo_vm[k, t] + ddp, eo_vm[k + 1, t] + ddp,
                            eo_vm[k + 2, t] + ddp, eo_vm[k + 3, t],
                            eo_vm[k + 4, t], eo_vm[k + 5, t])
                for i in range(3):
                    eo_vm[k + i, t] = stress_c[i]
                fx_acc, fy_acc, fz_acc = force_scatter(
                    t, stress_c, buoy, vol, dndx, dndy, dndz,
                    fx_acc, fy_acc, fz_acc)

        force_x = -fx_acc
        force_y = -fy_acc
        force_z = -fz_acc

        # residual L2 partial over owned nodes (last tile adds edge row)
        own_n = slice(H, H + TY)
        r2 = (force_x[own_n] ** 2 + force_y[own_n] ** 2
              + force_z[own_n] ** 2).sum()
        edge = (force_x[H + TY] ** 2 + force_y[H + TY] ** 2
                + force_z[H + TY] ** 2).sum()
        r2 = r2 + jnp.where(tt == jnp.asarray(T - 1, jnp.int32), edge,
                            _c(0.0))
        red_ref[0, 3] = red_ref[0, 3] + r2

        # gravity facet tractions (apply_stress_bcs, bc.cxx:632-790),
        # after the residual like grid3d: Winkler on the bottom facet
        # row, water loading on the top.  Per-parity (tet, corner-code)
        # groups come from _grav_facets_structured_3d; the cross product
        # uses the STORED node order, so the outward normal matches the
        # generic path bit-for-bit.  Every product sits INSIDE a masked
        # where: ghost coord rows are uninitialized HBM and a masked
        # 0 * NaN would still poison the pad-adds.
        if grav3 is not None:
            izc = jax.lax.broadcasted_iota(jnp.int32, (NWy, nzc, nxc), 1)
            gconst = _c(ctrl.gravity)
            third = _c(1.0 / 3.0)

            def facet_block(name, zrow, p_of, fx, fy, fz):
                rowm = izc == jnp.asarray(zrow, jnp.int32)
                for parval, pairs in grav3[name].items():
                    pmask = par if parval == 0 else jnp.logical_not(par)
                    corner_tab = even_t if parval == 0 else odd_t
                    for (t, codes) in pairs:
                        m = rowm & pmask & vmask
                        c0, c1, c2 = codes
                        e1 = tuple(jnp.where(m, v[c1] - v[c0], _c(0.0))
                                   for v in (cx_v, cy_v, cz_v))
                        e2 = tuple(jnp.where(m, v[c2] - v[c0], _c(0.0))
                                   for v in (cx_v, cy_v, cz_v))
                        nrx = 0.5 * (e1[1] * e2[2] - e1[2] * e2[1])
                        nry = 0.5 * (e1[2] * e2[0] - e1[0] * e2[2])
                        nrz = 0.5 * (e1[0] * e2[1] - e1[1] * e2[0])
                        zc_f = jnp.where(
                            m, (cz_v[c0] + cz_v[c1] + cz_v[c2]) * third,
                            _c(0.0))
                        pres = p_of(zc_f, t, corner_tab[t], m)
                        cfx = jnp.where(m, -pres * nrx * third, _c(0.0))
                        cfy = jnp.where(m, -pres * nry * third, _c(0.0))
                        cfz = jnp.where(m, -pres * nrz * third, _c(0.0))
                        for ci in codes:
                            fx = fx + pad_corner(cfx, ci)
                            fy = fy + pad_corner(cfy, ci)
                            fz = fz + pad_corner(cfz, ci)
                return fx, fy, fz

            if grav3["winkler"]:
                def p_wink(zc_f, t, corners, m):
                    # rho of the owning tet from PRE-update temperature
                    # (grid3d computes rho_e before the diffusion update)
                    ts4 = [jnp.where(m, ts_v[c], _c(0.0))
                           for c in corners]
                    TinC = (ts4[0] + ts4[1] + ts4[2] + ts4[3]) / npe \
                        - CELSIUS0
                    rho_f = (_c(CE_CONST["rhoA"])
                             - _c(CE_CONST["rhoB"]) * TinC) \
                        if uniform_mat else \
                        (CE("rhoA", t) - CE("rhoB", t) * TinC)
                    return (_c(compensation_pressure)
                            - (rho_f + _c(param.bc.winkler_delta_rho))
                            * gconst
                            * (zc_f + _c(param.mesh.zlength)))

                force_x, force_y, force_z = facet_block(
                    "bottom", 0, p_wink, force_x, force_y, force_z)
            if grav3["water"]:
                def p_water(zc_f, t, corners, m):
                    base = _c(ctrl.surf_base_level)
                    return jnp.where(
                        zc_f < base,
                        _c(1030.0) * gconst * (base - zc_f), _c(0.0))

                force_x, force_y, force_z = facet_block(
                    "top", nzc - 1, p_water, force_x, force_y, force_z)

        # ---- phase 3: damping + velocity + vbcs + coordinates ----
        mass_n = N("mass")

        def damp(f, v):
            if ctrl.damping_option == 0:
                return f
            if ctrl.damping_option == 1:
                moving = jnp.abs(v) > 1e-13
                return f - jnp.where(
                    moving,
                    ctrl.damping_factor * jnp.abs(f) * jnp.sign(v),
                    _c(0.0))
            if ctrl.damping_option == 2:
                return f * (1.0 - ctrl.damping_factor)
            # option 3
            pos = (f < 0) == (v < 0)
            return jnp.where(pos, f * (1.0 - ctrl.damping_factor),
                             f * (2.0 - ctrl.damping_factor))

        fdx = damp(force_x, N("vel_x"))
        fdy = damp(force_y, N("vel_y"))
        fdz = damp(force_z, N("vel_z"))
        vel_x = N("vel_x") + dt * fdx / mass_n
        vel_y = N("vel_y") + dt * fdy / mass_n
        vel_z = N("vel_z") + dt * fdz / mass_n
        vel_x = jnp.where(cn_vm[1] > 0, tgt_vm[0], vel_x)
        vel_y = jnp.where(cn_vm[2] > 0, tgt_vm[1], vel_y)
        vel_z = jnp.where(cn_vm[3] > 0, tgt_vm[2], vel_z)

        coord_x = N("coord_x") + vel_x * dt
        coord_y = N("coord_y") + vel_y * dt
        coord_z = N("coord_z") + vel_z * dt

        # ---- surface processes option 1: facet-FEM topography
        # diffusion (surface_dh_3d parity; bc.cxx:920-1050), applied
        # between the coordinate update and the post-move geometry
        # exactly like update_mesh (dynearthsol.cxx:431-473).  The top
        # quad of each cell splits into two triangles along the parity
        # diagonal (tet_tables); per-triangle slope/area contributions
        # scatter to the 4 top corners via pad_corner, then
        # dh = -k*dt*total_slope/total_area on top nodes. ----
        dhacc_new = N("dhacc")
        edva_new = N("edv_a")
        edvb_new = N("edv_b")
        if surf_on:
            izc3 = jax.lax.broadcasted_iota(jnp.int32, (NWy, nzc, nxc), 1)
            smask = vmask & (izc3 == jnp.asarray(nzc - 1, jnp.int32))
            cxv = nviews(coord_x)
            cyv = nviews(coord_y)
            czv = nviews(coord_z)
            # corner codes (a*4+b*2+d, d=1) in CCW (+z outward) order
            TRI_E = ((1, 7, 3), (1, 5, 7))
            TRI_O = ((1, 5, 3), (3, 5, 7))
            ts_acc = zero_n      # total_slope
            td_acc = zero_n      # total projected area
            pareas = []
            for t3 in range(2):
                ce3, co3 = TRI_E[t3], TRI_O[t3]
                px = tuple(jnp.where(par, cxv[ce3[j]], cxv[co3[j]])
                           for j in range(3))
                py = tuple(jnp.where(par, cyv[ce3[j]], cyv[co3[j]])
                           for j in range(3))
                pz = tuple(jnp.where(par, czv[ce3[j]], czv[co3[j]])
                           for j in range(3))
                nzA = ((px[1] - px[0]) * (py[2] - py[0])
                       - (py[1] - py[0]) * (px[2] - px[0]))
                parea = 0.5 * nzA
                pareas.append(parea)
                iv3 = 1.0 / (2.0 * jnp.where(parea != 0, parea, _c(1.0)))
                sdx = (iv3 * (py[1] - py[2]), iv3 * (py[2] - py[0]),
                       iv3 * (py[0] - py[1]))
                sdy = (iv3 * (px[2] - px[1]), iv3 * (px[0] - px[2]),
                       iv3 * (px[1] - px[0]))
                gx3 = sdx[0] * pz[0] + sdx[1] * pz[1] + sdx[2] * pz[2]
                gy3 = sdy[0] * pz[0] + sdy[1] * pz[1] + sdy[2] * pz[2]
                am = jnp.where(smask, parea, _c(0.0))
                for j in range(3):
                    sl = (sdx[j] * gx3 + sdy[j] * gy3) * parea
                    sl = jnp.where(smask, sl, _c(0.0))
                    ts_acc = ts_acc \
                        + pad_corner(jnp.where(par, sl, _c(0.0)), ce3[j]) \
                        + pad_corner(jnp.where(par, _c(0.0), sl), co3[j])
                    td_acc = td_acc \
                        + pad_corner(jnp.where(par, am, _c(0.0)), ce3[j]) \
                        + pad_corner(jnp.where(par, _c(0.0), am), co3[j])
            conv = _c(ctrl.surface_diffusivity) * dt * ts_acc \
                / jnp.where(td_acc > 0, td_acc, _c(1.0))
            dh = jnp.where(cn_vm[0] > 0, -conv, _c(0.0))
            coord_z = coord_z + dh
            dhacc_new = dhacc_new + dh
            # per-facet deposited volume (bc.cxx:1745-1760): dv =
            # sum(dh_corners) * projected_area / ndims, stored at the
            # owning cell's (x0, y0, top) node (see _surf_maps)
            dhv = nviews(dh)
            for t3 in range(2):
                ce3, co3 = TRI_E[t3], TRI_O[t3]
                dh_e = sum(jnp.where(par, dhv[ce3[j]], dhv[co3[j]])
                           for j in range(3))
                dv3 = jnp.where(smask, dh_e * pareas[t3] / 3.0, _c(0.0))
                if t3 == 0:
                    edva_new = edva_new + pad_corner(dv3, 1)
                else:
                    edvb_new = edvb_new + pad_corner(dv3, 1)

        # ---- phase 4: post-move geometry, masses, CFL, Jaumann ----
        cx2_v = nviews(coord_x)
        cy2_v = nviews(coord_y)
        cz2_v = nviews(coord_z)
        vx2_v = nviews(vel_x)
        vy2_v = nviews(vel_y)
        vz2_v = nviews(vel_z)

        voln_acc = zero_n
        m_acc = zero_n
        tm_acc = zero_n
        hm_acc = zero_n
        own_c = slice(H, H + TY)
        ztop = jax.lax.broadcasted_iota(
            jnp.int32, (NWy, nzc, nxc), 1) == jnp.asarray(nzc - 1,
                                                          jnp.int32)

        for t in range(5):
            xs2 = gather_tet(cx2_v, t, par)
            ys2 = gather_tet(cy2_v, t, par)
            zs2 = gather_tet(cz2_v, t, par)
            vxs2 = gather_tet(vx2_v, t, par)
            vys2 = gather_tet(vy2_v, t, par)
            vzs2 = gather_tet(vz2_v, t, par)
            ts = gather_tet(ts_v, t, par)
            temp_e = (ts[0] + ts[1] + ts[2] + ts[3]) / npe
            TinC = temp_e - CELSIUS0
            if uniform_mat:
                rho_e = _c(rho0_s) - _c(CE_CONST["rhoB"]) * TinC
                shearm = _c(G_s)
                bulkm = _c(K_s)
            else:
                rho_e = CE("rhoA", t) - CE("rhoB", t) * TinC
                shearm = CE("shearm", t)
                bulkm = CE("bulkm", t)
            vol = E("volume", t)
            vol_safe = jnp.where(vmask, vol, _c(1.0))
            volume_new = volume_of(xs2, ys2, zs2)
            vol2_safe = jnp.where(vmask, volume_new, _c(1.0))

            # CFL partials (geometry.cxx:756-923): every step, like the
            # grid3d oracle — vmax/gdtmin refresh each step, only dt is
            # gated on the 10-step cadence (dynearthsol.cxx:861-871)
            if "cfl" not in _ablate:
                vx_m = (vxs2[0] + vxs2[1] + vxs2[2] + vxs2[3]) / npe
                vy_m = (vys2[0] + vys2[1] + vys2[2] + vys2[3]) / npe
                vz_m = (vzs2[0] + vzs2[1] + vzs2[2] + vzs2[3]) / npe
                vmag = jnp.sqrt(vx_m * vx_m + vy_m * vy_m + vz_m * vz_m)
                minh = min_height(xs2, ys2, zs2, vol2_safe)
                swave = jnp.sqrt(shearm / rho_e)
                red_ref[0, 0] = jnp.minimum(red_ref[0, 0],
                                            minh[own_c].min())
                red_ref[0, 1] = jnp.minimum(red_ref[0, 1],
                                            (minh / swave)[own_c].min())
                red_ref[0, 2] = jnp.maximum(red_ref[0, 2],
                                            vmag[own_c].max())

            # (pseudo-)mass matrices (geometry.cxx:1020-1154)
            if ctrl.use_global_velocity_scaling:
                gvs = dt_ref[0, 1]
                apparent = jnp.minimum(gvs, jnp.sqrt(shearm / rho_e))
                rho_q = bulkm / (apparent * apparent)
            else:
                rho_q = bulkm / _c(pseudo_speed * pseudo_speed)
            rho_m = rho_q if ctrl.is_quasi_static else rho_e
            m_c = jnp.where(vmask, rho_m * volume_new / npe, _c(0.0))
            if uniform_mat:
                cp_rho = _c(CE_CONST["cpA"]) - _c(CE_CONST["cpB"]) * TinC
                hmA_e = _c(CE_CONST["hmA"])
            else:
                cp_rho = CE("cpA", t) - CE("cpB", t) * TinC
                hmA_e = CE("hmA", t)
            tm_c = jnp.where(vmask, cp_rho * volume_new / npe, _c(0.0))
            hm_c = jnp.where(vmask, hmA_e * volume_new, _c(0.0))
            vn_c = jnp.where(vmask, volume_new, _c(0.0))
            if "masses" not in _ablate:
                voln_acc = scatter_tet_equal(voln_acc, vn_c, t, par)
                m_acc = scatter_tet_equal(m_acc, m_c, t, par)
                tm_acc = scatter_tet_equal(tm_acc, tm_c, t, par)
                hm_acc = scatter_tet_equal(hm_acc, hm_c, t, par)

            # Jaumann rotation with post-move geometry (fields.cxx:832-907)
            # + correct_surface_element (bc.cxx:1613-1665): the rotation is
            # linear in its tensor, so rotate-then-scale == the reference's
            # scale-then-rotate.  No surface plstrain decay in 3D
            # (bc.cxx:1805-1810 is 2D-only).
            if rheol & RH_ELASTIC and "jaumann" not in _ablate:
                dndx2, dndy2, dndz2 = shape_fn(xs2, ys2, zs2, vol2_safe)
                w3 = 0.5 * (sum(vxs2[i] * dndy2[i] for i in range(4))
                            - sum(vys2[i] * dndx2[i] for i in range(4)))
                w4 = 0.5 * (sum(vxs2[i] * dndz2[i] for i in range(4))
                            - sum(vzs2[i] * dndx2[i] for i in range(4)))
                w5 = 0.5 * (sum(vys2[i] * dndz2[i] for i in range(4))
                            - sum(vzs2[i] * dndy2[i] for i in range(4)))
                w3t = w3 * dt
                w4t = w4 * dt
                w5t = w5 * dt

                def rot(c):
                    return (c[0] - 2.0 * c[3] * w3t - 2.0 * c[4] * w4t,
                            c[1] + 2.0 * c[3] * w3t - 2.0 * c[5] * w5t,
                            c[2] + 2.0 * c[4] * w4t + 2.0 * c[5] * w5t,
                            c[3] + (c[0] - c[1]) * w3t - c[4] * w5t
                            - c[5] * w4t,
                            c[4] + (c[0] - c[2]) * w4t + c[3] * w5t
                            - c[5] * w3t,
                            c[5] + (c[1] - c[2]) * w5t + c[3] * w4t
                            + c[4] * w3t)

                k = _eslot("stress")
                stress_o = rot(tuple(eo_vm[k + i, t] for i in range(6)))
                k = _eslot("strain")
                strain_o = rot(tuple(eo_vm[k + i, t] for i in range(6)))
            else:
                k = _eslot("stress")
                stress_o = tuple(eo_vm[k + i, t] for i in range(6))
                k = _eslot("strain")
                strain_o = tuple(eo_vm[k + i, t] for i in range(6))

            if ctrl.has_surface_correction:
                rdv = vol2_safe / vol_safe
                sc = jnp.where(ztop & (rdv >= 1.0), 1.0 / rdv, _c(1.0))
                stress_o = tuple(x * sc for x in stress_o)
                strain_o = tuple(x * sc for x in strain_o)
                k = _eslot("strain_rate")
                for i in range(6):
                    eo_vm[k + i, t] = eo_vm[k + i, t] * sc
                kp = _eslot("plstrain")
                eo_vm[kp, t] = eo_vm[kp, t] * sc
                volume_old_o = jnp.where(ztop, volume_new, vol)
            else:
                volume_old_o = vol
            k = _eslot("stress")
            for i in range(6):
                eo_vm[k + i, t] = stress_o[i]
            k = _eslot("strain")
            for i in range(6):
                eo_vm[k + i, t] = strain_o[i]
            eo_vm[_eslot("volume"), t] = volume_new
            eo_vm[_eslot("volume_old"), t] = volume_old_o

        # ---- phase 5: nodal outputs + DMA out ----
        own_n1 = slice(H, H + TYN)  # overlaps next tile (benign)
        no_vm[_nslot("coord_x")] = coord_x[own_n1]
        no_vm[_nslot("coord_y")] = coord_y[own_n1]
        no_vm[_nslot("coord_z")] = coord_z[own_n1]
        no_vm[_nslot("vel_x")] = vel_x[own_n1]
        no_vm[_nslot("vel_y")] = vel_y[own_n1]
        no_vm[_nslot("vel_z")] = vel_z[own_n1]
        no_vm[_nslot("temperature")] = temperature_new[own_n1]
        no_vm[_nslot("mass")] = (m_acc + ghost1)[own_n1]
        no_vm[_nslot("tmass")] = (tm_acc + ghost1)[own_n1]
        no_vm[_nslot("volume_n")] = (voln_acc + ghost1)[own_n1]
        no_vm[_nslot("hmass")] = hm_acc[own_n1]
        no_vm[_nslot("force_x")] = fdx[own_n1]
        no_vm[_nslot("force_y")] = fdy[own_n1]
        no_vm[_nslot("force_z")] = fdz[own_n1]
        no_vm[_nslot("dhacc")] = dhacc_new[own_n1]
        no_vm[_nslot("edv_a")] = edva_new[own_n1]
        no_vm[_nslot("edv_b")] = edvb_new[own_n1]

        dma_eo = pltpu.make_async_copy(
            eo_vm.at[:, :, pl.ds(jnp.asarray(H, jnp.int32), TY)],
            eout_hbm.at[:, :, pl.ds(a + jnp.asarray(PAD, jnp.int32), TY)],
            sems.at[jnp.asarray(4, jnp.int32)])
        dma_no = pltpu.make_async_copy(
            no_vm,
            nout_hbm.at[:, pl.ds(a + jnp.asarray(PAD, jnp.int32), TYN)],
            sems.at[jnp.asarray(5, jnp.int32)])
        dma_eo.start()
        dma_no.start()
        dma_eo.wait()
        dma_no.wait()

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),     # dt, gvs, refresh
        pl.BlockSpec(memory_space=pltpu.ANY),      # epack
        pl.BlockSpec(memory_space=pltpu.ANY),      # npack
        pl.BlockSpec(memory_space=pltpu.ANY),      # const epack
        pl.BlockSpec(memory_space=pltpu.ANY),      # const npack
        pl.BlockSpec(memory_space=pltpu.ANY),      # vbc targets
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),      # epack out
        pl.BlockSpec(memory_space=pltpu.ANY),      # npack out
        pl.BlockSpec(memory_space=pltpu.SMEM),     # partials (1, 4)
    ]

    pallas_fn = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((NE, 5, nyp_c, nzc, nxc), dtype),
            jax.ShapeDtypeStruct((NN, nyp_n, LZN, LXN), dtype),
            jax.ShapeDtypeStruct((1, 4), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((NE_IN, 5, NWy, nzc, nxc), dtype),
            pltpu.VMEM((NN_IN, NYN, LZN, LXN), dtype),
            pltpu.VMEM((1, 1, 1, 8, 128) if uniform_mat
                       else (NCE, 5, NWy, nzc, nxc), dtype),
            pltpu.VMEM((NCN, NYN, LZN, LXN), dtype),
            pltpu.VMEM((3, NYN, LZN, LXN), dtype),
            pltpu.VMEM((NE, 5, NWy, nzc, nxc), dtype),
            pltpu.VMEM((NN, TYN, LZN, LXN), dtype),
            pltpu.SemaphoreType.DMA((7,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=INTERPRET,
        debug=bool(int(__import__('os').environ.get('PALLAS3D_DEBUG',
                                                    '0'))),
    )

    def step(sctx, s, consts):
        """One fused step on packed planes.  `consts` = (cepack, cnpack)
        from _const_epack/_const_npack (constant through a scan chunk)."""
        cepack, cnpack = consts
        epack, npack = s.volume, s.coord
        dt = s.dt
        steps = s.steps + 1
        time = s.time + s.dt

        # per-step vbc targets from pre-move coords (bc.cxx applies vbcs
        # before update_coordinate); node id = (i*ny + j)*nz + k
        def plane_to_flat(p):
            return p[:, :nz, :nx].transpose(2, 0, 1).reshape(-1)

        real = npack[:, PAD:PAD + ny]
        coord_flat = jnp.stack([plane_to_flat(real[0]),
                                plane_to_flat(real[1]),
                                plane_to_flat(real[2])], axis=1)
        tgt = bc_mod.apply_vbcs(sctx.vbc, jnp.zeros_like(coord_flat),
                                coord_flat, time)

        def flat_to_plane(a):
            return a.reshape(nx, ny, nz).transpose(1, 2, 0)

        tgt_planes = jnp.pad(
            jnp.stack([flat_to_plane(tgt[:, 0]), flat_to_plane(tgt[:, 1]),
                       flat_to_plane(tgt[:, 2])]),
            ((0, 0), (PAD, PAD), (0, LZN - nz), (0, LXN - nx)))

        gvs = (s.max_global_vel_mag * ctrl.inertial_scaling).astype(dtype)
        refresh = (steps % 10 == 0) | bool(ctrl.use_global_velocity_scaling)
        dt_in = jnp.stack([dt.astype(dtype), gvs,
                           refresh.astype(dtype),
                           jnp.zeros((), dtype)]).reshape(1, 4)
        if uniform_mat:
            cepack = jnp.zeros((1, 1, 1, 8, 128), dtype)
        eout, nout, red = pallas_fn(dt_in, epack, npack, cepack, cnpack,
                                    tgt_planes)

        # finish the scalar reductions (geometry.cxx:756-923); CFL metrics
        # only exist on refresh steps (dynearthsol.cxx:861-871 cadence)
        minh = red[0, 0]
        gdtmin = red[0, 1] / 5.0
        vmax = jnp.maximum(red[0, 2], max_vbc_val)
        l2_res = jnp.sqrt(red[0, 3] / (nx * ny * nz * 3))

        big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)
        if ctrl.fixed_dt != 0.0:
            dt_new = jnp.asarray(ctrl.fixed_dt, dtype=dtype)
        else:
            if uniform_mat:
                dt_maxwell = jnp.asarray(0.5 * visc_min / (1e-40 + G_s),
                                         dtype)
            else:
                # constant through the chunk (shearm is emw-only); a
                # tiny reduction over the passthrough emw field
                dt_maxwell = (0.5 * visc_min
                              / (1e-40 + M.shearm(sctx.mat, s.emw))
                              ).min().astype(dtype)
            dt_diffusion = 0.5 * minh * minh / therm_diff_max \
                if ctrl.has_thermal_diffusion else big
            if ctrl.use_global_velocity_scaling:
                dt_advection = 0.5 * minh / vmax
                dt_elastic = jnp.maximum(
                    0.5 * minh / (vmax * ctrl.inertial_scaling)
                    if ctrl.is_quasi_static else 0.5 * minh / swave_ref,
                    gdtmin)
            else:
                dt_advection = 0.5 * minh / max_vbc_val
                dt_elastic = 0.5 * minh / (max_vbc_val
                                           * ctrl.inertial_scaling) \
                    if ctrl.is_quasi_static else 0.5 * minh / swave_ref
            dt_new = jnp.minimum(
                jnp.minimum(dt_elastic, dt_maxwell),
                jnp.minimum(dt_advection, dt_diffusion)) * ctrl.dt_fraction
        dt_out = jnp.where(refresh, dt_new, s.dt)

        return dataclasses.replace(
            s, volume=eout, coord=nout,
            time=time, dt=dt_out, steps=steps,
            max_global_vel_mag=vmax, global_dt_min=gdtmin,
            l2_residual=l2_res)

    return step


def make_chunk_runner(param: Param, ctx, compensation_pressure: float,
                      n: int):
    """jit(run_chunk)(ctx, state): pack -> scan n fused steps -> unpack."""
    nx, ny, nz = ctx.sgrid
    pad = _halo_for(param, ctx)
    smaps = _surf_maps(ctx, nx, ny, nz) if _surf_on(param, ctx) else None
    step = make_pallas_step(param, ctx, compensation_pressure)

    @jax.jit
    def run_chunk(sctx, state):
        cnpack = _const_npack(param, sctx, state, nx, ny, nz, pad=pad)
        if _uniform_mat(param):
            cepack = jnp.zeros((1, 1, 1, 8, 128), jnp.float32)
        else:
            cepack = _const_epack(param, sctx, state, nx, ny, nz, pad=pad)
        g = state_to_pgrid(state, nx, ny, nz, pad=pad, surf_maps=smaps)

        def body(s, _):
            return step(sctx, s, (cepack, cnpack)), None

        g, _ = jax.lax.scan(body, g, length=n)
        return pgrid_to_state(g, nx, ny, nz, pad=pad, surf_maps=smaps)

    return run_chunk
