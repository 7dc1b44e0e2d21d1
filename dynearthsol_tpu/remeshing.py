"""Remeshing: quality trigger + regenerate + conservative remap.

Reference: remeshing.cxx.  Remeshing is a rare host-side event (O(seconds)
every many thousands of steps); the TPU-native split is: trigger check reads
three scalars off the device, the remesh itself runs in numpy/scipy on host,
and the new mesh's state is pushed back as fresh device buffers
(SURVEY §3.4, §7.1).
"""

from __future__ import annotations

import math

import numpy as np

from .constants import (BOUNDX0, BOUNDX1, BOUNDY0, BOUNDY1, BOUNDZ0,
                        BOUNDZ1, IBOUNDZ1)

# volume of the equilateral simplex with unit side (remeshing.cxx sizefactor)
SIZEFACTOR_2D = math.sqrt(3.0) / 4.0
SIZEFACTOR_3D = 1.0 / (6.0 * math.sqrt(2.0))


def _elem_quality_np(coord: np.ndarray, conn: np.ndarray,
                     volume: np.ndarray) -> np.ndarray:
    """Element quality = normalized volume-to-edge ratio
    (geometry.cxx:1157-1211 elem_quality)."""
    ndims = coord.shape[1]
    v = coord[conn]
    if ndims == 2:
        # quality = 4*sqrt(3)*area / (sum of edge^2)
        e01 = ((v[:, 1] - v[:, 0]) ** 2).sum(axis=1)
        e12 = ((v[:, 2] - v[:, 1]) ** 2).sum(axis=1)
        e20 = ((v[:, 0] - v[:, 2]) ** 2).sum(axis=1)
        return 4.0 * math.sqrt(3.0) * volume / (e01 + e12 + e20)
    # 3D: quality = 6*sqrt(2)*vol / rms_edge^3 (normalized shape measure)
    idx = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    s = np.zeros(conn.shape[0])
    for i, j in idx:
        s += ((v[:, j] - v[:, i]) ** 2).sum(axis=1)
    rms = np.sqrt(s / 6.0)
    return 6.0 * math.sqrt(2.0) * volume / rms ** 3


def bad_mesh_quality(sim) -> tuple[int, float]:
    """Quality trigger (remeshing.cxx:2738-2852).  Returns (code, min_q):
    code 0 good, 1 distorted element, 2 boundary node strayed, 3 tiny
    element."""
    param = sim.param
    ndims = param.sim.ndims
    coord = np.asarray(sim.state.coord, dtype=np.float64)
    volume = np.asarray(sim.state.volume, dtype=np.float64)
    conn = sim.topo.connectivity
    bcflag = sim.topo.bcflag

    sizefactor = SIZEFACTOR_2D if ndims == 2 else SIZEFACTOR_3D
    smallest_vol = (param.mesh.smallest_size * sizefactor
                    * param.mesh.resolution ** ndims)
    if (volume < smallest_vol).any():
        e = int(np.argmin(volume))
        print(f"    The size of element #{e} is too small.")
        return 3, 1.0

    if param.mesh.remeshing_option in (1, 2, 11, 13):
        bottom = -param.mesh.zlength
        dist = param.mesh.max_boundary_distortion * param.mesh.resolution
        zb = coord[(bcflag & BOUNDZ0) != 0, ndims - 1]
        if zb.size and (np.abs(zb - bottom) > dist).any():
            print("    A bottom node moved too far from the flat bottom.")
            return 2, 1.0
    if param.mesh.remeshing_option == 13:
        dist = param.mesh.max_boundary_distortion * param.mesh.resolution
        strayed = False
        x0 = coord[(bcflag & BOUNDX0) != 0, 0]
        x1 = coord[(bcflag & BOUNDX1) != 0, 0]
        strayed |= bool(x0.size and (np.abs(x0) > dist).any())
        strayed |= bool(
            x1.size and (np.abs(x1 - param.mesh.xlength) > dist).any())
        if ndims == 3:
            y0 = coord[(bcflag & BOUNDY0) != 0, 1]
            y1 = coord[(bcflag & BOUNDY1) != 0, 1]
            strayed |= bool(y0.size and (np.abs(y0) > dist).any())
            strayed |= bool(
                y1.size and (np.abs(y1 - param.mesh.ylength) > dist).any())
        if strayed:
            print("    A side node moved too far from its side.")
            return 2, 1.0

    q = _elem_quality_np(coord, conn, volume)
    worst = float(q.min())
    if ndims == 3:
        worst = worst ** (1.0 / 3.0)
    if worst < param.mesh.min_quality:
        e = int(np.argmin(q))
        print(f"    Element #{e} has mesh quality = {worst:.4f}.")
        return 1, worst
    return 0, worst


def remesh(sim, bad_quality: int):
    """Full remesh pipeline (remeshing.cxx:2855-3135).  Implemented in
    remesh_impl.py; imported lazily to keep the trigger light."""
    from .remesh_impl import remesh_simulation

    remesh_simulation(sim, bad_quality)
