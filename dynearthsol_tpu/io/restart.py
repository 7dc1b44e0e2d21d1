"""Checkpoint/restart reader.

Reference: `restart()` (dynearthsol.cxx:227-420): parse `<model>.info` for
the frame row, open `.save.NNNNNN` + `.chkpt.NNNNNN`, rebuild topology from
the saved mesh (coordinates have deformed — boundary identity comes from the
saved bcflag/segments, not coordinate tests), restore fields and markers,
then recompute volume/mass and re-apply velocity BCs.  Restart is exact: the
CI `fresh-restart-cmp` contract requires a restarted run to reproduce the
continuous run bit-for-bit (benchmarks-cores/Makefile:146-160).
"""

from __future__ import annotations

import numpy as np

from ..markers import MarkerSet
from ..mesh.topology import build_topology_from_arrays
from .tagged import TaggedReader


def read_frame(prefix: str, frame: int, ndims_hint: int | None = None):
    """Read one save+chkpt frame pair into an array dict for
    Simulation(_restart=...)."""
    info = np.loadtxt(prefix + ".info", ndmin=2)
    rows = {int(r[0]): r for r in info}
    if frame not in rows:
        raise FileNotFoundError(
            f"frame {frame} not in {prefix}.info (have {sorted(rows)})")
    row = rows[frame]
    steps, nnode, nelem, nseg = (int(row[1]), int(row[5]), int(row[6]),
                                 int(row[7]))

    save = TaggedReader(f"{prefix}.save.{frame:06d}")
    chk = TaggedReader(f"{prefix}.chkpt.{frame:06d}")
    ndims = save.ndims
    npe = ndims + 1
    nstr = ndims * (ndims + 1) // 2
    f64, i32 = np.float64, np.int32

    r = {
        "steps": steps,
        "coord": save.read_array("coordinate", f64, nnode * ndims
                                 ).reshape(nnode, ndims),
        "conn": save.read_array("connectivity", i32, nelem * npe
                                ).reshape(nelem, npe),
        "vel": save.read_array("velocity", f64, nnode * ndims
                               ).reshape(nnode, ndims),
        "temperature": save.read_array("temperature", f64, nnode),
        "ppressure": save.read_array("pore pressure", f64, nnode),
        "plstrain": save.read_array("plastic strain", f64, nelem),
        "strain": save.read_array("strain", f64, nelem * nstr
                                  ).reshape(nelem, nstr),
        "stress": save.read_array("stress", f64, nelem * nstr
                                  ).reshape(nelem, nstr),
        "coord0": save.read_array("coord0", f64, nnode * ndims
                                  ).reshape(nnode, ndims),
        "bcflag": save.read_array("bcflag", np.uint32, nnode),
        "scalars": chk.read_array(
            "time info_display_next_step compensation_pressure "
            "bottom_temperature dt max_global_vel_mag reference_frame_time",
            f64, 7),
        "segment": chk.read_array("segment", i32, nseg * ndims
                                  ).reshape(nseg, ndims),
        "segflag": chk.read_array("segflag", i32, nseg),
        "volume_old": chk.read_array("volume_old", f64, nelem),
    }
    # exact-restart extras (written by our Output; absent in reference files)
    for nm, cnt in (("volume", nelem), ("volume_n", nnode), ("mass", nnode),
                    ("tmass", nnode), ("hmass", nnode), ("ymass", nnode),
                    ("old_mean_stress", nelem)):
        if chk.has_array(nm):
            r[nm] = chk.read_array(nm, f64, cnt)
    if chk.has_array("stressyy"):
        r["stressyy"] = chk.read_array("stressyy", f64, nelem)
    if chk.has_array("friction state variable"):
        r["state_variable"] = chk.read_array("friction state variable",
                                             f64, nelem)
    if chk.has_array("dhacc"):
        # variable-length surface arrays: read to EOF-extent via offsets
        r["dhacc"] = _read_full(chk, "dhacc", f64)
        r["edvacc_surf"] = _read_full(chk, "dv surface acc", f64)

    if save.has_array("markerset.eta"):
        names = [n.split(" size")[0] for n in chk.offset
                 if n.endswith(" size")]
        msave = {n: _read_full(save, n, _dtype_of(n)) for n in save.offset
                 if n.startswith(tuple(names))}
        mchk = {n: _read_full(chk, n, _dtype_of(n)) for n in chk.offset
                if n.startswith(tuple(names))}
        r["markers"] = MarkerSet.from_arrays(ndims, msave, mchk,
                                             name="markerset")
    save.close()
    chk.close()
    return r


def _dtype_of(name: str) -> np.dtype:
    if (name.endswith((" size", ".elem", ".mattype", ".id", ".genesis"))):
        return np.int32
    return np.float64


def _read_full(reader: TaggedReader, name: str, dtype) -> np.ndarray:
    """Read an array whose length is implied by the next offset (arrays are
    laid out back-to-back in file order)."""
    pos = reader.offset[name]
    later = [p for p in reader.offset.values() if p > pos]
    reader.f.seek(0, 2)
    end = min(later) if later else reader.f.tell()
    count = (end - pos) // np.dtype(dtype).itemsize
    return reader.read_array(name, dtype, count)


def load_mesh_from_run(prefix: str, frame: int):
    """Load only the mesh (coord/conn/segments/bcflag) from a run's output
    frame and derive topology from it.  Framework extension used by the
    golden-vs-reference gates: runs our numerics on the reference binary's
    exact mesh so field comparisons are node-for-node."""
    from ..mesh.generate import MeshData

    info = np.loadtxt(prefix + ".info", ndmin=2)
    rows = {int(r[0]): r for r in info}
    if frame not in rows:
        raise FileNotFoundError(
            f"frame {frame} not in {prefix}.info (have {sorted(rows)})")
    row = rows[frame]
    nnode, nelem, nseg = int(row[5]), int(row[6]), int(row[7])

    save = TaggedReader(f"{prefix}.save.{frame:06d}")
    chk = TaggedReader(f"{prefix}.chkpt.{frame:06d}")
    ndims = save.ndims
    npe = ndims + 1
    coord = save.read_array("coordinate", np.float64, nnode * ndims
                            ).reshape(nnode, ndims)
    conn = save.read_array("connectivity", np.int32, nelem * npe
                           ).reshape(nelem, npe)
    bcflag = save.read_array("bcflag", np.uint32, nnode)
    segment = chk.read_array("segment", np.int32, nseg * ndims
                             ).reshape(nseg, ndims)
    segflag = chk.read_array("segflag", np.int32, nseg)
    save.close()
    chk.close()

    mesh = MeshData(ndims, coord, conn)
    mesh.segment = segment
    mesh.segflag = segflag
    topo = build_topology_from_arrays(ndims, conn, bcflag, segment, segflag)
    return mesh, topo


def restart(param):
    """Build a restarted Simulation (dynearthsol.cxx:227-420)."""
    from ..simulation import Simulation

    prefix = param.sim.restarting_from_modelname or param.sim.modelname
    frame = param.sim.restarting_from_frame
    r = read_frame(prefix, frame)
    topo = build_topology_from_arrays(param.sim.ndims, r["conn"],
                                      r["bcflag"], r["segment"],
                                      r["segflag"])
    r["topo"] = topo
    return Simulation(param, _restart=r), frame
