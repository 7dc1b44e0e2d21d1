"""Post-processing: output reader + VTK conversion.

Counterpart of the reference's Dynearthsol.py (output reader for both the
tagged-binary and VTKHDF formats) and 2vtk.py (conversion to VTK
unstructured-grid files with derived fields).  The VTK writer emits
ASCII legacy .vtk, which ParaView and pyvista read without extra deps.
"""

from __future__ import annotations

import os

import numpy as np

from .constants import YEAR2SEC
from .io.tagged import TaggedReader

_NODE_VECTORS = ("coordinate", "velocity", "velocity averaged", "force",
                 "coord0")
_NODE_SCALARS = ("temperature", "pore pressure", "bcflag", "mass", "tmass",
                 "volume_n")
_ELEM_TENSORS = ("strain", "strain-rate", "stress", "stress averaged")
_ELEM_SCALARS = ("density", "material", "mesh quality", "plastic strain",
                 "plastic strain-rate", "viscosity", "edvoldt", "volume",
                 "radiogenic source", "dynamic friction coefficient",
                 "friction state variable")


class OutputReader:
    """Read DES output (ours or the reference's): `.info` + frames."""

    def __init__(self, modelname: str):
        self.modelname = modelname
        info = np.loadtxt(modelname + ".info", ndmin=2)
        self.frames = info[:, 0].astype(int).tolist()
        self.steps = info[:, 1].astype(int).tolist()
        self.time = info[:, 2].tolist()
        self.nnode_list = info[:, 5].astype(int)
        self.nelem_list = info[:, 6].astype(int)
        fn = self._fn(self.frames[0])
        self.format = "hdf5" if fn.endswith(".vtkhdf") else "binary"
        if self.format == "binary":
            with TaggedReader(fn) as r:
                self.ndims = r.ndims
        else:
            import h5py

            with h5py.File(fn) as f:
                self.ndims = int(f.attrs["ndims"])
        self.nstr = self.ndims * (self.ndims + 1) // 2

    def _fn(self, frame: int) -> str:
        base = f"{self.modelname}.save.{frame:06d}"
        return base if os.path.exists(base) else base + ".vtkhdf"

    def _shape(self, frame, name):
        i = self.frames.index(frame)
        nnode, nelem = self.nnode_list[i], self.nelem_list[i]
        if name in _ELEM_TENSORS:
            return np.float64, (nelem, self.nstr)
        if name in _ELEM_SCALARS:
            return np.float64, (nelem,)
        if name == "connectivity":
            return np.int32, (nelem, self.ndims + 1)
        if name == "bcflag":
            return np.int32, (nnode,)
        if name in _NODE_VECTORS:
            return np.float64, (nnode, self.ndims)
        if name in _NODE_SCALARS:
            return np.float64, (nnode,)
        raise KeyError(f"unknown field {name!r}")

    def read_field(self, frame: int, name: str) -> np.ndarray:
        fn = self._fn(frame)
        if self.format == "hdf5":
            import h5py

            with h5py.File(fn) as f:
                return f[name][:]
        dtype, shape = self._shape(frame, name)
        with TaggedReader(fn) as r:
            return r.read_array(name, dtype,
                                int(np.prod(shape))).reshape(shape)

    def has_field(self, frame: int, name: str) -> bool:
        fn = self._fn(frame)
        if self.format == "hdf5":
            import h5py

            with h5py.File(fn) as f:
                return name in f
        with TaggedReader(fn) as r:
            return r.has_array(name)

    def read_markers(self, frame: int, markername: str = "markerset"):
        fn = self._fn(frame)
        out = {}
        if self.format == "hdf5":
            import h5py

            with h5py.File(fn) as f:
                for k in f:
                    if k.startswith(markername):
                        out[k] = f[k][:]
                n = out[f"{markername}.elem"].shape[0]
        else:
            with TaggedReader(fn) as r:
                n = int(r.read_array(f"{markername} size", np.int32, 1)[0])
                npe = self.ndims + 1
                spec = {".coord": (np.float64, (n, self.ndims)),
                        ".eta": (np.float64, (n, npe)),
                        ".elem": (np.int32, (n,)),
                        ".mattype": (np.int32, (n,)),
                        ".id": (np.int32, (n,)),
                        ".time": (np.float64, (n,)),
                        ".z": (np.float64, (n,)),
                        ".distance": (np.float64, (n,)),
                        ".slope": (np.float64, (n,)),
                        ".genesis": (np.int32, (n,))}
                for suf, (dt, shape) in spec.items():
                    nm = markername + suf
                    if r.has_array(nm):
                        out[nm] = r.read_array(
                            nm, dt, int(np.prod(shape))).reshape(shape)
        out["size"] = n
        return out


def second_invariant(t: np.ndarray) -> np.ndarray:
    """sqrt(II) of a flattened symmetric tensor (utils.hpp:172-201 /
    2vtk.py derived fields)."""
    nstr = t.shape[1]
    if nstr == 3:
        a = 0.5 * (t[:, 0] + t[:, 1])
        return np.sqrt(0.25 * (t[:, 0] - t[:, 1]) ** 2 + t[:, 2] ** 2
                       + 0.0 * a)
    m = t[:, :3].mean(axis=1)
    dev = t[:, :3] - m[:, None]
    return np.sqrt(0.5 * (dev ** 2).sum(axis=1)
                   + (t[:, 3:] ** 2).sum(axis=1))


def first_invariant(t: np.ndarray) -> np.ndarray:
    """Mean of the tensor diagonal (2vtk.py:705-708)."""
    ndims = 2 if t.shape[1] == 3 else 3
    return t[:, :ndims].sum(axis=1) / ndims


def compute_principal_stress(stress: np.ndarray):
    """Principal deviatoric stress directions s1/s3 as 3-vectors
    (2vtk.py:726-779).  2D: closed-form rotation; 3D: batched eigh."""
    nelem, nstr = stress.shape
    s1 = np.zeros((nelem, 3), dtype=stress.dtype)
    s3 = np.zeros((nelem, 3), dtype=stress.dtype)
    if nstr == 3:  # 2D
        sxx, szz, sxz = stress[:, 0], stress[:, 1], stress[:, 2]
        mag = np.sqrt(0.25 * (sxx - szz) ** 2 + sxz ** 2)
        theta = 0.5 * np.arctan2(2 * sxz, sxx - szz)
        cost, sint = np.cos(theta), np.sin(theta)
        s1[:, 0] = mag * sint
        s1[:, 1] = mag * cost
        s3[:, 0] = mag * cost
        s3[:, 1] = -mag * sint
    else:
        s = np.zeros((nelem, 3, 3), dtype=stress.dtype)
        s[:, 0, 0], s[:, 1, 1], s[:, 2, 2] = (stress[:, 0], stress[:, 1],
                                              stress[:, 2])
        s[:, 1, 0] = s[:, 0, 1] = stress[:, 3]
        s[:, 2, 0] = s[:, 0, 2] = stress[:, 4]
        s[:, 2, 1] = s[:, 1, 2] = stress[:, 5]
        w, v = np.linalg.eigh(s)
        m = w.sum(axis=1) / 3.0
        idx = np.arange(nelem)
        p = w.argmin(axis=1)
        t = w.argmax(axis=1)
        s1 = (w[idx, p] - m)[:, None] * v[idx, :, p]
        s3 = (w[idx, t] - m)[:, None] * v[idx, :, t]
    return s1, s3


def compute_heat_flux(coord, conn, temperature, conductivity=3.3):
    """Per-element conductive heat flux (Dynearthsol.py:158-179, the
    2vtk.py output_heatflux field; default conductivity 2vtk.py:62).

    The reference builds the (x, z, T) plane normal with cross products;
    that construction reduces algebraically to the P1 temperature
    gradient, so compute it directly (works in 2D and 3D):

      flux   = -1e3 * k * grad(T)   [mW/m^2]
      magnitude = 1e3 * k * |grad(T)|

    Returns (flux (nelem, ndims), magnitude (nelem,))."""
    ndims = coord.shape[1]
    p = coord[conn]                      # (nelem, npe, ndims)
    t = temperature[conn]                # (nelem, npe)
    # edge matrix E rows = x_i - x_last; dT rows = T_i - T_last;
    # grad solves E @ g = dT per element
    E = p[:, :-1, :] - p[:, -1:, :]      # (nelem, ndims, ndims)
    dT = t[:, :-1] - t[:, -1:]           # (nelem, ndims)
    grad = np.linalg.solve(E, dT[..., None])[..., 0]
    flux = -1.0e3 * conductivity * grad
    mag = 1.0e3 * conductivity * np.linalg.norm(grad, axis=1)
    return flux, mag


def compute_melting(coord, conn, temperature, material, bcflag,
                    topmask_bit=32):
    """Peridotite-solidus melting indicator (2vtk.py:173-198): positive
    where the element-mean temperature exceeds the depth-corrected
    solidus; -1000 for non-mantle (material >= 2) elements."""
    from .constants import BOUNDZ1

    ecoord = coord[conn].mean(axis=1)
    etemp = temperature[conn].mean(axis=1)
    top = (bcflag.astype(np.int64) & BOUNDZ1) != 0
    sx, sz = coord[top, 0], coord[top, -1]
    order = np.argsort(sx)
    depth = np.interp(ecoord[:, 0], sx[order], sz[order]) - ecoord[:, -1]
    pressure = depth * 9.8 * 2900.0
    melting = np.full(conn.shape[0], -1000.0)
    ind = material < 2
    melting[ind] = (etemp[ind] - 273.0 + depth[ind] * 3.0e-4) \
        - (1120.0 + (680.0 / 7.0e9) * pressure[ind])
    return melting


def to_vtk(modelname: str, frame: int, outpath: str | None = None,
           principal: bool = False, melting: bool = False,
           heatflux: bool = False, conductivity: float = 3.3) -> str:
    """Convert one frame to a legacy ASCII .vtk file with derived fields
    (the 2vtk.py role; ``principal``/``melting``/``heatflux`` mirror its
    -p, output_melting, and output_heatflux switches)."""
    r = OutputReader(modelname)
    coord = r.read_field(frame, "coordinate")
    conn = r.read_field(frame, "connectivity")
    nnode, ndims = coord.shape
    nelem, npe = conn.shape

    outpath = outpath or f"{modelname}.{frame:06d}.vtk"
    with open(outpath, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write(f"DynEarthSol-TPU frame {frame}\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {nnode} double\n")
        p3 = np.zeros((nnode, 3))
        p3[:, :ndims] = coord
        np.savetxt(f, p3, fmt="%.10g")
        f.write(f"\nCELLS {nelem} {nelem * (npe + 1)}\n")
        cells = np.concatenate(
            [np.full((nelem, 1), npe, dtype=np.int64), conn], axis=1)
        np.savetxt(f, cells, fmt="%d")
        ctype = 5 if ndims == 2 else 10
        f.write(f"\nCELL_TYPES {nelem}\n")
        np.savetxt(f, np.full(nelem, ctype, dtype=np.int64), fmt="%d")

        f.write(f"\nPOINT_DATA {nnode}\n")
        for name in ("temperature", "pore pressure"):
            if r.has_field(frame, name):
                f.write(f"SCALARS {name.replace(' ', '_')} double 1\n"
                        "LOOKUP_TABLE default\n")
                np.savetxt(f, r.read_field(frame, name), fmt="%.10g")
        if r.has_field(frame, "velocity"):
            vel = r.read_field(frame, "velocity")
            v3 = np.zeros((nnode, 3))
            v3[:, :ndims] = vel
            f.write("VECTORS velocity double\n")
            np.savetxt(f, v3, fmt="%.10g")
        if r.has_field(frame, "coord0"):
            # total displacement + initial-elevation horizon (2vtk.py:116-124)
            coord0 = r.read_field(frame, "coord0")
            d3 = np.zeros((nnode, 3))
            d3[:, :ndims] = coord - coord0
            f.write("VECTORS total_displacement double\n")
            np.savetxt(f, d3, fmt="%.10g")
            f.write("SCALARS horizon double 1\nLOOKUP_TABLE default\n")
            np.savetxt(f, coord0[:, -1], fmt="%.10g")

        f.write(f"\nCELL_DATA {nelem}\n")
        for name in ("plastic strain", "viscosity", "density", "material",
                     "mesh quality"):
            if r.has_field(frame, name):
                f.write(f"SCALARS {name.replace(' ', '_')} double 1\n"
                        "LOOKUP_TABLE default\n")
                np.savetxt(f, r.read_field(frame, name), fmt="%.10g")
        # derived invariants + effective viscosity (2vtk.py:126-170)
        invariants = {}
        for name in ("stress", "strain-rate", "strain"):
            if r.has_field(frame, name):
                t = r.read_field(frame, name)
                invariants[name] = second_invariant(t)
                f.write(f"SCALARS {name.replace('-', '_')}_II double 1\n"
                        "LOOKUP_TABLE default\n")
                np.savetxt(f, invariants[name], fmt="%.10g")
                f.write(f"SCALARS {name.replace('-', '_')}_I double 1\n"
                        "LOOKUP_TABLE default\n")
                np.savetxt(f, first_invariant(t), fmt="%.10g")
        if "stress" in invariants and "strain-rate" in invariants:
            effvisc = invariants["stress"] / (invariants["strain-rate"]
                                              + 1e-45)
            f.write("SCALARS effective_viscosity double 1\n"
                    "LOOKUP_TABLE default\n")
            np.savetxt(f, effvisc, fmt="%.10g")
        if principal and r.has_field(frame, "stress"):
            s1, s3 = compute_principal_stress(r.read_field(frame, "stress"))
            for nm, v in (("s1", s1), ("s3", s3)):
                f.write(f"VECTORS {nm} double\n")
                np.savetxt(f, v, fmt="%.10g")
        if melting and r.has_field(frame, "material") \
                and r.has_field(frame, "temperature") \
                and r.has_field(frame, "bcflag"):
            melt = compute_melting(coord, conn,
                                   r.read_field(frame, "temperature"),
                                   r.read_field(frame, "material"),
                                   r.read_field(frame, "bcflag"))
            f.write("SCALARS melting double 1\nLOOKUP_TABLE default\n")
            np.savetxt(f, melt, fmt="%.10g")
        if heatflux and r.has_field(frame, "temperature"):
            flux, fmag = compute_heat_flux(
                coord, conn, r.read_field(frame, "temperature"),
                conductivity)
            # per-component scalars + magnitude (2vtk.py:337-344 layout)
            names = ("heat_flux_x", "heat_flux_z") if ndims == 2 else \
                ("heat_flux_x", "heat_flux_y", "heat_flux_z")
            for j, nm in enumerate(names):
                f.write(f"SCALARS {nm} double 1\nLOOKUP_TABLE default\n")
                np.savetxt(f, flux[:, j], fmt="%.10g")
            f.write("SCALARS heat_flux_magnitude double 1\n"
                    "LOOKUP_TABLE default\n")
            np.savetxt(f, fmag, fmt="%.10g")
    return outpath


def to_vtp(modelname: str, frame: int, outpath: str | None = None,
           markersetname: str = "markerset") -> str | None:
    """Marker set -> ParaView .vtp PolyData (the 2vtk.py -m role,
    2vtk.py:524-600).  Returns None when the frame has no markers."""
    r = OutputReader(modelname)
    md = r.read_markers(frame, markersetname)
    n = int(md.get("size", 0))
    if n <= 0:
        return None
    outpath = outpath or f"{modelname}.{markersetname}.{frame:06d}.vtp"

    def arr(f, data, name, dtype="Float64", ncomp=1):
        f.write(f'  <DataArray type="{dtype}" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">\n')
        np.savetxt(f, np.asarray(data).reshape(n, -1), fmt="%.10g")
        f.write("  </DataArray>\n")

    with open(outpath, "w") as f:
        f.write('<?xml version="1.0"?>\n'
                '<VTKFile type="PolyData" version="0.1" '
                'byte_order="LittleEndian">\n<PolyData>\n'
                f'<Piece NumberOfPoints="{n}" NumberOfVerts="0" '
                'NumberOfLines="0" NumberOfStrips="0" '
                'NumberOfPolys="0">\n')
        f.write("  <PointData>\n")
        for suffix, dtype in ((".mattype", "Int32"), (".elem", "Int32"),
                              (".id", "Int32"), (".time", "Float64"),
                              (".z", "Float64"), (".distance", "Float64"),
                              (".slope", "Float64")):
            key = markersetname + suffix
            if key in md:
                arr(f, md[key], key, dtype)
        f.write("  </PointData>\n  <Points>\n")
        coord = np.asarray(md[markersetname + ".coord"])
        p3 = np.zeros((n, 3))
        p3[:, :coord.shape[1]] = coord
        arr(f, p3, "coordinate", ncomp=3)
        f.write("  </Points>\n</Piece>\n</PolyData>\n</VTKFile>\n")
    return outpath


def main(argv=None):
    """CLI: convert output frames to legacy VTK (the 2vtk.py workflow,
    2vtk.py:829-889).

    usage: python -m dynearthsol_tpu.postproc [-p] [-m] [--melting]
           modelname [start [end [delta]]]

    -p         save principal deviatoric stress vectors s1/s3 (2vtk -p)
    -m         save marker data as .vtp PolyData (2vtk -m)
    --melting  save the peridotite-solidus melting indicator
    --heatflux save the conductive heat-flux components + magnitude
               (2vtk output_heatflux)
    """
    import sys as _sys

    argv = _sys.argv[1:] if argv is None else argv
    principal = "-p" in argv
    melting = "--melting" in argv
    heatflux = "--heatflux" in argv
    markers = "-m" in argv
    argv = [a for a in argv
            if a not in ("-p", "-m", "--melting", "--heatflux")]
    if not argv or argv[0] in ("-h", "--help"):
        print(main.__doc__)
        return 0 if argv else 1
    modelname = argv[0]
    r = OutputReader(modelname)
    frames = sorted(r.frames) if hasattr(r, "frames") else None
    if frames is None:
        frames = []
        k = 0
        while True:
            try:
                r.read_field(k, "coordinate")
                frames.append(k)
                k += 1
            except Exception:
                break
    start = int(argv[1]) if len(argv) > 1 else 0
    end = int(argv[2]) if len(argv) > 2 else (frames[-1] if frames else -1)
    delta = int(argv[3]) if len(argv) > 3 else 1
    n = 0
    for fr in range(start, end + 1, delta):
        if frames and fr not in frames:
            continue
        path = to_vtk(modelname, fr, principal=principal, melting=melting,
                      heatflux=heatflux)
        print(f"frame {fr} -> {path}")
        if markers:
            vtp = to_vtp(modelname, fr)
            if vtp:
                print(f"frame {fr} -> {vtp}")
        n += 1
    print(f"{n} frames converted")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
