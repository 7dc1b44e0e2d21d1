"""Golden-run regression comparator.

Re-implements the contract of the reference's regression harness
(benchmarks-cores/compare.py): load one output frame from two runs,
compare 17 derived quantities (temperature, coordinates, velocity,
plastic strain, stress/strain/strain-rate invariants, viscosity, marker
coordinates/mattype/time), and classify the result as

* ``BIT-EXACT``       — every field identical,
* ``round-off``       — differences present but all < 1e-8 relative,
* ``SOMETHING WRONG`` — at least one field >= 1e-8 relative (or NaN/Inf).

Exit code 0 for the first two, 1 for the last (compare.py exit-code
contract).  Usage::

    python -m dynearthsol_tpu.compare <old-modelname> <new-modelname> <frame>
"""

from __future__ import annotations

import sys

import numpy as np

from .postproc import OutputReader, second_invariant

THRESHOLD = 1e-8


def first_invariant(t: np.ndarray) -> np.ndarray:
    nstr = t.shape[1]
    ndims = 2 if nstr == 3 else 3
    return t[:, :ndims].sum(axis=1) / ndims


def _frame_quantities(reader: OutputReader, frame: int,
                      markersetname: str = "markerset",
                      include_markers: bool = True) -> dict:
    q = {}
    q["Temperature"] = reader.read_field(frame, "temperature")
    coord = reader.read_field(frame, "coordinate")
    q["X coordinate"] = coord[:, 0]
    q["Z coordinate"] = coord[:, -1]
    vel = reader.read_field(frame, "velocity")
    q["X velocity"] = vel[:, 0]
    q["Z velocity"] = vel[:, -1]
    q["Pl. strain"] = reader.read_field(frame, "plastic strain")
    stress = reader.read_field(frame, "stress")
    q["Stress I"] = first_invariant(stress)
    q["Stress II"] = second_invariant(stress)
    strain = reader.read_field(frame, "strain")
    q["Strain I"] = first_invariant(strain)
    q["Strain II"] = second_invariant(strain)
    sr = reader.read_field(frame, "strain-rate")
    q["S. rate I"] = first_invariant(sr)
    q["S. rate II"] = second_invariant(sr)
    q["Viscosity"] = reader.read_field(frame, "viscosity")
    if not include_markers:
        return q
    try:
        mk = reader.read_markers(frame, markersetname)
        mc = mk[markersetname + ".coord"]
        q["Marker X"] = mc[:, 0]
        q["Marker Z"] = mc[:, -1]
        q["Marker Mat"] = mk[markersetname + ".mattype"].astype(float)
        q["Marker Time"] = mk[markersetname + ".time"]
    except (KeyError, FileNotFoundError):
        pass  # marker-less runs
    return q


def reldiff(oldf: np.ndarray, newf: np.ndarray):
    """(max, std) of |new-old|, relative to max|old| when nonzero."""
    m = np.abs(oldf).max()
    diff = np.abs(np.asarray(newf, dtype=float)
                  - np.asarray(oldf, dtype=float))
    if m == 0.0:
        return float(diff.max()), float(diff.std())
    return float(diff.max() / m), float(diff.std() / m)


def compare_runs(old_model: str, new_model: str, frame: int,
                 verbose: bool = True, include_markers: bool = True):
    """Compare one frame of two runs.  Returns (n_fail, n_nonzero):
    fields over threshold, and fields with any nonzero difference.
    ``include_markers=False`` limits the comparison to field quantities
    (used by cross-code golden gates, where marker RNG streams differ)."""
    old = _frame_quantities(OutputReader(old_model), frame,
                            include_markers=include_markers)
    new = _frame_quantities(OutputReader(new_model), frame,
                            include_markers=include_markers)
    n_fail = n_nonzero = 0
    for kind in old:
        a = old[kind]
        b = new.get(kind)
        if b is None or a.size != b.size:
            if verbose:
                bs = "missing" if b is None else str(b.size)
                print(f"  {kind}:\t\t{a.size} -> {bs} (size mismatch)")
            n_fail += 1
            n_nonzero += 1
            continue
        mx, sg = reldiff(a, b)
        if not (np.isfinite(mx) and np.isfinite(sg)):
            if verbose:
                print(f"  {kind}:\t\t{mx} {sg} (NaN/Inf - field corrupt)")
            n_fail += 1
            n_nonzero += 1
        elif mx + sg > THRESHOLD:
            if verbose:
                print(f"  {kind}:\t\t{mx:.3e} {sg:.3e} (> {THRESHOLD:g})")
            n_fail += 1
            n_nonzero += 1
        else:
            if verbose:
                print(f"  {kind}:\t\t{mx:.3e} {sg:.3e}")
            if mx + sg > 0.0:
                n_nonzero += 1
    return n_fail, n_nonzero


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 3:
        print("Usage: python -m dynearthsol_tpu.compare "
              "<old-modelname> <new-modelname> <frame>")
        return 1
    old_model, new_model, frame = argv[0], argv[1], int(argv[2])
    n_fail, n_nonzero = compare_runs(old_model, new_model, frame)
    if n_fail:
        print("Status: SOMETHING WRONG")
        return 1
    if n_nonzero:
        print("Status: round-off differences only")
    else:
        print("Status: BIT-EXACT")
    return 0


if __name__ == "__main__":
    sys.exit(main())
