#!/usr/bin/env python
"""Throughput benchmark: 2D elasto-visco-plastic (EVP) rifting-style box.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no absolute numbers (BASELINE.md); its own
throughput metric is s/step.  We report element-steps/second (elements *
steps / wall-second) on the flagship 2D EVP workload, and compare against an
estimated 64-core OpenMP reference throughput of the same workload
(REF_BASELINE_ELEMSTEPS_PER_S below; measured reference numbers to replace
the estimate when a reference build is available).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# the step-scan XLA program is large; cache it across runs/rounds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

# the container's sitecustomize prepends the tunneled TPU platform,
# overriding JAX_PLATFORMS; honor an explicit env request (CPU testing)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import dynearthsol_tpu as des

def _reference_baseline():
    """64-core OpenMP reference throughput on the flagship workload.

    tools/measure_reference_baseline.py runs the in-container reference
    build (refbuild/dynearthsol2d) on the SAME 512x256 EVP model and
    records its own s/step metric; the baseline is that single-core
    measurement x 64 (perfect-scaling assumption — real OpenMP scaling of
    this memory-bound code is sublinear, so this overstates the baseline
    and understates our speedup).  Falls back to the round-1 estimate when
    the measurement file is absent."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "reference_baseline.json")
    try:
        with open(path) as f:
            meas = json.load(f)
        return meas["elemsteps_per_s_1core"] * 64.0
    except (OSError, KeyError, ValueError):
        return 2.0e8  # round-1 estimate


REF_BASELINE_ELEMSTEPS_PER_S = _reference_baseline()


def flagship_param(nx_cells=512, nz_cells=256, dtype="float32"):
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


def flagship3d_param(nx_cells=256, ny_cells=48, nz_cells=16,
                     dtype="float32"):
    """3D EVP box: 256x48x16 cells x 5 tets = 983k elements — the
    BASELINE.md north-star scale, on the fused Pallas 3D path."""
    resolution = 1e3
    return des.param_from_dict({
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
                "is_plane_strain": False,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    })


def _measure(param, chunk=250, bench_steps=500):
    sim = des.Simulation(param)
    nelem = sim.topo.nelem
    # warmup run uses the SAME chunk length: exactly one scan compile
    sim.run_steps(chunk, chunk=chunk)
    jax.block_until_ready(sim.state.coord)
    t0 = time.perf_counter()
    sim.run_steps(bench_steps, chunk=chunk)
    jax.block_until_ready(sim.state.coord)
    elapsed = time.perf_counter() - t0
    return nelem * bench_steps / elapsed, nelem


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"],
                    help="state dtype; float64 measures the oracle-"
                         "precision path (TPU emulates f64 — expect "
                         "~30-60x slower; SURVEY §7.2 precision story)")
    ap.add_argument("--case", default="flagship",
                    choices=["flagship", "flagship3d", "unstructured",
                             "postremesh"],
                    help="flagship: structured 512x256 2D EVP (Pallas "
                         "path); flagship3d: 983k-tet 3D EVP (Pallas 3D "
                         "path); unstructured: same physics on an "
                         "unstructured Delaunay mesh (the flat SoA "
                         "path); postremesh: remesh once, then measure "
                         "the sustained post-remesh steady state")
    args = ap.parse_args(argv)

    slow64 = args.dtype == "float64"
    if args.case == "flagship":
        rate, _ = _measure(flagship_param(dtype=args.dtype),
                           chunk=50 if slow64 else 250,
                           bench_steps=100 if slow64 else 500)
        print(json.dumps({
            "metric": "evp2d_element_steps_per_sec"
                      + ("_f64" if slow64 else ""),
            "value": round(rate, 1),
            "unit": "elem*steps/s",
            "vs_baseline": round(rate / REF_BASELINE_ELEMSTEPS_PER_S, 4),
        }))
    elif args.case == "flagship3d":
        rate, nelem = _measure(flagship3d_param(dtype=args.dtype),
                               chunk=20 if slow64 else 100,
                               bench_steps=40 if slow64 else 300)
        print(json.dumps({
            "metric": "evp3d_element_steps_per_sec"
                      + ("_f64" if slow64 else ""),
            "value": round(rate, 1),
            "unit": "elem*steps/s",
            "nelem": nelem,
            "vs_baseline": round(rate / REF_BASELINE_ELEMSTEPS_PER_S, 4),
        }))
    elif args.case == "unstructured":
        param = flagship_param(dtype=args.dtype)
        param.mesh.meshing_elem_shape = 0  # unstructured -> flat SoA path
        rate, nelem = _measure(param, chunk=100, bench_steps=200)
        print(json.dumps({
            "metric": "evp2d_unstructured_element_steps_per_sec",
            "value": round(rate, 1),
            "unit": "elem*steps/s",
            "nelem": nelem,
            "vs_baseline": round(rate / REF_BASELINE_ELEMSTEPS_PER_S, 4),
        }))
    else:  # postremesh: the steady state a production rift run lives in
        from dynearthsol_tpu.remeshing import remesh

        param = flagship_param(dtype=args.dtype)
        param.mesh.meshing_elem_shape = 0
        sim = des.Simulation(param)
        sim.run_steps(20, chunk=20)       # settle, then force one remesh
        remesh(sim, 1)
        nelem = sim.topo.nelem
        sim.run_steps(100, chunk=100)     # warmup compile on new shapes
        jax.block_until_ready(sim.state.coord)
        t0 = time.perf_counter()
        sim.run_steps(200, chunk=100)
        jax.block_until_ready(sim.state.coord)
        rate = nelem * 200 / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": "evp2d_postremesh_element_steps_per_sec",
            "value": round(rate, 1),
            "unit": "elem*steps/s",
            "nelem": nelem,
            "vs_baseline": round(rate / REF_BASELINE_ELEMSTEPS_PER_S, 4),
        }))


if __name__ == "__main__":
    main()
