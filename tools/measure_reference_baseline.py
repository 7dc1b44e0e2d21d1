#!/usr/bin/env python
"""Measure the C++ reference's throughput on the bench.py flagship workloads.

Runs refbuild/dynearthsol2d or dynearthsol3d (built by
tools/build_reference.sh) on the same structured EVP models bench.py
measures, parses the binary's own end-of-run metric
("Compute: ... = X s/step", dynearthsol.cxx:963-1002), and writes
tools/reference_baseline.json (2D) / reference_baseline_3d.json (3D):

  {"elemsteps_per_s_1core": ..., "nelem": ..., "steps": ...,
   "s_per_step": ..., "host": ...}

bench.py's baseline = this single-core measurement x 64, i.e. a
perfectly-scaling 64-core OpenMP run (BASELINE.md's comparison target).
Real OpenMP scaling is sublinear on this memory-bound code, so the
extrapolation only overstates the baseline (understates our speedup).

Usage: python tools/measure_reference_baseline.py [steps] [--case 2d|3d]
"""

import json
import os
import platform
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_COMMON = """\
[sim]
modelname = bench
max_steps = {steps}
output_step_interval = 2147483647
is_outputting_averaged_fields = no

[control]
gravity = 10
inertial_scaling = 1e5
has_thermal_diffusion = yes
damping_option = 1

[ic]
weakzone_option = 2
weakzone_plstrain = 0.5
weakzone_xcenter = 0.5
weakzone_zcenter = 0.2
weakzone_xsemi_axis = 3e3
weakzone_ysemi_axis = 3e3
weakzone_zsemi_axis = 3e3

[mat]
rheology_type = elasto-visco-plastic
rho0 = [ 2800 ]
bulk_modulus = [ 50e9 ]
shear_modulus = [ 30e9 ]
max_viscosity = 1e24
min_viscosity = 1e19
visc_exponent = [ 3.05 ]
visc_coefficient = [ 1.25e-1 ]
visc_activation_energy = [ 3.76e5 ]
heat_capacity = [ 1000 ]
therm_cond = [ 3.3 ]
alpha = [ 3e-5 ]
pls0 = [ 0 ]
pls1 = [ 0.5 ]
cohesion0 = [ 4.4e7 ]
cohesion1 = [ 4e6 ]
friction_angle0 = [ 30 ]
friction_angle1 = [ 15 ]
dilation_angle0 = [ 0 ]
dilation_angle1 = [ 0 ]
"""

CFG_MESH_2D = """\
[mesh]
meshing_option = 1
meshing_elem_shape = 1
xlength = 100e3
ylength = 0
zlength = 50e3
resolution = {resolution}
quality_check_step_interval = 10000

[bc]
vbc_x0 = 1
vbc_val_x0 = -1e-9
vbc_x1 = 1
vbc_val_x1 = 1e-9
vbc_z0 = 0
vbc_z1 = 0
has_winkler_foundation = no
has_water_loading = no
surface_temperature = 273
mantle_temperature = 1600
"""

# bench.py flagship3d: 256x48x16 cells x 5 tets = 983,040 elements
CFG_MESH_3D = """\
[mesh]
meshing_option = 1
meshing_elem_shape = 1
xlength = 256e3
ylength = 48e3
zlength = 16e3
resolution = 1e3
quality_check_step_interval = 10000

[bc]
vbc_x0 = 1
vbc_val_x0 = -1e-9
vbc_x1 = 1
vbc_val_x1 = 1e-9
vbc_y0 = 1
vbc_val_y0 = 0
vbc_y1 = 1
vbc_val_y1 = 0
vbc_z0 = 0
vbc_z1 = 0
has_winkler_foundation = no
has_water_loading = no
surface_temperature = 273
mantle_temperature = 1600
"""


def measure(case: str, steps: int) -> dict:
    exe = os.path.join(REPO, "refbuild",
                       "dynearthsol2d" if case == "2d" else "dynearthsol3d")
    if not os.path.exists(exe):
        raise SystemExit("build the reference first: tools/build_reference.sh")
    if case == "2d":
        nx, nz = 512, 256
        nelem = nx * nz * 2
        mesh = CFG_MESH_2D.format(resolution=100e3 / nx)
    else:
        nelem = 256 * 48 * 16 * 5
        mesh = CFG_MESH_3D
    with tempfile.TemporaryDirectory() as work:
        cfg = os.path.join(work, "bench.cfg")
        with open(cfg, "w") as f:
            f.write(CFG_COMMON.format(steps=steps) + mesh)
        env = dict(os.environ, OMP_NUM_THREADS="1")
        r = subprocess.run([exe, "bench.cfg"], cwd=work, capture_output=True,
                           text=True, timeout=14400, env=env)
        if r.returncode != 0:
            raise SystemExit(f"reference run failed:\n{r.stdout[-2000:]}"
                             f"{r.stderr[-2000:]}")
        m = re.search(r"Compute\s*:.*?=\s*([0-9.eE+-]+)\s*s/step", r.stdout)
        if not m:
            raise SystemExit(f"no s/step in output:\n{r.stdout[-2000:]}")
        s_per_step = float(m.group(1))
    return {
        "elemsteps_per_s_1core": nelem / s_per_step,
        "nelem": nelem,
        "steps": steps,
        "s_per_step": s_per_step,
        "host": platform.processor() or platform.machine(),
        "note": f"refbuild/dynearthsol{case[0]}d (g++ -O2, single-thread, "
                f"OMP_NUM_THREADS=1) on the bench.py flagship{'' if case == '2d' else '3d'} "
                "workload; baseline = this x 64 (perfect OpenMP scaling "
                "assumption, overstates baseline)",
    }


def main():
    args = [a for a in sys.argv[1:]]
    case = "2d"
    if "--case" in args:
        i = args.index("--case")
        case = args[i + 1]
        del args[i:i + 2]
    steps = int(args[0]) if args else (100 if case == "2d" else 50)
    out = measure(case, steps)
    name = ("reference_baseline.json" if case == "2d"
            else "reference_baseline_3d.json")
    path = os.path.join(REPO, "tools", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
