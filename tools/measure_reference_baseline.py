#!/usr/bin/env python
"""Measure the C++ reference's throughput on the bench.py flagship workload.

Runs refbuild/dynearthsol2d (built by tools/build_reference.sh) on the same
512x256-cell structured 2D EVP model bench.py measures, parses the binary's
own end-of-run metric ("Compute: ... = X s/step", dynearthsol.cxx:963-1002),
and writes tools/reference_baseline.json:

  {"elemsteps_per_s_1core": ..., "nelem": ..., "steps": ...,
   "s_per_step": ..., "host": ...}

bench.py's baseline = this single-core measurement x 64, i.e. a
perfectly-scaling 64-core OpenMP run (BASELINE.md's comparison target).
Real OpenMP scaling is sublinear on this memory-bound code, so the
extrapolation only overstates the baseline (understates our speedup).

Usage: python tools/measure_reference_baseline.py [steps]
"""

import json
import os
import platform
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = """\
[sim]
modelname = bench
max_steps = {steps}
output_step_interval = 2147483647
is_outputting_averaged_fields = no

[mesh]
meshing_option = 1
meshing_elem_shape = 1
xlength = 100e3
ylength = 0
zlength = 50e3
resolution = {resolution}
quality_check_step_interval = 10000

[control]
gravity = 10
inertial_scaling = 1e5
has_thermal_diffusion = yes
damping_option = 1

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


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    exe = os.path.join(REPO, "refbuild", "dynearthsol2d")
    if not os.path.exists(exe):
        raise SystemExit("build the reference first: tools/build_reference.sh")
    nx, nz = 512, 256
    nelem = nx * nz * 2
    with tempfile.TemporaryDirectory() as work:
        cfg = os.path.join(work, "bench.cfg")
        with open(cfg, "w") as f:
            f.write(CFG.format(steps=steps, resolution=100e3 / nx))
        r = subprocess.run([exe, "bench.cfg"], cwd=work, capture_output=True,
                           text=True, timeout=3600)
        if r.returncode != 0:
            raise SystemExit(f"reference run failed:\n{r.stdout[-2000:]}"
                             f"{r.stderr[-2000:]}")
        m = re.search(r"Compute\s*:.*?=\s*([0-9.eE+-]+)\s*s/step", r.stdout)
        if not m:
            raise SystemExit(f"no s/step in output:\n{r.stdout[-2000:]}")
        s_per_step = float(m.group(1))
    out = {
        "elemsteps_per_s_1core": nelem / s_per_step,
        "nelem": nelem,
        "steps": steps,
        "s_per_step": s_per_step,
        "host": platform.processor() or platform.machine(),
        "note": "refbuild/dynearthsol2d (g++ -O2, single-thread) on the "
                "bench.py flagship workload; baseline = this x 64 "
                "(perfect OpenMP scaling assumption, overstates baseline)",
    }
    path = os.path.join(REPO, "tools", "reference_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
