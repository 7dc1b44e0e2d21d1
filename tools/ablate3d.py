#!/usr/bin/env python
"""Timing ablation of the fused 3D Pallas kernel on real hardware.

Runs the flagship3d bench shape once per DES_P3D_ABLATE tag (each in a
subprocess: the knob is baked in at trace time) and prints a table of
ms/step.  Physics is wrong under ablation — this is a profiler, not a
benchmark."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import time, numpy as np, sys
sys.path.insert(0, %r)
import dynearthsol_tpu as des
from bench import flagship3d_param

sim = des.Simulation(flagship3d_param())
sim.run_steps(100, chunk=100)
float(np.asarray(sim.state.time))
t0 = time.perf_counter()
sim.run_steps(200, chunk=100)
float(np.asarray(sim.state.time))
el = time.perf_counter() - t0
print("RESULT", el / 200 * 1e3, sim.topo.nelem * 200 / el, sim.step_path)
""" % (REPO,)

TAGS = ["", "cfl", "jaumann", "rheol", "masses", "ph1",
        "cfl,jaumann,rheol,masses,ph1"]


def main():
    tags = sys.argv[1:] or TAGS
    out = {}
    for tag in tags:
        env = dict(os.environ, DES_P3D_ABLATE=tag)
        try:
            r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               capture_output=True, text=True, timeout=2700)
        except subprocess.TimeoutExpired:
            out[tag or "baseline"] = {"error": "timeout"}
            print(json.dumps({tag or "baseline": "timeout"}), flush=True)
            continue
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        if line:
            ms, rate, path = line[0].split()[1:]
            out[tag or "baseline"] = {"ms_per_step": round(float(ms), 3),
                                      "elemsteps_per_s": round(float(rate)),
                                      "path": path}
        else:
            out[tag or "baseline"] = {"error":
                                      (r.stderr or r.stdout).strip()[-300:]}
        print(json.dumps({tag or "baseline": out[tag or "baseline"]}),
              flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
