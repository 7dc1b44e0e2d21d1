"""Fatal-dt contract (geometry.cxx:912-917): a non-positive dt must
write an emergency frame and exit with code 11."""

import dataclasses
import os

import numpy as np
import pytest

import dynearthsol_tpu as des
from dynearthsol_tpu.__main__ import run
from dynearthsol_tpu.simulation import Simulation


def test_dt_fatal_emergency_dump(tmp_path, monkeypatch):
    param = des.param_from_dict({
        "sim": {"modelname": os.path.join(str(tmp_path), "fatal"),
                "max_steps": 50, "output_step_interval": 50,
                "ndims": 2, "float_dtype": "float64"},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 4e3, "ylength": 0.0, "zlength": 2e3,
                 "resolution": 1e3, "quality_check_step_interval": 100},
        "markers": {"markers_per_element": 4},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": True, "rho0": [2800.0],
                "bulk_modulus": [50e9], "shear_modulus": [30e9]},
    })

    orig = Simulation.run_steps

    def poisoned(self, n, chunk=None):
        out = orig(self, n, chunk=chunk)
        self.state = dataclasses.replace(
            self.state, dt=np.zeros_like(np.asarray(self.state.dt)))
        return self.state

    monkeypatch.setattr(Simulation, "run_steps", poisoned)
    with pytest.raises(SystemExit) as exc:
        run(param)
    assert exc.value.code == 11
    # emergency frame written: frame 0 (init) + the dump
    info = param.sim.modelname + ".info"
    assert os.path.exists(info)
    nframes = sum(1 for line in open(info) if line.strip())
    assert nframes >= 2
