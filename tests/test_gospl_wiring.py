"""Driver wiring for externally-driven surface processes.

surface_process_option 11 (GoSPL, bc.cxx:1104-1256 + dynearthsol.cxx:
632-709) and 101 (custom hook, bc.cxx case 101) must reach the exchange
path — surface velocities out, dh in, dh applied like any other surface
increment — without the real GoSPL dependency (mocked here)."""

import numpy as np
import pytest

import dynearthsol_tpu as des
from dynearthsol_tpu import hooks


def _param(opt, **ctrl_extra):
    ctrl = {"gravity": 0.0, "inertial_scaling": 1e5, "damping_option": 1,
            "surface_process_option": opt}
    ctrl.update(ctrl_extra)
    return des.param_from_dict({
        "sim": {"max_steps": 5, "ndims": 2, "float_dtype": "float64",
                "output_step_interval": 1,
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10e3, "ylength": 0.0, "zlength": 5e3,
                 "resolution": 1e3, "quality_check_step_interval": 10**6},
        "markers": {"markers_per_element": 0},
        "control": ctrl,
        "bc": {"vbc_x0": 1, "vbc_val_x0": 0.0, "vbc_x1": 1,
               "vbc_val_x1": 0.0, "vbc_z0": 1, "vbc_val_z0": 0.0,
               "vbc_z1": 0, "has_winkler_foundation": False},
        "mat": {"rheology_type": "elastic", "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9]},
    })


def test_custom_hook_101_applies_dh(tmp_path, monkeypatch):
    calls = []

    def hook(sim, dt_elapsed):
        calls.append(dt_elapsed)
        ntop = int(sim.ctx.surf.ntop)
        return np.full(ntop, -0.5)  # half a metre of erosion per wake

    hooks.set_custom_surface_process(hook)
    try:
        monkeypatch.chdir(tmp_path)
        from dynearthsol_tpu.__main__ import run
        param = _param(101)
        run(param)
    finally:
        hooks.set_custom_surface_process(None)

    assert len(calls) >= 5  # hook fires every step (bc.cxx case 101)
    # the eroded surface is recorded in the final frame
    from dynearthsol_tpu.postproc import OutputReader
    r = OutputReader("result")
    coord = r.read_field(r.frames[-1], "coordinate")
    assert coord[:, 1].max() < -0.5 * (len(calls) - 1) + 1e-6


class _MockGoSPL:
    """Stands in for GoSPLDriver: fixed dh per coupling event."""

    def __init__(self, param):
        self.param = param
        self.initialized = False
        self.couplings = 0
        self.remeshes = 0
        self.step_counter = 0
        self.accumulated_dt = 0.0
        self.freq = param.control.gospl_coupling_frequency

    def initialize(self, yml, xy, elev):
        self.initialized = True

    def should_couple_elapsed(self, n_steps, dt_elapsed):
        self.step_counter += n_steps
        return self.step_counter >= self.freq

    def steps_to_next_coupling(self):
        return max(1, self.freq - self.step_counter)

    def run_and_get_erosion(self, xy, elev, vel):
        self.couplings += 1
        self.step_counter = 0
        return np.full(len(elev), -1.0)

    def on_remesh(self):
        self.remeshes += 1


def test_gospl_option_11_exchange(tmp_path, monkeypatch):
    import dynearthsol_tpu.gospl_driver as gd
    monkeypatch.setattr(gd, "GoSPLDriver", _MockGoSPL)
    monkeypatch.chdir(tmp_path)
    from dynearthsol_tpu.__main__ import run
    param = _param(11, gospl_coupling_frequency=2,
                   gospl_coupling_mode="steps")
    run(param)

    from dynearthsol_tpu.postproc import OutputReader
    r = OutputReader("result")
    coord = r.read_field(r.frames[-1], "coordinate")
    # 5 steps / frequency 2 -> 2 coupling events, 1 m erosion each
    assert coord[:, 1].max() <= -2.0 + 1e-6
    assert coord[:, 1].max() >= -3.0 - 1e-6


def test_generate_gospl_mesh_padding_and_perturbation():
    """generate_mesh parity (gospl-driver.cxx:461-600): padded extent,
    resolution-controlled grid, interior-only perturbation."""
    import numpy as np

    from dynearthsol_tpu.gospl_driver import generate_gospl_mesh

    xg, yg = np.meshgrid(np.linspace(0.0, 100.0, 11),
                         np.linspace(0.0, 100.0, 11))
    x, y = xg.ravel(), yg.ravel()
    pts, cells = generate_gospl_mesh(x, y, resolution=10.0,
                                     perturbation=0.0, padding=0.1)
    # padding 10% per side -> extent [-10, 110]
    assert abs(pts[:, 0].min() + 10.0) < 1e-9
    assert abs(pts[:, 0].max() - 110.0) < 1e-9
    assert cells.ndim == 2 and cells.shape[1] == 3
    # perturbation moves only interior nodes, bounded by half a spacing
    pts2, _ = generate_gospl_mesh(x, y, resolution=10.0,
                                  perturbation=0.3, padding=0.1)
    assert pts2.shape == pts.shape
    d = np.abs(pts2 - pts)
    assert d.max() > 0.0 and d.max() <= 0.5 * 10.0 * 0.3 + 1e-9
    onb = (np.abs(pts[:, 0] + 10) < 1e-9) | (np.abs(pts[:, 0] - 110) < 1e-9) \
        | (np.abs(pts[:, 1] + 10) < 1e-9) | (np.abs(pts[:, 1] - 110) < 1e-9)
    assert d[onb].max() == 0.0

    # degenerate 2D surface (y == 0): still a valid 2D mesh
    p2d, c2d = generate_gospl_mesh(np.linspace(0, 100, 11),
                                   np.zeros(11), resolution=10.0,
                                   perturbation=0.0, padding=0.1)
    assert c2d.shape[1] == 3 and np.ptp(p2d[:, 1]) > 0
