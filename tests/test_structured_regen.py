"""Boundary-fitted structured regeneration (remeshing_option 100).

A framework extension (no reference counterpart): remeshing returns grid
TOPOLOGY fitted to the deformed boundaries, so the run stays on the
structured fast paths (grid2d/pallas2d) across remeshes and the
regenerated shapes are identical every time (zero XLA recompiles after
the first remesh).  See remesh_impl.structured_regen_2d.
"""

import numpy as np
import pytest

import dynearthsol_tpu as des
from dynearthsol_tpu.remeshing import remesh


def make_param(elem_shape=1, markers=False, option=100):
    d = {
        "sim": {"ndims": 2, "max_steps": 10**9, "float_dtype": "float64"},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": elem_shape,
                 "xlength": 10e3, "zlength": 5e3, "resolution": 500.0,
                 "quality_check_step_interval": 10**8,
                 "remeshing_option": option},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True, "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9, "vbc_x1": 1,
               "vbc_val_x1": 1e-9, "vbc_z0": 0, "vbc_z1": 0,
               "surface_temperature": 273.0,
               "mantle_temperature": 1600.0},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": True, "rho0": [2800.0, 3300.0][:1],
                "bulk_modulus": [50e9], "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    }
    if markers:
        d["markers"] = {"markers_per_element": 4, "init_marker_option": 1}
        d["mat"]["nmat"] = 2
        d["mat"]["rho0"] = [2800.0, 3300.0]
        d["mat"]["bulk_modulus"] = [50e9, 80e9]
        d["mat"]["shear_modulus"] = [30e9, 48e9]
        d["ic"] = {"mattype_layer_depths": [0.5], "layer_mattypes": [0, 1]}
    return des.param_from_dict(d)


def test_structured_run_stays_structured_zero_recompiles():
    sim = des.Simulation(make_param(elem_shape=1))
    sgrid0 = tuple(sim.ctx.sgrid)
    sim.run_steps(20, chunk=10)
    path0 = sim.step_path
    fns0 = dict(sim._chunk_fns)
    vol0 = float(np.asarray(sim.state.volume).sum())
    top_z0 = np.sort(np.asarray(sim.state.coord)[
        (sim.topo.bcflag & 32) != 0, 1])

    remesh(sim, 1)
    assert tuple(sim.ctx.sgrid) == sgrid0
    # shape-stable: the compiled chunk functions survive the remesh
    assert sim._chunk_fns and all(
        sim._chunk_fns[k] is fns0[k] for k in fns0)
    # conservation through the remap (same column count, boundaries
    # sampled from the old polylines)
    vol1 = float(np.asarray(sim.state.volume).sum())
    assert abs(vol1 - vol0) / vol0 < 1e-9
    # free-surface topography survives (linear resampling error only)
    top_z1 = np.sort(np.asarray(sim.state.coord)[
        (sim.topo.bcflag & 32) != 0, 1])
    assert np.abs(top_z1 - top_z0).max() < 1e-3 * 5e3

    s = sim.run_steps(20, chunk=10)
    assert sim.step_path == path0
    assert np.isfinite(np.asarray(s.stress)).all()
    assert np.isfinite(np.asarray(s.vel)).all()

    # second remesh: still shape-stable
    remesh(sim, 1)
    assert tuple(sim.ctx.sgrid) == sgrid0 and sim._chunk_fns


def test_unstructured_converts_to_structured():
    sim = des.Simulation(make_param(elem_shape=0))
    assert sim.ctx.sgrid is None
    sim.run_steps(20, chunk=10)
    vol0 = float(np.asarray(sim.state.volume).sum())
    remesh(sim, 1)
    assert sim.ctx.sgrid is not None
    nx, nz = sim.ctx.sgrid
    assert sim.topo.nelem == 2 * (nx - 1) * (nz - 1)
    vol1 = float(np.asarray(sim.state.volume).sum())
    assert abs(vol1 - vol0) / vol0 < 1e-6
    s = sim.run_steps(20, chunk=10)
    assert sim.step_path in ("grid2d", "pallas2d", "pallas2d_res")
    assert np.isfinite(np.asarray(s.stress)).all()


def test_markers_survive_structured_regen():
    sim = des.Simulation(make_param(elem_shape=1, markers=True))
    sim.run_steps(10, chunk=10)
    n0 = sim.markers.n
    remesh(sim, 1)
    # markers relocated; replenishment keeps every element populated
    assert sim.markers.n > 0.5 * n0
    h = sim.markers.elem_histogram(sim.topo.nelem, 2)
    assert (h.sum(axis=1) > 0).all()
    # the crust/mantle layering survives the remap: shallow elements
    # mostly material 0, deep mostly material 1
    emw = np.asarray(sim.state.emw)
    zc = np.asarray(sim.state.coord)[sim.topo.connectivity, 1].mean(axis=1)
    shallow = zc > -0.3 * 5e3
    deep = zc < -0.7 * 5e3
    assert (emw[shallow, 0] > emw[shallow, 1]).mean() > 0.9
    assert (emw[deep, 1] > emw[deep, 0]).mean() > 0.9


def test_fallback_when_assumptions_violated():
    from dynearthsol_tpu.remesh_impl import structured_regen_2d

    sim = des.Simulation(make_param(elem_shape=1))
    coord = np.asarray(sim.state.coord, dtype=np.float64).copy()
    # tilt a side wall: columns assumption broken -> None
    x0 = (sim.topo.bcflag & 1) != 0
    coord[x0, 0] += np.linspace(0, 300.0, x0.sum())
    assert structured_regen_2d(sim.param, coord, sim.topo) is None

    # and the full remesh falls back to the standard regeneration
    sim2 = des.Simulation(make_param(elem_shape=0))
    sim2.run_steps(10, chunk=10)
    c = np.asarray(sim2.state.coord, dtype=np.float64).copy()
    import dataclasses
    import jax.numpy as jnp
    x0m = (sim2.topo.bcflag & 1) != 0
    c[x0m, 0] += np.linspace(0, 300.0, x0m.sum())
    sim2.state = dataclasses.replace(
        sim2.state, coord=jnp.asarray(c, dtype=sim2.state.coord.dtype))
    remesh(sim2, 1)
    assert sim2.ctx.sgrid is None  # standard path regenerated
    s = sim2.run_steps(10, chunk=10)
    assert np.isfinite(np.asarray(s.stress)).all()


def test_structured_regen_3d():
    p = des.param_from_dict({
        "sim": {"ndims": 3, "max_steps": 10**9, "float_dtype": "float64"},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 8e3, "ylength": 4e3, "zlength": 4e3,
                 "resolution": 1e3,
                 "quality_check_step_interval": 10**8,
                 "remeshing_option": 100},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "has_thermal_diffusion": True, "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9, "vbc_x1": 1,
               "vbc_val_x1": 1e-9, "vbc_y0": 1, "vbc_val_y0": 0.0,
               "vbc_y1": 1, "vbc_val_y1": 0.0, "vbc_z0": 0, "vbc_z1": 0,
               "surface_temperature": 273.0,
               "mantle_temperature": 1600.0},
        "mat": {"rheology_type": "elasto-visco-plastic",
                "is_plane_strain": False, "rho0": [2800.0],
                "bulk_modulus": [50e9], "shear_modulus": [30e9],
                "visc_max": 1e24, "visc_min": 1e19},
    })
    sim = des.Simulation(p)
    sgrid0 = tuple(sim.ctx.sgrid)
    sim.run_steps(10, chunk=10)
    fns0 = dict(sim._chunk_fns)
    vol0 = float(np.asarray(sim.state.volume).sum())
    remesh(sim, 1)
    assert tuple(sim.ctx.sgrid) == sgrid0
    assert sim._chunk_fns and all(
        sim._chunk_fns[k] is fns0[k] for k in fns0)
    vol1 = float(np.asarray(sim.state.volume).sum())
    assert abs(vol1 - vol0) / vol0 < 1e-9
    s = sim.run_steps(10, chunk=10)
    assert np.isfinite(np.asarray(s.stress)).all()
