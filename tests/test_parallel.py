"""Multi-device tests on a virtual 8-device CPU mesh: the shard_map step
must agree with the single-device step bit-for-bit where the math is
identical, and to fp roundoff otherwise (assembly order differs)."""

import numpy as np
import pytest

import dynearthsol_tpu as des


def _mk_param(nx=16, nz=8, rheo="elasto-visco-plastic"):
    return des.param_from_dict({
        "sim": {"ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 16e3, "ylength": 0.0, "zlength": 8e3,
                 "resolution": 16e3 / nx,
                 "quality_check_step_interval": 10**8},
        "markers": {"markers_per_element": 4},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9, "vbc_x1": 1,
               "vbc_val_x1": 1e-9, "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": rheo, "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9]},
    })


@pytest.fixture(scope="module")
def devices8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices; set "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    return jax.devices()[:8]


def test_shard_map_matches_single_device(devices8):
    import jax
    from dynearthsol_tpu.parallel.shard_step import run_sharded
    from jax.sharding import Mesh

    param = _mk_param()
    sim_ref = des.Simulation(param)
    sim_ref.run_steps(20, chunk=10)

    sim_sh = des.Simulation(param)
    mesh = Mesh(np.asarray(devices8), ("e",))
    run_sharded(sim_sh, mesh, 20, chunk=10)

    for name in ("coord", "vel", "stress", "plstrain", "temperature",
                 "dt", "time", "mass"):
        a = np.asarray(getattr(sim_ref.state, name), dtype=np.float64)
        b = np.asarray(getattr(sim_sh.state, name), dtype=np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        err = np.abs(a - b).max() / scale
        assert err < 1e-12, f"{name}: rel err {err:.2e}"


def test_gspmd_path_matches(devices8):
    """The general GSPMD path (jit + shardings) must also agree."""
    import jax
    from jax.sharding import Mesh
    from dynearthsol_tpu.parallel import (make_device_mesh,
                                          shard_simulation_state)
    from dynearthsol_tpu.simulation import make_step_fn

    param = _mk_param()
    sim_ref = des.Simulation(param)
    step = make_step_fn(param, sim_ref.compensation_pressure)
    s_ref = jax.jit(step)(sim_ref.ctx, sim_ref.state)

    sim2 = des.Simulation(param)
    mesh = Mesh(np.asarray(devices8), ("elem",))
    state_sh, shardings = shard_simulation_state(sim2.state, mesh,
                                                 sim2.topo.nelem)
    s_out = jax.jit(step, out_shardings=shardings)(sim2.ctx, state_sh)
    # atol absorbs denormal noise on ~zero shear components
    np.testing.assert_allclose(np.asarray(s_out.stress),
                               np.asarray(s_ref.stress), rtol=1e-12,
                               atol=1e-6)
