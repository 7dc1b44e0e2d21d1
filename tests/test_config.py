"""Config parser tests against the reference's cfg dialect
(input.cxx:16-901, examples/defaults.cfg)."""

import os

import pytest

from dynearthsol_tpu.config import (RH_EP, RH_MAXWELL, load_config,
                                    param_from_dict)

REF = "/root/reference"


def test_defaults():
    p = param_from_dict({"mat": {"rheology_type": "maxwell"},
                         "mesh": {"resolution": 1.0}})
    assert p.control.gravity == 10.0
    assert p.control.inertial_scaling == 1e5
    assert p.control.damping_option == 1
    assert p.control.damping_factor == 0.8
    assert p.bc.vbc_x0 == 1
    assert p.mat.visc_max == 1e24
    assert p.mat.rheol_type == RH_MAXWELL


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_parse_maxwell_cfg():
    p = load_config(f"{REF}/benchmarks/maxwell.cfg")
    assert p.sim.max_steps == 10000000
    assert p.mesh.resolution == 0.05
    assert p.control.gravity == 0.0
    assert p.control.characteristic_speed == 1e-14
    assert p.control.inertial_scaling == 1e6
    assert p.control.has_thermal_diffusion is False
    assert p.bc.vbc_x1 == 100 and p.bc.vbc_val_x1 == -1e-14
    assert p.mat.rheol_type == RH_MAXWELL
    assert p.mat.bulk_modulus == [1e12]
    assert p.mat.visc_min == p.mat.visc_max == 1e22


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_parse_oedometer_cfg():
    p = load_config(f"{REF}/benchmarks/oedometer-2d.cfg")
    assert p.mat.rheol_type == RH_EP
    assert p.mat.is_plane_strain is True
    assert p.control.fixed_dt == 1.0
    assert p.mat.friction_angle0 == [10.0]
    assert p.mat.tension_max == 5.67e6
    # repeated [sim] sections merge
    assert p.sim.max_steps == 2000


def test_broadcast_per_material():
    p = param_from_dict({
        "mat": {"rheology_type": "elastic", "nmat": 3, "rho0": [2800.0]},
        "mesh": {"resolution": 1.0}})
    assert p.mat.rho0 == [2800.0] * 3
    assert len(p.mat.bulk_modulus) == 3


def test_refined_zone_mesh():
    """meshing_option 2 (mesh.cxx:1618-1846): element size ~resolution^2
    inside the refined zone, graded up to ~largest_size*resolution^2
    outside."""
    import numpy as np

    import dynearthsol_tpu as des

    param = des.param_from_dict({
        "sim": {"ndims": 2},
        "mesh": {"meshing_option": 2, "meshing_elem_shape": 0,
                 "xlength": 100e3, "zlength": 50e3,
                 "resolution": 2e3, "largest_size": 16.0,
                 "refined_zonex": [0.4, 0.6],
                 "refined_zonez": [0.7, 1.0],
                 "quality_check_step_interval": 10**8},
        "control": {"gravity": 0.0},
        "mat": {"rheology_type": "elastic", "rho0": [2800.0],
                "bulk_modulus": [50e9], "shear_modulus": [30e9]},
    })
    sim = des.Simulation(param)
    vol = np.asarray(sim.state.volume)
    assert (vol > 0).all()
    cen = np.asarray(sim.mesh.coord)[sim.topo.connectivity].mean(axis=1)
    # refined_zonez is measured downward from the surface: [0.7, 1] is the
    # bottom 30%; refined_zonex [0.4, 0.6] the middle fifth
    fine = ((cen[:, 0] > 42e3) & (cen[:, 0] < 58e3)
            & (cen[:, 1] < -37e3))
    coarse = (cen[:, 1] > -20e3) & ((cen[:, 0] < 20e3)
                                    | (cen[:, 0] > 80e3))
    res2 = 2e3 ** 2
    fine_med = np.median(vol[fine])
    assert fine_med < 2.5 * res2
    # the Ruppert min-angle pass (Triangle q parity) rounds off sharp
    # grading transitions: the coarse region stays clearly coarser than
    # the refined zone, but its absolute size is quality-bounded
    assert np.median(vol[coarse]) > 1.5 * fine_med


def test_models_registry_and_utils():
    """models/ registry constructors all validate; utils/geotherm matches
    the ic.py layered geotherm analytically."""
    import warnings

    import numpy as np

    import dynearthsol_tpu as des
    import dynearthsol_tpu.ic as ic_mod
    from dynearthsol_tpu import models
    from dynearthsol_tpu.mesh import create_new_mesh
    from dynearthsol_tpu.utils.geotherm import layered_radiogenic_T

    for name, fn in models.REGISTRY.items():
        p = fn()
        assert p.sim.ndims in (2, 3), name

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p = des.load_config("/root/reference/examples/test-geotherm.cfg")
    mesh = create_new_mesh(p)
    T = ic_mod.initial_temperature(p, mesh.coord)

    def mv(vec, m):
        return vec[m] if len(vec) > 1 else vec[0]

    mats = p.ic.radiogenic_heat_mat_in_layer
    k = [mv(p.mat.therm_cond, m) for m in mats]
    rh = [mv(p.mat.radiogenic_heat_prod, m) * mv(p.mat.rho0, m)
          for m in mats]
    Ta, _ = layered_radiogenic_T(
        -mesh.coord[:, 1], p.bc.surface_temperature,
        p.bc.mantle_temperature, np.asarray(p.ic.radiogenic_heat_boundry),
        k, rh, p.ic.radiogenic_folding_depth)
    assert np.abs(T - Ta).max() < 1e-9


def test_every_param_field_consumed_or_declared():
    """No config option may parse cleanly and silently do nothing: every
    Param dataclass field must be referenced somewhere outside config.py
    (or inside config.validate, which enforces semantics like list
    lengths), or appear in config.KNOWN_UNCONSUMED with a reason.  This
    audit would have caught every instance of the silent-ignore bug
    class to date (has_body_force_adjustment, use_mmg_init,
    is_restarting_weakzone, is_discarding_internal_segments)."""
    import dataclasses
    import inspect
    import pathlib
    import re

    import dynearthsol_tpu.config as cfg

    pkg = pathlib.Path(cfg.__file__).parent
    src = "".join(p.read_text() for p in pkg.rglob("*.py")
                  if p.name != "config.py")
    # validate() consumes fields with semantic effect (length contracts,
    # warn-and-disable); parse plumbing and declarations do not count
    src += inspect.getsource(cfg.validate)

    missing = []
    param = cfg.Param()
    for sec_name, sec in vars(param).items():
        if not dataclasses.is_dataclass(sec):
            continue
        for f in dataclasses.fields(sec):
            key = f"{sec_name}.{f.name}"
            if key in cfg.KNOWN_UNCONSUMED:
                continue
            if not re.search(r"\b%s\b" % re.escape(f.name), src):
                missing.append(key)
    assert not missing, (
        f"Param fields parsed but never consumed and not declared in "
        f"config.KNOWN_UNCONSUMED: {missing}")


def test_known_unconsumed_list_is_not_stale():
    """Fields listed as unconsumed must actually BE unconsumed — when one
    gets implemented, it must leave the table."""
    import dataclasses
    import pathlib
    import re

    import dynearthsol_tpu.config as cfg

    pkg = pathlib.Path(cfg.__file__).parent
    src = "".join(p.read_text() for p in pkg.rglob("*.py")
                  if p.name != "config.py")
    param = cfg.Param()
    valid = set()
    for sec_name, sec in vars(param).items():
        if dataclasses.is_dataclass(sec):
            for f in dataclasses.fields(sec):
                valid.add(f"{sec_name}.{f.name}")
    for key in cfg.KNOWN_UNCONSUMED:
        assert key in valid, f"KNOWN_UNCONSUMED names unknown field {key}"
        name = key.split(".", 1)[1]
        # use_mmg_init is consumed by validate() itself (warn+disable)
        if key == "mesh.use_mmg_init":
            continue
        assert not re.search(r"\b%s\b" % re.escape(name), src), (
            f"{key} is referenced in the package now - remove it from "
            f"KNOWN_UNCONSUMED")
