"""Output format + checkpoint/restart tests.

The gold standard: files we write must be readable by the REFERENCE's own
Dynearthsol.py reader (format parity), and a restarted run must reproduce
the continuous run bit-for-bit (benchmarks-cores fresh-restart-cmp
contract)."""

import os
import sys

import numpy as np
import pytest

import dynearthsol_tpu as des
from dynearthsol_tpu.io import Output, TaggedReader, restart


def small_param(tmpdir, name="iotest", **over):
    d = {
        "sim": {"modelname": os.path.join(str(tmpdir), name),
                "max_steps": 100, "ndims": 2, "float_dtype": "float64",
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 10e3, "ylength": 0.0, "zlength": 5e3,
                 "resolution": 1e3,
                 "quality_check_step_interval": 10},
        "markers": {"markers_per_element": 4, "random_seed": 3},
        "control": {"gravity": 10.0, "inertial_scaling": 1e5,
                    "damping_option": 1},
        "bc": {"vbc_x0": 1, "vbc_val_x0": -1e-9,
               "vbc_x1": 1, "vbc_val_x1": 1e-9,
               "vbc_z0": 0, "vbc_z1": 0,
               "has_winkler_foundation": False,
               "has_water_loading": False},
        "mat": {"rheology_type": "elasto-plastic", "is_plane_strain": True,
                "rho0": [2800.0], "bulk_modulus": [50e9],
                "shear_modulus": [30e9]},
    }
    for sec, kv in over.items():
        d.setdefault(sec, {}).update(kv)
    return des.param_from_dict(d)


def test_tagged_roundtrip(tmp_path):
    from dynearthsol_tpu.io.tagged import TaggedWriter

    path = str(tmp_path / "t.bin")
    a = np.arange(12, dtype=np.float64).reshape(4, 3)
    b = np.arange(5, dtype=np.int32)
    with TaggedWriter(path, 2) as w:
        w.write_array(a, "alpha")
        w.write_array(b, "beta idx")
    r = TaggedReader(path)
    assert r.ndims == 2 and r.revision == 3
    assert np.array_equal(r.read_array("alpha", np.float64, 12).reshape(4, 3),
                          a)
    assert np.array_equal(r.read_array("beta idx", np.int32, 5), b)
    r.close()


def test_output_frame_and_reference_reader(tmp_path):
    param = small_param(tmp_path)
    sim = des.Simulation(param)
    sim.run_steps(5, chunk=5)
    out = Output(param)
    out.write_exact(sim)

    # our own reader
    r = TaggedReader(param.sim.modelname + ".save.000000")
    for name in ("coordinate", "connectivity", "velocity", "temperature",
                 "stress", "strain", "plastic strain", "viscosity",
                 "density", "mesh quality", "material", "force", "coord0",
                 "bcflag", "markerset.eta"):
        assert r.has_array(name), name
    r.close()

    # the REFERENCE's reader must parse our files unchanged
    sys.path.insert(0, "/root/reference")
    try:
        from Dynearthsol import Dynearthsol
        d = Dynearthsol(param.sim.modelname)
        assert d.ndims == 2
        assert d.steps == [5]
        coord = d.read_field(0, "coordinate")
        assert coord.shape == (sim.topo.nnode, 2)
        stress = d.read_field(0, "stress")
        assert stress.shape == (sim.topo.nelem, 3)
        assert np.allclose(stress, np.asarray(sim.state.stress))
        mfields = d.read_markers(0, "markerset")
        assert mfields["markerset.mattype"].shape == (sim.markers.n,)
    finally:
        sys.path.remove("/root/reference")


def test_fresh_restart_bitexact(tmp_path):
    # continuous run: 20 steps, output at 10 (frame 1) and 20
    p1 = small_param(tmp_path, name="cont",
                     sim={"output_step_interval": 10,
                          "checkpoint_frame_interval": 1})
    sim = des.Simulation(p1)
    out = Output(p1)
    out.write_checkpoint(sim)
    out.write_exact(sim)
    sim.run_steps(10, chunk=5)
    out.write_checkpoint(sim)
    out.write(sim)
    mid_coord = np.asarray(sim.state.coord).copy()
    sim.run_steps(10, chunk=5)
    cont = sim.state

    # restart from frame 1 (step 10), run 10 more
    p2 = small_param(tmp_path, name="cont",
                     sim={"output_step_interval": 10,
                          "checkpoint_frame_interval": 1,
                          "is_restarting": True,
                          "restarting_from_frame": 1})
    p2.sim.restarting_from_modelname = p2.sim.modelname
    sim2, frame = restart(p2)
    assert frame == 1
    assert int(sim2.state.steps) == 10
    np.testing.assert_array_equal(np.asarray(sim2.state.coord),
                                  np.asarray(mid_coord))
    sim2.run_steps(10, chunk=5)
    rest = sim2.state

    for name in ("coord", "vel", "stress", "stressyy", "strain", "plstrain",
                 "temperature", "volume", "mass", "dt", "time"):
        a = np.asarray(getattr(cont, name))
        b = np.asarray(getattr(rest, name))
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_info_file_format(tmp_path):
    param = small_param(tmp_path, name="info")
    sim = des.Simulation(param)
    out = Output(param)
    out.write_exact(sim)
    info = np.loadtxt(param.sim.modelname + ".info", ndmin=2)
    assert info.shape == (1, 8)
    assert info[0, 0] == 0  # frame
    assert info[0, 5] == sim.topo.nnode
    assert info[0, 6] == sim.topo.nelem
    assert info[0, 7] == sim.topo.nseg


def test_vtkhdf_output_reference_reader(tmp_path):
    """VTKHDF frames must be readable by the reference's Dynearthsol.py
    hdf5 branch and carry a valid VTKHDF tree (binaryio.cxx:344-1116)."""
    import h5py

    param = small_param(tmp_path, name="h5test",
                        sim={"output_format": "vtkhdf"})
    sim = des.Simulation(param)
    sim.run_steps(5, chunk=5)
    out = Output(param)
    out.write_exact(sim)

    fname = param.sim.modelname + ".save.000000.vtkhdf"
    with h5py.File(fname) as f:
        assert f.attrs["ndims"] == 2
        g = f["VTKHDF/grid"]
        assert g.attrs["Type"] == b"UnstructuredGrid"
        assert f["VTKHDF/grid/Points"].shape == (sim.topo.nnode, 3)
        assert f["VTKHDF/grid/Types"][0] == 5  # triangles
        np.testing.assert_allclose(f["VTKHDF/grid/PointData/velocity"][:],
                                   np.asarray(sim.state.vel))
        assert "stress" in f["VTKHDF/grid/CellData"]

    sys.path.insert(0, "/root/reference")
    try:
        from Dynearthsol import Dynearthsol
        d = Dynearthsol(param.sim.modelname)
        assert d.format == "hdf5"
        stress = d.read_field(0, "stress")
        np.testing.assert_allclose(stress, np.asarray(sim.state.stress))
    finally:
        sys.path.remove("/root/reference")


def test_postproc_reader_and_vtk(tmp_path):
    """Our post-processing reader (postproc.py, the Dynearthsol.py/2vtk.py
    counterpart) round-trips frames and emits valid legacy VTK."""
    from dynearthsol_tpu.postproc import OutputReader, to_vtk

    param = small_param(tmp_path, name="pp")
    sim = des.Simulation(param)
    sim.run_steps(5, chunk=5)
    out = Output(param)
    out.write_exact(sim)

    r = OutputReader(param.sim.modelname)
    assert r.ndims == 2 and r.frames == [0]
    np.testing.assert_allclose(r.read_field(0, "stress"),
                               np.asarray(sim.state.stress))
    mk = r.read_markers(0)
    assert mk["size"] == sim.markers.n

    vtk = to_vtk(param.sim.modelname, 0, str(tmp_path / "out.vtk"),
                 principal=True, melting=True)
    text = open(vtk).read()
    assert "UNSTRUCTURED_GRID" in text
    assert "stress_II" in text
    assert f"POINTS {sim.topo.nnode} double" in text
    # 2vtk derived fields (2vtk.py:106-198)
    for nm in ("total_displacement", "horizon", "stress_I",
               "effective_viscosity", "VECTORS s1", "VECTORS s3",
               "melting"):
        assert nm in text, nm

    # marker VTP export (2vtk -m role)
    from dynearthsol_tpu.postproc import to_vtp
    vtp = to_vtp(param.sim.modelname, 0, str(tmp_path / "mk.vtp"))
    vt = open(vtp).read()
    assert 'type="PolyData"' in vt
    assert f'NumberOfPoints="{sim.markers.n}"' in vt
    assert "markerset.mattype" in vt

    # principal directions: 2D closed form vs eigen decomposition
    from dynearthsol_tpu.postproc import compute_principal_stress
    st = np.asarray(sim.state.stress, np.float64)
    s1, s3 = compute_principal_stress(st)
    sxx, szz, sxz = st[:, 0], st[:, 1], st[:, 2]
    mag = np.sqrt(0.25 * (sxx - szz) ** 2 + sxz ** 2)
    np.testing.assert_allclose(np.linalg.norm(s1, axis=1), mag,
                               rtol=1e-12, atol=1e-30)
    np.testing.assert_allclose(np.linalg.norm(s3, axis=1), mag,
                               rtol=1e-12, atol=1e-30)

    # heat flux in the VTK output (2vtk output_heatflux role)
    vtk2 = to_vtk(param.sim.modelname, 0, str(tmp_path / "hf.vtk"),
                  heatflux=True)
    t2 = open(vtk2).read()
    for nm in ("heat_flux_x", "heat_flux_z", "heat_flux_magnitude"):
        assert nm in t2, nm


def test_heat_flux_matches_reference_formula():
    """compute_heat_flux's P1-gradient form vs the reference's
    cross-product construction (Dynearthsol.py:158-179), verbatim."""
    from dynearthsol_tpu.postproc import compute_heat_flux

    rng = np.random.default_rng(0)
    nnode, nelem = 40, 25
    coord = rng.uniform(0.0, 1e3, size=(nnode, 2))
    conn = rng.integers(0, nnode, size=(nelem, 3)).astype(np.int32)
    # avoid degenerate elements (repeated nodes)
    conn[:, 1] = (conn[:, 0] + 1 + conn[:, 1] % (nnode - 2)) % nnode
    conn[:, 2] = (conn[:, 1] + 1 + conn[:, 2] % (nnode - 2)) % nnode
    temperature = rng.uniform(273.0, 1600.0, size=nnode)
    conductivity = 3.3

    # --- reference formula, transcribed (Dynearthsol.py:158-179) ---
    p = np.transpose(coord[conn], (1, 2, 0))
    t = np.transpose(temperature[conn], (1, 0))
    v_arr = np.zeros((2, 3, conn.shape[0]))
    v_arr[:, :-1] = p[:-1] - p[-1]
    v_arr[:, -1] = t[:-1] - t[-1]
    nv = np.cross(v_arr[0].T, v_arr[1].T)
    v_slope = np.cross(nv, np.cross(nv, [0, 0, 1])).T
    norm = np.linalg.norm(v_slope[:-1], axis=0)
    ref_val = -1.0e3 * conductivity * v_slope[-1] / norm
    ref_flux = (v_slope[:-1] * ref_val / norm).T

    flux, mag = compute_heat_flux(coord, conn, temperature, conductivity)
    np.testing.assert_allclose(flux, ref_flux, rtol=1e-9)
    np.testing.assert_allclose(mag, np.abs(ref_val), rtol=1e-9)

    # 3D sanity: flux = -1e3*k*gradT on one reference tetrahedron with a
    # linear temperature field
    coord3 = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.array([2.0, -3.0, 5.0])
    temp3 = coord3 @ g + 100.0
    conn3 = np.array([[0, 1, 2, 3]], dtype=np.int32)
    f3, m3 = compute_heat_flux(coord3, conn3, temp3, conductivity)
    np.testing.assert_allclose(f3[0], -1e3 * conductivity * g, rtol=1e-12)
    np.testing.assert_allclose(m3[0], 1e3 * conductivity
                               * np.linalg.norm(g), rtol=1e-12)


def test_compare_harness(tmp_path):
    """The golden-run comparator (benchmarks-cores/compare.py port):
    identical runs are BIT-EXACT (exit 0), perturbed runs are flagged
    (exit 1)."""
    from dynearthsol_tpu.compare import compare_runs, main as compare_main

    # run A: 10 steps, write frame 0 and 1
    pa = small_param(tmp_path, name="runa")
    sima = des.Simulation(pa)
    outa = Output(pa)
    outa.write_exact(sima)
    sima.run_steps(10, chunk=5)
    outa.write(sima)

    # run B: identical settings
    pb = small_param(tmp_path, name="runb")
    simb = des.Simulation(pb)
    outb = Output(pb)
    outb.write_exact(simb)
    simb.run_steps(10, chunk=5)
    outb.write(simb)

    n_fail, n_nonzero = compare_runs(pa.sim.modelname, pb.sim.modelname, 1,
                                     verbose=False)
    assert n_fail == 0 and n_nonzero == 0  # deterministic: bit-exact
    assert compare_main([pa.sim.modelname, pb.sim.modelname, "1"]) == 0

    # run C: different boundary velocity -> SOMETHING WRONG
    pc = small_param(tmp_path, name="runc",
                     bc={"vbc_val_x0": -2e-9})
    simc = des.Simulation(pc)
    outc = Output(pc)
    outc.write_exact(simc)
    simc.run_steps(10, chunk=5)
    outc.write(simc)
    n_fail, _ = compare_runs(pa.sim.modelname, pc.sim.modelname, 1,
                             verbose=False)
    assert n_fail > 0
    assert compare_main([pa.sim.modelname, pc.sim.modelname, "1"]) == 1


def test_restarting_weakzone(tmp_path):
    """ic.is_restarting_weakzone (dynearthsol.cxx:386-389): the restart
    path re-creates the weak zone, OVERWRITING the checkpointed
    plstrain on the restored geometry."""
    from dynearthsol_tpu import ic as ic_mod

    p1 = small_param(tmp_path, name="wz",
                     sim={"output_step_interval": 5,
                          "checkpoint_frame_interval": 1})
    p1.ic.weakzone_option = 2
    p1.ic.weakzone_plstrain = 0.5
    sim = des.Simulation(p1)
    out = Output(p1)
    out.write_checkpoint(sim)
    out.write_exact(sim)
    sim.run_steps(5, chunk=5)
    out.write_checkpoint(sim)
    out.write(sim)

    p2 = small_param(tmp_path, name="wz",
                     sim={"output_step_interval": 5,
                          "checkpoint_frame_interval": 1,
                          "is_restarting": True,
                          "restarting_from_frame": 1})
    p2.sim.restarting_from_modelname = p2.sim.modelname
    p2.ic.weakzone_option = 2
    p2.ic.weakzone_plstrain = 0.5
    p2.ic.is_restarting_weakzone = True
    sim2, _ = restart(p2)
    expect = ic_mod.initial_weak_zone(
        p2, np.asarray(sim2.state.coord, dtype=np.float64),
        np.asarray(sim2.topo.connectivity))
    np.testing.assert_allclose(np.asarray(sim2.state.plstrain), expect,
                               rtol=0, atol=1e-12)
    # and without the flag the checkpointed plstrain survives
    p3 = small_param(tmp_path, name="wz",
                     sim={"output_step_interval": 5,
                          "checkpoint_frame_interval": 1,
                          "is_restarting": True,
                          "restarting_from_frame": 1})
    p3.sim.restarting_from_modelname = p3.sim.modelname
    p3.ic.weakzone_option = 2
    p3.ic.weakzone_plstrain = 0.5
    sim3, _ = restart(p3)
    np.testing.assert_array_equal(np.asarray(sim3.state.plstrain),
                                  np.asarray(sim.state.plstrain))
