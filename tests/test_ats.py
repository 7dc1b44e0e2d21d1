"""Behavioral gates for the adaptive output scheduler
(ats_output_scheduler.cxx:11-78 semantics): earthquake-triggered frames,
regular-frame dedup, catch-up frame accounting, averaged-fields gating,
and checkpoint cadence — checked against a recording fake Output so the
WRITE SEQUENCE itself is the assertion, not just a smoke run."""

from types import SimpleNamespace

import dynearthsol_tpu as des
from dynearthsol_tpu.constants import YEAR2SEC
from dynearthsol_tpu.earthquake import EarthquakeState, handle_ats_output

INT_MAX = 2**31 - 1


def mk_param(**sim_over):
    p = des.param_from_dict({
        "sim": {"ndims": 2, "output_step_interval": 10,
                "checkpoint_frame_interval": 3,
                "is_outputting_averaged_fields": False},
        "mesh": {"meshing_option": 1, "meshing_elem_shape": 1,
                 "xlength": 1.0, "ylength": 0.0, "zlength": 1.0,
                 "resolution": 1.0, "quality_check_step_interval": 5},
    })
    for k, v in sim_over.items():
        setattr(p.sim, k, v)
    return p


class FakeOutput:
    def __init__(self):
        self.frames = []       # steps at which write() ran
        self.checkpoints = []  # steps at which write_checkpoint() ran

    def write(self, sim):
        self.frames.append(int(sim.state.steps))

    def write_checkpoint(self, sim):
        self.checkpoints.append(int(sim.state.steps))


def fake_sim(steps, time=None):
    return SimpleNamespace(state=SimpleNamespace(
        steps=steps, time=steps * 1.0 if time is None else time))


def drive(param, eq_state, step_list, start_step=0):
    out = FakeOutput()
    nrf = 1
    for s in step_list:
        nrf = handle_ats_output(param, fake_sim(s), out, eq_state,
                                0.0, start_step, nrf)
    return out, nrf


def test_regular_cadence_and_catchup():
    p = mk_param()
    eq = EarthquakeState.init(p)
    # visit every step 1..30: frames exactly at 10, 20, 30
    out, nrf = drive(p, eq, list(range(1, 31)))
    assert out.frames == [10, 20, 30]
    assert nrf == 4
    # jump PAST several intervals in one call: ONE frame, counter
    # catches up to frames_due+1 instead of bursting (catch-up logic,
    # ats_output_scheduler.cxx:62-77)
    eq = EarthquakeState.init(p)
    out, nrf = drive(p, eq, [47])
    assert out.frames == [47]
    assert nrf == 5  # 47//10 = 4 frames due -> next is 5


def test_earthquake_frames_and_regular_dedup():
    p = mk_param(earthquake_output_step_interval=2)
    eq = EarthquakeState.init(p)
    eq.in_earthquake_mode = True
    eq.last_output_step = 0
    out = FakeOutput()
    nrf = 1
    for s in range(1, 11):
        # allow_earthquake_output is normally set by the tracker; emulate
        # its step-interval rule (earthquake_state.cxx last_output gap)
        eq.allow_earthquake_output = (s - eq.last_output_step) >= 2
        nrf = handle_ats_output(p, fake_sim(s), out, eq, 0.0, 0, nrf)
    # earthquake frames every 2 steps; step 10 is ALSO a regular frame
    # but must not be written twice (dedup: regular frame satisfied by
    # the earthquake frame at the same step)
    assert out.frames == [2, 4, 6, 8, 10]
    assert nrf == 2


def test_averaged_fields_gate():
    # averaged-fields mode only writes on quality-check multiples
    p = mk_param(is_outputting_averaged_fields=True)
    eq = EarthquakeState.init(p)
    out, _ = drive(p, eq, list(range(1, 13)))
    # regular frame due at 10, and 10 % qcsi(5) == 0 -> allowed
    assert out.frames == [10]
    eq = EarthquakeState.init(p)
    p2 = mk_param(is_outputting_averaged_fields=True,
                  output_step_interval=4)
    # frames due at 4, 8, 12 but only multiples of 5 are allowed ->
    # 4 and 8 are suppressed until an allowed step arrives (5 and 10)
    out, _ = drive(p2, eq, list(range(1, 13)))
    assert out.frames == [5, 10]


def test_time_interval_schedule():
    p = mk_param(output_step_interval=INT_MAX)
    p.sim.output_time_interval_in_yr = 2.0
    eq = EarthquakeState.init(p)
    out = FakeOutput()
    nrf = 1
    for s in range(1, 8):
        nrf = handle_ats_output(p, fake_sim(s, time=s * YEAR2SEC),
                                out, eq, 0.0, 0, nrf)
    assert out.frames == [2, 4, 6]


def test_checkpoint_frame_cadence():
    p = mk_param()  # checkpoint_frame_interval = 3
    eq = EarthquakeState.init(p)
    out, _ = drive(p, eq, list(range(1, 61)))
    # frames at 10..60 (nrf 1..6); checkpoints when nrf % 3 == 0,
    # i.e. at the 3rd and 6th frames
    assert out.frames == [10, 20, 30, 40, 50, 60]
    assert out.checkpoints == [30, 60]
