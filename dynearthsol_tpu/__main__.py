"""CLI driver: ``python -m dynearthsol_tpu model.cfg``.

Mirrors the reference's main/time-loop (dynearthsol.cxx:573-1002): init or
restart, frame-0 output, the step loop with output/checkpoint scheduling,
periodic quality checks with remeshing, progress lines, and the end-of-run
timing summary (Execute/Compute/Output splits and s/step).

TPU-native difference: steps run in jitted ``lax.scan`` chunks; the host
wakes only at scheduling boundaries (the reference pays per-step kernel
launches instead, SURVEY §3.2).
"""

from __future__ import annotations

import sys
import time as _time

import numpy as np

from . import load_config
from .constants import YEAR2SEC
from .earthquake import (EarthquakeState, handle_ats_output,
                         update_earthquake_tracking)
from .io import Output, restart
from .monitor import Monitor
from .simulation import Simulation

INT_MAX = 2**31 - 1


class HaloStepper:
    """Multi-chip stepping for the CLI driver (SURVEY §2.3/§5.8).

    Wraps parallel.halo_step: nodal state lives sharded ~1/N (+halo
    windows) across a 1-D ``jax.sharding.Mesh``; the per-step halo
    exchange rides ``ppermute`` over ICI.  The driver's host events
    (output, checkpoints, quality checks, remeshing) need the flat
    host state, so ``sync()`` gathers at event boundaries only — the
    same wake cadence as single-chip chunking.  After a remesh the
    shapes change: ``rebuild()`` re-plans the partition, re-builds the
    shard_map runner and re-shards the fresh state (gather -> remesh on
    host -> re-shard choreography; the reference has no counterpart)."""

    def __init__(self, sim, n_devices: int | None = None):
        import jax
        import numpy as _np
        from jax.sharding import Mesh

        from .parallel.halo_step import AXIS

        devs = jax.devices()
        if n_devices is not None:
            devs = devs[:n_devices]
        self.sim = sim
        self.mesh = Mesh(_np.asarray(devs), (AXIS,))
        self._dirty = False
        self._build()

    def _build(self):
        from .parallel.halo_step import make_halo_runner

        (self._ctx_sh, self._state_sh, self._run_chunk, self._plan,
         self._specs) = make_halo_runner(self.sim, self.mesh)

    def run_steps(self, n: int, chunk: int | None = None):
        chunk = chunk or min(n, self.sim.param.sim.scan_chunk_steps
                             or 100)
        done = 0
        while done < n:
            c = min(chunk, n - done)
            self._state_sh = self._run_chunk(self._ctx_sh,
                                             self._state_sh, c)
            done += c
        self._dirty = True
        self.sync()

    def sync(self):
        """Gather the sharded state back to the flat host layout in
        sim.state (no-op when already in sync)."""
        if not self._dirty:
            return
        import jax
        import jax.numpy as jnp

        from .parallel.halo_step import unpack_state

        out = unpack_state(jax.device_get(self._state_sh), self._specs,
                           self._plan, self.sim.state)
        self.sim.state = jax.tree.map(jnp.asarray, out)
        self._dirty = False

    def rebuild(self):
        """Re-plan + re-shard after a topology change (remesh)."""
        self._build()
        self._dirty = False


def _make_stepper(sim):
    """CLI multi-chip opt-in: DES_N_DEVICES=N (or 'all') selects the
    node-sharded halo step across the first N jax devices."""
    import os

    nd = os.environ.get("DES_N_DEVICES")
    if not nd:
        return None
    import jax

    n = jax.device_count() if nd == "all" else int(nd)
    if n <= 1:
        return None
    try:
        stepper = HaloStepper(sim, n)
    except (NotImplementedError, ValueError) as e:
        print(f"Warning: multi-chip halo step unavailable ({e}); "
              "running single-device.")
        return None
    print(f"Multi-chip: node-sharded halo step on {n} devices.")
    return stepper


def _next_event_step(sim, next_regular_frame, starting_step, mon=None):
    """Smallest future step at which the host must wake: output frame,
    quality check, monitor row, earthquake-tracking tick, or info display
    (dynearthsol.cxx:879-951)."""
    p = sim.param
    steps = int(sim.state.steps)
    candidates = [steps + (p.mesh.quality_check_step_interval
                           - steps % p.mesh.quality_check_step_interval
                           or p.mesh.quality_check_step_interval)]
    if p.sim.output_step_interval != INT_MAX:
        target = starting_step + next_regular_frame * p.sim.output_step_interval
        if target > steps:
            candidates.append(target)
    if mon is not None and mon.enabled:
        candidates.append(max(mon.next_step, steps + 1))
    if p.control.use_global_velocity_scaling:
        # earthquake tracking cadence bounds event-detection latency
        candidates.append(steps + p.sim.earthquake_output_step_interval)
    if p.mat.nmat > 1 and p.mat.phase_change_option != 0:
        candidates.append(steps + 10)  # dynearthsol.cxx:861-871 cadence
    if p.control.surface_process_option == 11 \
            and getattr(sim, "gospl", None) is not None:
        candidates.append(steps + sim.gospl.steps_to_next_coupling())
    elif p.control.surface_process_option == 101:
        # the reference calls the custom hook every step (bc.cxx case 101)
        candidates.append(steps + 1)
    candidates.append(p.sim.max_steps)
    return max(min(candidates), steps + 1)


def run(param, argv_echo: str = ""):
    t_start = _time.monotonic_ns()
    p = param

    # per-phase device profiling (SURVEY §5.1: the reference's NVTX
    # ranges map to jax.profiler traces + the named_scope annotations in
    # ops/geometry.py, ops/fields.py).  Set DES_PROFILE_DIR to capture a
    # TensorBoard-readable trace of the whole run.
    prof_dir = __import__("os").environ.get("DES_PROFILE_DIR")
    if prof_dir:
        import jax

        jax.profiler.start_trace(prof_dir)

    if p.sim.is_restarting:
        sim, start_frame = restart(p)
        out = Output(p, start_frame=start_frame + 1, start_time_ns=t_start)
        starting_step = int(sim.state.steps)
        starting_time = float(sim.state.time)
        print(f"Restarted from frame {start_frame} "
              f"(step {starting_step}).")
    else:
        sim = Simulation(p)
        out = Output(p, start_frame=0, start_time_ns=t_start)
        starting_step = 0
        starting_time = 0.0
        # optional isostasy pre-relaxation (dynearthsol.cxx:616-619)
        if p.ic.isostasy_adjustment_time_in_yr > 0:
            n = sim.isostasy_adjustment()
            print(f"Adjusted isostasy for {n} steps.")
        # optional PT gravity pre-relaxation (dynearthsol.cxx:731-739)
        if p.ic.has_body_force_adjustment:
            if not p.control.has_PT:
                print("Warning: ic.has_body_force_adjustment needs "
                      "control.has_PT; skipping (dynearthsol.cxx:736 "
                      "'Only works with PT loop').")
            else:
                n = sim.body_force_adjustment()
                print(f"Adjusted initial body force for {n} PT "
                      "iterations.")
        if p.sim.has_initial_checkpoint:
            out.write_checkpoint(sim)
        out.write_exact(sim)

    from .runtime_info import (report_mesh_info, report_runtime_status,
                               write_provenance)
    try:
        write_provenance(p, argv_echo)
    except OSError:
        pass

    print(report_runtime_status())
    print(report_mesh_info(sim))

    mon = Monitor(p, sim)
    stepper = _make_stepper(sim)
    mon.write_if_due(sim)  # row at the starting step (monitor_initialize)
    eq = EarthquakeState.init(p)

    # GoSPL landscape-evolution coupling (surface_process_option 11,
    # dynearthsol.cxx:632-709 init; bc.cxx:1104-1256 per-event exchange)
    if p.control.surface_process_option == 11 \
            and getattr(sim, "gospl", None) is None:
        from .gospl_driver import GoSPLDriver
        try:
            sim.gospl = GoSPLDriver(p)
            import os as _os

            import numpy as _np
            top = _np.asarray(sim.ctx.surf.top_nodes)
            coord0 = _np.asarray(sim.state.coord)
            # generate gospl_mesh.npz over the padded/perturbed DES
            # surface extent unless one already exists (restart reuse,
            # dynearthsol.cxx:648-681); the yml config can point GoSPL
            # at this file
            mesh_file = "gospl_mesh.npz"
            if not _os.path.exists(mesh_file):
                from .gospl_driver import generate_gospl_mesh
                xs = coord0[top, 0]
                ys = (coord0[top, 1] if p.sim.ndims == 3
                      else _np.zeros_like(xs))
                gp, gc = generate_gospl_mesh(
                    xs, ys, p.control.gospl_mesh_resolution,
                    p.control.gospl_mesh_perturbation,
                    p.control.gospl_mesh_padding)
                _np.savez(mesh_file,
                          v=_np.column_stack(
                              [gp, _np.zeros(len(gp))]),
                          c=gc, z=_np.zeros(len(gp)))
            sim.gospl.initialize(p.control.surface_process_gospl_config_file,
                                 coord0[top, :-1], coord0[top, -1])
        except ImportError as e:
            print(f"Error: {e}", file=sys.stderr)
            sys.exit(1)

    next_regular_frame = 1
    last_phase_time = starting_time
    last_wake_step, last_wake_time = starting_step, starting_time
    max_time = p.sim.max_time_in_yr * YEAR2SEC
    t_compute_ns = 0
    t_output_ns = 0
    t_remesh_ns = 0
    n_remesh = 0
    nsteps0 = int(sim.state.steps)

    while (int(sim.state.steps) < p.sim.max_steps
           and float(sim.state.time) <= max_time):
        target = _next_event_step(sim, next_regular_frame, starting_step,
                                  mon)
        n = target - int(sim.state.steps)
        t0 = _time.monotonic_ns()
        if stepper is not None:
            stepper.run_steps(n)
        else:
            sim.run_steps(n)
        import jax
        jax.block_until_ready(sim.state.coord)
        t_compute_ns += _time.monotonic_ns() - t0

        steps = int(sim.state.steps)
        now = float(sim.state.time)

        # fatal-dt contract (geometry.cxx:912-917): emergency frame + exit 11
        dt_now = float(sim.state.dt)
        if not (dt_now > 0.0):
            print(f"Error: dt <= 0!  dt={dt_now} at step {steps}",
                  file=sys.stderr)
            out.write_exact(sim)
            sys.exit(11)

        # externally-driven surface processes at host boundaries:
        # GoSPL coupling (option 11, bc.cxx:1104-1256) and the custom
        # hook (option 101, bc.cxx case 101)
        if p.control.surface_process_option == 11 \
                and getattr(sim, "gospl", None) is not None:
            if sim.gospl.should_couple_elapsed(steps - last_wake_step,
                                               now - last_wake_time):
                coord_h = np.asarray(sim.state.coord)
                vel_h = np.asarray(sim.state.vel)
                top = np.asarray(sim.ctx.surf.top_nodes)
                dh_top = sim.gospl.run_and_get_erosion(
                    coord_h[top, :-1], coord_h[top, -1], vel_h[top])
                sim.apply_host_surface_dh(dh_top)
        elif p.control.surface_process_option == 101:
            from .hooks import get_custom_surface_process
            hook = get_custom_surface_process()
            if hook is not None:
                dh_top = hook(sim, now - last_wake_time)
                if dh_top is not None:
                    sim.apply_host_surface_dh(dh_top)
        # terrigenous/hemipelagic deposition report every 10000 steps
        # (bc.cxx:1446,1491,1811: is_reporting_terrigenous_info)
        if (p.control.is_reporting_terrigenous_info
                and p.control.surface_process_option in (1, 102)
                and steps // 10000 > last_wake_step // 10000):
            dh_acc = np.asarray(sim.state.dhacc)
            print(f"  surface deposition: max accumulated dh "
                  f"{dh_acc.max():.3e} m, min {dh_acc.min():.3e} m "
                  f"(step {steps})")
        last_wake_step, last_wake_time = steps, now

        mon.write_if_due(sim)
        update_earthquake_tracking(p, sim, eq)

        # marker phase changes + hydrous transport (dynearthsol.cxx:861-871)
        if p.mat.nmat > 1 and p.mat.phase_change_option != 0:
            from .phasechanges import advect_hydrous_markers, phase_changes
            phase_changes(sim)
            if p.control.has_hydration_processes:
                advect_hydrous_markers(sim, now - last_phase_time)
                last_phase_time = now

        if p.control.use_global_velocity_scaling:
            # adaptive (earthquake-triggered) output scheduling
            t0 = _time.monotonic_ns()
            next_regular_frame = handle_ats_output(
                p, sim, out, eq, starting_time, starting_step,
                next_regular_frame)
            t_output_ns += _time.monotonic_ns() - t0
            step_due = time_due = False
            avg_ok = True
        else:
            step_due = None

        # output scheduling (dynearthsol.cxx:887-911)
        if step_due is None:
            step_due = (p.sim.output_step_interval != INT_MAX and
                        (steps - starting_step) == next_regular_frame
                        * p.sim.output_step_interval)
            time_due = (p.sim.output_time_interval_in_yr != float("inf")
                        and (now - starting_time) > next_regular_frame
                        * p.sim.output_time_interval_in_yr * YEAR2SEC)
            avg_ok = (not p.sim.is_outputting_averaged_fields
                      or steps % p.mesh.quality_check_step_interval == 0)
        if (step_due or time_due) and avg_ok:
            t0 = _time.monotonic_ns()
            if next_regular_frame % p.sim.checkpoint_frame_interval == 0:
                out.write_checkpoint(sim)
            out.write(sim)
            t_output_ns += _time.monotonic_ns() - t0
            next_regular_frame += 1
            sim.reference_frame_time = (
                starting_time + next_regular_frame
                * p.sim.output_time_interval_in_yr * YEAR2SEC)

        # sediment marker bookkeeping at quality-check cadence
        # (bc.cxx:1795-1812)
        if (p.control.surface_process_option != 0
                and steps % p.mesh.quality_check_step_interval == 0):
            sim.sync_surface_markers()

        # quality check + remeshing (dynearthsol.cxx:914-934)
        min_quality = 1.0
        if (steps % p.mesh.quality_check_step_interval == 0
                and p.control.has_moving_mesh):
            from .remeshing import bad_mesh_quality, remesh
            bad, min_quality = bad_mesh_quality(sim)
            if bad:
                t0 = _time.monotonic_ns()
                if p.sim.has_output_during_remeshing:
                    out.write_exact(sim)
                mon.before_remesh(sim)
                remesh(sim, bad)
                if stepper is not None:
                    # gather happened before the quality check; the new
                    # topology needs a fresh partition + re-shard
                    stepper.rebuild()
                mon.rebind(sim)
                if getattr(sim, "gospl", None) is not None:
                    sim.gospl.on_remesh()  # dynearthsol.cxx:632-709
                if p.sim.has_output_during_remeshing:
                    out.write_exact(sim)
                t_remesh_ns += _time.monotonic_ns() - t0
                n_remesh += 1

        # progress line (dynearthsol.cxx:936-950)
        if steps >= sim.info_display_next_step:
            wt = (_time.monotonic_ns() - t_start) * 1e-9
            q = f", min_q = {min_quality:.4f}" if min_quality < 1.0 else ""
            print(f"              Step = {steps}, time = "
                  f"{now / YEAR2SEC:.5e} yr, vmax = "
                  f"{float(sim.state.max_global_vel_mag):.3e} m/s{q}, "
                  f"wt = {wt:.1f} s")
            sim.info_display_next_step = (
                steps + p.sim.info_display_step_interval)

    mon.finalize()

    # final timing summary (dynearthsol.cxx:963-1002)
    t_total = (_time.monotonic_ns() - t_start) * 1e-9
    nsteps = int(sim.state.steps) - nsteps0
    print(f"Execute:  {t_total:.2f} s")
    if nsteps:
        print(f"Compute:  {t_compute_ns * 1e-9:.2f} s / {nsteps} steps = "
              f"{t_compute_ns * 1e-9 / nsteps:.3e} s/step")
    print(f"Output:   {t_output_ns * 1e-9:.2f} s")
    if n_remesh:
        print(f"Remesh:   {t_remesh_ns * 1e-9:.2f} s / {n_remesh} = "
              f"{t_remesh_ns * 1e-9 / n_remesh:.2f} s/remesh")
    else:
        print(f"Remesh:   {t_remesh_ns * 1e-9:.2f} s")
    if prof_dir:
        import jax

        jax.profiler.stop_trace()
        print(f"Profile:  trace written to {prof_dir}")
    return sim


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1 or argv[0] in ("-h", "--help"):
        print("usage: python -m dynearthsol_tpu <model.cfg>")
        return 0 if argv and argv[0] in ("-h", "--help") else 1
    param = load_config(argv[0])
    run(param)
    return 0


if __name__ == "__main__":
    sys.exit(main())
