"""Runtime environment report (runtime_info.cxx:76-176).

The reference prints CPU model / OpenMP thread count / OpenACC device at
startup; the TPU-native equivalents are the JAX backend, device kind and
count, and the compute dtype, plus the same mesh-size report."""

from __future__ import annotations

import os
import platform


def report_runtime_status() -> str:
    import jax

    lines = ["# Runtime environment:"]
    lines.append(f"#   host: {platform.node()} "
                 f"({platform.system()} {platform.machine()})")
    lines.append(f"#   python {platform.python_version()}, "
                 f"jax {jax.__version__}")
    try:
        devs = jax.devices()
        kinds = {}
        for d in devs:
            kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
        desc = ", ".join(f"{n}x {k}" for k, n in kinds.items())
        lines.append(f"#   backend: {jax.default_backend()} ({desc})")
    except Exception as e:  # no device available (e.g. driver probing)
        lines.append(f"#   backend: unavailable ({e})")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "(none)")
    lines.append(f"#   compile cache: {cache}")
    return "\n".join(lines)


def report_mesh_info(sim) -> str:
    """Mesh-size report (runtime_info.cxx:169-176)."""
    t = sim.topo
    nmk = sim.markers.n if getattr(sim, "markers", None) is not None else 0
    return (f"# mesh: {t.nnode} nodes, {t.nelem} elements, "
            f"{t.nseg} segments, {nmk} markers"
            + (f", structured grid {sim.ctx.sgrid}" if sim.ctx.sgrid
               else ""))


def write_provenance(param, argv_echo: str = "") -> str:
    """Archive run provenance next to the output, like the reference's
    ``snapshot.diff`` (Makefile:601-632 stores build flags + git commit +
    uncommitted diff next to the binary; golden-run dirs copy it).

    Writes ``<modelname>.provenance`` with the package version/commit,
    backend, and the full resolved parameter set; returns the path."""
    import dataclasses
    import os
    import subprocess
    import sys
    import time

    path = param.sim.modelname + ".provenance"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _git(*args):
        try:
            return subprocess.run(("git", "-C", repo) + args,
                                  capture_output=True, text=True,
                                  timeout=10).stdout.strip()
        except Exception:
            return ""

    lines = [
        f"# dynearthsol_tpu provenance  {time.strftime('%Y-%m-%d %H:%M:%S')}",
        f"command: {argv_echo or ' '.join(sys.argv)}",
        f"python: {sys.version.split()[0]}",
        f"git commit: {_git('rev-parse', 'HEAD') or '(not a git repo)'}",
        f"git status: {'dirty' if _git('status', '--porcelain') else 'clean'}",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__} backend={jax.default_backend()}")
    except Exception:
        pass
    lines.append("")
    lines.append("# resolved parameters")
    for sec_field in dataclasses.fields(param):
        sec = getattr(param, sec_field.name)
        if not dataclasses.is_dataclass(sec):
            continue
        lines.append(f"[{sec_field.name}]")
        for f in dataclasses.fields(sec):
            lines.append(f"{f.name} = {getattr(sec, f.name)}")
        lines.append("")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    return path
