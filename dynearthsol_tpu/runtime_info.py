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
