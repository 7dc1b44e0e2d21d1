"""DynEarthSol-TPU: a TPU-native (JAX/XLA/Pallas) Lagrangian explicit
finite-element framework for long-term lithospheric deformation.

Re-designed from scratch for TPU hardware with the capabilities of
GeoFLAC/DynEarthSol (reference: DynEarthSol3D / DES3D).  The compute path is
pure JAX (jit + lax.scan + segment_sum assembly + Pallas kernels); mesh
generation, remeshing and I/O run on the host.

The reference code is float64 end-to-end; we enable x64 so the f64 oracle
path is available everywhere (CPU tests, TPU correctness runs).  Production
TPU runs can select float32 via ``sim.float_dtype = float32`` in the config.
"""

import os

# Enable f64 before any jax.numpy import.  Must happen at package import.
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)

from .config import Param, load_config, param_from_dict  # noqa: E402
from .simulation import Simulation  # noqa: E402

__version__ = "0.1.0"

__all__ = ["Param", "load_config", "param_from_dict", "Simulation", "__version__"]
