"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware, and keep f64 enabled."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"
# persistent compile cache: the step-scan XLA programs dominate test wall time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The container's sitecustomize registers the tunneled TPU ("axon") platform
# and prepends it to jax_platforms, overriding the env var — force CPU after
# import or every test compiles through the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
