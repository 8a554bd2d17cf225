"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests (the TPU answer to multi-node testing) run on a
virtual 8-device CPU mesh via XLA's host platform device count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the interpret-mode Pallas parity tests lower
# to ~10k-op graphs whose cold CPU compile costs minutes; warm runs are
# seconds.  (The cache helps the CPU backend only — axon remote compile
# bypasses it, CLAUDE.md.)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
