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

import pytest  # noqa: E402

# Smoke tier: `pytest -m smoke -q` must finish < 5 min COLD on the 1-vCPU
# host (no warm .jax_cache).  Membership is by module: fast host-side and
# small-jit suites only — anything that triggers Pallas interpret-mode
# compiles, Monte-Carlo oracles, flagship-shaped programs, or end-to-end
# pipelines stays in the default tier.
SMOKE_MODULES = {
    "test_anchors",
    "test_boxes",
    "test_checkpoint",
    "test_config",
    "test_dataset",
    "test_gt_sampling",
    "test_losses",
    "test_metrics",
    "test_metrics_ref_parity",
    "test_nms",
    "test_prepare_data",
    "test_voxelize",
    "test_xgb_infer",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = os.path.splitext(os.path.basename(str(item.fspath)))[0]
        if module in SMOKE_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
