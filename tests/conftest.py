"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

NOTE: the environment pre-imports jax (sitecustomize) with
JAX_PLATFORMS=axon, so env vars alone are too late — we override through
jax.config, which still works because backends initialize lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the guided-sampler scan is the slowest
# compile; cache it across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


# ---------------------------------------------------------------------------
# Test tiers: `pytest -m quick` is the fast pure-math/host-logic subset
# (~5-10 min on the 1-CPU host); modules whose fixtures train a diffusion model (or run full
# planner searches) are marked `heavy` and excluded from it. The full suite
# remains the default.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_HEAVY_MODULES = {
    "test_ensemble", "test_experiments", "test_greedy_equivalence",
    "test_mesh_planner", "test_mpd", "test_multi_agent", "test_parallel",
    "test_train", "test_trial_ensemble",
}

# Sub-5-minute round-gating subset: pure math + host logic only. Modules
# that jit-compile a guided sampler loop, run datagen planners, or train
# even a tiny model are excluded (they dominate the ~13 min quick tier).
_SMOKE_MODULES = {
    "test_artifacts", "test_costs", "test_envs", "test_interp",
    "test_kinematics", "test_native_rrt", "test_normalization", "test_ops",
    "test_task",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _HEAVY_MODULES or "slow" in item.keywords:
            item.add_marker(pytest.mark.heavy)
        else:
            item.add_marker(pytest.mark.quick)
            if mod in _SMOKE_MODULES:
                item.add_marker(pytest.mark.smoke)
