"""Test harness configuration.

Multi-device tests run on a virtual 8-device CPU mesh
(--xla_force_host_platform_device_count), the standard way to exercise
pjit/shard_map logic without a pod (SURVEY.md section 4).  The axon TPU
plugin prepends itself to jax_platforms, so we force the CPU backend via
config update after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# Tests run on the CPU backend with small programs: keep them OFF the
# persistent XLA compile cache.  The shared on-disk cache is written by
# TPU benches and any concurrently-running (or killed-mid-write) process;
# deserializing entries inside pytest adds a crash vector for zero
# within-process benefit (jit's in-memory cache already dedups).  A
# full-suite segfault inside backend_compile_and_load was observed with
# the shared cache enabled (2026-08-20); tests must be hermetic.
# EXCEPTION: the opt-in GP_TPU_SLOW_TESTS tier evaluates stream-scale
# (N=51200) programs whose XLA:CPU compile alone takes tens of minutes —
# those runs keep the cache (measured: the oracle pin never finished a
# 50-minute budget cold, ~18 min warm).
if not os.environ.get("GP_TPU_SLOW_TESTS"):
    os.environ["GP_TPU_COMPILE_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_DATA = "/root/reference/data"

# Test tiers (markers declared in pyproject.toml).  Smoke tier =
#   pytest -m "not dist and not golden"     (< 2 min)
# Full suite = no -m flag.  Module lists kept here so new test files are
# tiered in one place.
_DIST_MODULES = {
    "test_pchol", "test_pchol2d", "test_pgp", "test_pfit_multistart",
    "test_psparse", "test_multihost", "test_checkpoint",
    "test_watchdog_routing",
}
_GOLDEN_MODULES = {
    "test_golden", "test_golden_sparse", "test_golden_tpu_fits",
    "test_f32_training", "test_vfe_quality",
}


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process compiled-program accumulation.

    A full-suite run (~240 tests, hundreds of XLA:CPU compiles in one
    process) segfaults DETERMINISTICALLY inside backend_compile_and_load
    at ~88% (tests/test_watchdog_routing.py) — reproduced twice
    (2026-08-20), with and without the persistent compile cache, while
    every half-suite split passes.  Clearing jit caches between modules
    keeps the XLA:CPU JIT's accumulated state bounded; the recompile
    cost is small next to the crash.
    """
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _DIST_MODULES:
            item.add_marker(pytest.mark.dist)
        if mod in _GOLDEN_MODULES:
            item.add_marker(pytest.mark.golden)


@pytest.fixture(scope="session")
def toy_problem():
    """Small smooth regression problem, float64."""
    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, (60, 3))
    f = np.sin(X[:, 0]) + 0.5 * np.cos(2 * X[:, 1]) + 0.2 * X[:, 2]
    y = f + 0.05 * rng.standard_normal(60)
    Xs = rng.uniform(-3, 3, (20, 3))
    fs = np.sin(Xs[:, 0]) + 0.5 * np.cos(2 * Xs[:, 1]) + 0.2 * Xs[:, 2]
    return X, y, Xs, fs


@pytest.fixture(scope="session")
def ref_data_small():
    """First rows of the reference's bundled dataset (8000x24)."""
    from gp_tpu.utils.io import read_matrix

    X = read_matrix(os.path.join(REF_DATA, "train_x"))[:300]
    y = read_matrix(os.path.join(REF_DATA, "train_y"))[:300].ravel()
    Xs = read_matrix(os.path.join(REF_DATA, "test_x"))[:50]
    ys = read_matrix(os.path.join(REF_DATA, "test_y"))[:50].ravel()
    return X, y, Xs, ys
