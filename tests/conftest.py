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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_DATA = "/root/reference/data"


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
