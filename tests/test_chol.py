"""Cholesky solver core tests (reference: MatrixSolver.cpp, GP.cpp:423-461)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu.ops import chol


@pytest.fixture
def spd():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((40, 40))
    K = A @ A.T + 40 * np.eye(40)
    return K


def test_chol_solve_logdet(spd):
    K = spd
    L = chol.cholesky(jnp.asarray(K))
    assert bool(chol.chol_ok(L))
    assert float(chol.chol_logdet(L)) == pytest.approx(
        np.linalg.slogdet(K)[1], rel=1e-10)
    b = np.arange(40.0)
    x = np.asarray(chol.chol_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(K, b), rtol=1e-8)
    # matrix rhs
    B = np.arange(80.0).reshape(40, 2)
    X = np.asarray(chol.chol_solve(L, jnp.asarray(B)))
    np.testing.assert_allclose(X, np.linalg.solve(K, B), rtol=1e-8)


def test_chol_detects_non_spd():
    K = np.eye(5)
    K[3, 3] = -1.0
    L = chol.cholesky(jnp.asarray(K))
    assert not bool(chol.chol_ok(L))


def test_noise_escalation_recovers():
    """GP::_setK rescue loop (GP.cpp:431-440): noise inflated by sqrt(10)
    per round until the factorization succeeds."""
    rng = np.random.default_rng(5)
    X = rng.standard_normal((30, 2))
    # near-singular kernel matrix: duplicate points, tiny noise
    X[15:] = X[:15]
    d2 = np.sum((X[:, None] - X[None, :]) ** 2, -1)
    Kcov = np.exp(-0.5 * d2)
    log_sn = np.log(1e-12)
    L, log_sn_out, ok = chol.noise_escalated_cholesky(jnp.asarray(Kcov), log_sn)
    assert bool(ok)
    assert float(log_sn_out) > log_sn
    # steps are multiples of log(sqrt(10))
    steps = (float(log_sn_out) - log_sn) / (0.5 * np.log(10))
    assert steps == pytest.approx(round(steps), abs=1e-9)


def test_noise_escalation_from_noise_free():
    """-inf noise restarts at log(eps) (GP.cpp:433)."""
    Kcov = np.zeros((4, 4))  # rank-0: needs noise to factor
    L, log_sn_out, ok = chol.noise_escalated_cholesky(
        jnp.asarray(Kcov), -np.inf)
    assert bool(ok)
    assert np.isfinite(float(log_sn_out))


def test_noise_escalation_noop_when_spd(spd):
    log_sn = 0.0
    L, log_sn_out, ok = chol.noise_escalated_cholesky(jnp.asarray(spd), log_sn)
    assert bool(ok)
    assert float(log_sn_out) == log_sn


def test_jitter_escalation():
    """FITC/VFE jitter-doubling rescue (FITC.cpp:184-198)."""
    rng = np.random.default_rng(6)
    B = rng.standard_normal((20, 3))
    Kuu = B @ B.T - 1e-6 * np.eye(20)  # indefinite: needs jitter > 1e-6

    def factor(j):
        return (chol.cholesky(jnp.asarray(Kuu) + j * jnp.eye(20)),)

    factors, jitter, ok = chol.jitter_escalated_cholesky(factor, 1e-10)
    assert bool(ok)
    assert float(jitter) > 1e-10
    # doubling pattern
    ratio = float(jitter) / 1e-10
    assert abs(np.log2(ratio) - round(np.log2(ratio))) < 1e-9
