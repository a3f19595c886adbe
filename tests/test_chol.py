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


def _dup_problem():
    """Near-singular kernel matrix: duplicated points, tiny noise."""
    rng = np.random.default_rng(5)
    X = rng.standard_normal((30, 2))
    X[15:] = X[:15]
    y = np.sin(X[:, 0])
    return jnp.asarray(X), jnp.asarray(y)


def test_noise_escalation_recovers():
    """GP::_setK rescue loop (GP.cpp:431-440) on the PRODUCTION path
    (exact.set_k): noise inflated by sqrt(10) per round until SPD."""
    from gp_tpu import SE_ARD
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    x, y = _dup_problem()
    hyp = default_hyps(SE_ARD, x, y, 1e-3, False)
    log_sn = np.log(1e-12)
    hyp[-2] = log_sn
    hyp_out, f, invKys, ok = exact.set_k(SE_ARD, jnp.asarray(hyp), x, y)
    assert np.all(np.isfinite(np.asarray(invKys)))
    assert float(hyp_out[-2]) > log_sn
    steps = (float(hyp_out[-2]) - log_sn) / (0.5 * np.log(10))
    assert steps == pytest.approx(round(steps), abs=1e-6)


def test_noise_escalation_from_noise_free():
    """-inf noise restarts at log(eps) (GP.cpp:433), production path."""
    from gp_tpu import SE_ARD
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    x, y = _dup_problem()
    hyp = default_hyps(SE_ARD, x, y, 1e-3, True)   # noise-free: log_sn=-inf
    hyp_out, f, invKys, ok = exact.set_k(SE_ARD, jnp.asarray(hyp), x, y)
    assert np.isfinite(float(hyp_out[-2]))
    assert np.all(np.isfinite(np.asarray(invKys)))


def test_noise_escalation_noop_when_spd(spd):
    """Well-conditioned K: set_k must not touch the noise level."""
    from gp_tpu import SE_ARD
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(-2, 2, (25, 2)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    hyp = default_hyps(SE_ARD, x, y, 1e-3, False)
    hyp_out, _, _, _ = exact.set_k(SE_ARD, jnp.asarray(hyp), x, y)
    assert float(hyp_out[-2]) == pytest.approx(hyp[-2], abs=1e-12)


def test_jitter_escalation():
    """FITC jitter-doubling rescue (FITC.cpp:184-198), production path."""
    from gp_tpu import SE_ARD
    from gp_tpu.models import fitc
    from gp_tpu.models.base import default_hyps

    x, y = _dup_problem()
    u = x                                  # duplicated inducing: needs jitter
    hyp = default_hyps(SE_ARD, x, y, 1e-3, False)
    hyp[-2] = np.log(1e-10)
    j0 = 1e-12
    Luu, LA, alpha, jitter, ok = fitc.set_k(
        SE_ARD, jnp.asarray(hyp), x, y, u, jnp.asarray(j0))
    assert bool(ok)
    assert float(jitter) > j0
    ratio = float(jitter) / j0
    assert abs(np.log2(ratio) - round(np.log2(ratio))) < 1e-6
