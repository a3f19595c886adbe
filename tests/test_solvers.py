"""MatrixSolver strategies (ops/solvers.py): Cholesky vs QR parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu import GP
from gp_tpu.ops.solvers import CHOL, QR, get_solver


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.mark.parametrize("solver", [CHOL, QR], ids=["chol", "qr"])
def test_solver_primitives(solver):
    K = _spd(40)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(40))
    f = solver.factor(K)
    assert bool(solver.ok(f))
    _, ld_ref = np.linalg.slogdet(np.asarray(K))
    np.testing.assert_allclose(float(solver.logdet(f)), ld_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(solver.solve(f, b)),
                               np.linalg.solve(np.asarray(K), np.asarray(b)),
                               rtol=1e-8, atol=1e-10)


def test_qr_tolerates_indefinite():
    """The reference's QR path computes log|det| on indefinite matrices
    (MatrixSolver.cpp:46-49) where Cholesky fails — reproduce both."""
    K = _spd(24, 2) - 40.0 * jnp.eye(24)
    assert np.min(np.linalg.eigvalsh(np.asarray(K))) < 0
    f = QR.factor(K)
    assert bool(QR.ok(f))
    assert np.isfinite(float(QR.logdet(f)))
    fc = CHOL.factor(K)
    assert not bool(CHOL.ok(fc))


def test_gp_qr_matches_chol(toy_problem):
    X, y, Xs, _ = toy_problem
    g1 = GP(X, y, solver="chol")
    g2 = GP(X, y, solver="qr")
    n1, n2 = g1.train(), g2.train()
    np.testing.assert_allclose(n1, n2, rtol=1e-6)
    mu1, s21 = g1.batch_predict(Xs)
    mu2, s22 = g2.batch_predict(Xs)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-6)
    np.testing.assert_allclose(s21, s22, rtol=1e-4, atol=1e-8)
    s2g1 = g1.batch_predict_s2_with_grad(Xs[:2])
    s2g2 = g2.batch_predict_s2_with_grad(Xs[:2])
    np.testing.assert_allclose(s2g1[1], s2g2[1], rtol=1e-4, atol=1e-7)


def test_get_solver():
    assert get_solver("qr") is QR
    assert get_solver("cholesky") is CHOL
    assert get_solver(CHOL) is CHOL
    with pytest.raises(ValueError):
        get_solver("lu")
