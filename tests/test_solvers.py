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
    # two INDEPENDENT 160-eval fits: agreement is basin-level, not
    # bitwise — gradient summation-order changes legitimately move the
    # optimizer path by ~1e-8 absolute (atol guards near-zero means)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-5, atol=1e-7)
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


def test_qr_pivot_matches_lapack():
    """Pivot order, reconstruction, solve, and rank detection vs scipy's
    dgeqp3 — the reference's actual solver (MatrixSolver.cpp:31-53)."""
    import jax.numpy as jnp
    import scipy.linalg as sla
    from gp_tpu.ops.qr_pivot import qr_pivot, qrp_ok, qrp_solve

    rng = np.random.default_rng(1)
    K = rng.standard_normal((50, 50))
    Q, R, perm = (np.asarray(a) for a in qr_pivot(jnp.asarray(K)))
    assert np.abs(K[:, perm] - Q @ R).max() < 1e-10
    _, _, ps = sla.qr(K, pivoting=True)
    assert np.array_equal(perm, ps)
    b = rng.standard_normal(50)
    x = np.asarray(qrp_solve(jnp.asarray(Q), jnp.asarray(R),
                             jnp.asarray(perm), jnp.asarray(b)))
    assert np.abs(K @ x - b).max() < 1e-9
    # rank-2 matrix: pivoted QR must report not-ok (unpivoted can miss)
    u, v = rng.standard_normal((2, 50))
    Kd = np.outer(u, u) + np.outer(v, v)
    _, R2, _ = qr_pivot(jnp.asarray(Kd))
    assert not bool(qrp_ok(R2))


def test_gp_with_qr_pivot_solver(toy_problem):
    X, y, Xs, _ = toy_problem
    g1 = GP(X, y, solver="chol")
    g2 = GP(X, y, solver="qr_pivot")
    n1, n2 = g1.train(), g2.train()
    np.testing.assert_allclose(n1, n2, rtol=1e-6)
    mu1, _ = g1.batch_predict(Xs)
    mu2, _ = g2.batch_predict(Xs)
    # independent fits: basin-level agreement (see test_gp_qr_matches_chol)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-5, atol=1e-7)


def test_qr_stream_scale_guard(monkeypatch):
    """A non-chol solver at stream scale whose dense build exceeds the
    HBM budget must raise loudly at trace time instead of silently
    entering the dense two-buffer K build (the measured-OOM shape on one
    chip) — and a raised GP_TPU_HBM_BYTES re-enables it on backends
    where the dense build fits (ADVICE round 4)."""
    from gp_tpu import SE_ARD
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps, to_opt_vec

    monkeypatch.setattr(exact, "_STREAM_MIN_N", 32)
    monkeypatch.setenv("GP_TPU_HBM_BYTES", "1024")  # force the gate shut
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((48, 3)))
    y = jnp.sin(X[:, 0])
    hyp = jnp.asarray(default_hyps(SE_ARD, X, y, 1e-3, False))
    with pytest.raises(NotImplementedError, match="use the 'chol' solver"):
        exact.nll_raw(SE_ARD, hyp, X, y, solver=QR)
    with pytest.raises(NotImplementedError, match="use the 'chol' solver"):
        exact.objective_vg(SE_ARD, False, to_opt_vec(hyp, False), X, y,
                           solver=QR)
    # the chol strategy still routes (streamed) and stays finite
    v = exact.nll_raw(SE_ARD, hyp, X, y, solver=CHOL)
    assert np.isfinite(float(v))
    # env override: with a budget that fits the dense build, QR past the
    # N threshold runs (and agrees with chol)
    monkeypatch.setenv("GP_TPU_HBM_BYTES", str(64 * 2 ** 30))
    v_qr = exact.nll_raw(SE_ARD, hyp, X, y, solver=QR)
    np.testing.assert_allclose(float(v_qr), float(v), rtol=1e-10)
