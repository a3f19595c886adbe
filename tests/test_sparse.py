"""FITC / VFE tests: NLL parity vs independent NumPy implementations of the
Snelson-Ghahramani and Titsias objectives, gradient self-checks mirroring
FITC::test_obj / VFE::test_obj, and training/prediction behavior."""

import numpy as np
import pytest

from gp_tpu import FITC, GP, VFE


def np_seard_k(chyp, x1, x2):
    d = x1.shape[1]
    ell = np.exp(chyp[:d])
    sf2 = np.exp(2 * chyp[d])
    diff = (x1[:, None, :] - x2[None, :, :]) / ell
    return sf2 * np.exp(-0.5 * np.sum(diff**2, axis=-1))


def np_fitc_nll(hyp, x, y, u, jitter):
    """Independent FITC NLL (FITC.cpp:201-227)."""
    n, m = x.shape[0], u.shape[0]
    sn2 = np.exp(2 * hyp[-2])
    sf2 = np.exp(2 * hyp[-3])
    r = y - hyp[-1]
    Kuu = np_seard_k(hyp[:-2], u, u) + jitter * np.eye(m)
    Kxu = np_seard_k(hyp[:-2], x, u)
    Q = Kxu @ np.linalg.solve(Kuu, Kxu.T)
    gamma = (sn2 + sf2 - np.diag(Q)) / sn2
    A = sn2 * Kuu + (Kxu.T / gamma) @ Kxu
    t1 = Kxu.T @ (r / gamma)
    fit = (r / gamma) @ (r - Kxu @ np.linalg.solve(A, t1)) / sn2
    _, ldA = np.linalg.slogdet(A)
    _, ldU = np.linalg.slogdet(Kuu)
    comp = ldA - ldU + np.sum(np.log(gamma)) + (n - m) * np.log(sn2)
    return 0.5 * (fit + comp + n * np.log(2 * np.pi))


def np_vfe_nll(hyp, x, y, u, jitter):
    """Independent VFE NLL (VFE.cpp:161-189)."""
    n, m = x.shape[0], u.shape[0]
    sn2 = np.exp(2 * hyp[-2])
    sf2 = np.exp(2 * hyp[-3])
    r = y - hyp[-1]
    Kuu = np_seard_k(hyp[:-2], u, u) + jitter * np.eye(m)
    Kxu = np_seard_k(hyp[:-2], x, u)
    Kuxxu = Kxu.T @ Kxu
    A = sn2 * Kuu + Kuxxu
    alpha = (r - Kxu @ np.linalg.solve(A, Kxu.T @ r)) / sn2
    _, ldA = np.linalg.slogdet(A)
    _, ldU = np.linalg.slogdet(Kuu)
    f0 = 0.5 * n * np.log(2 * np.pi)
    comp = 0.5 * (ldA - ldU + (n - m) * np.log(sn2))
    fitv = 0.5 * r @ alpha
    trace = 0.5 * (n * sf2 - np.trace(np.linalg.solve(Kuu, Kuxxu))) / sn2
    return f0 + comp + fitv + trace


@pytest.fixture(scope="module")
def sparse_problem():
    rng = np.random.default_rng(42)
    X = rng.uniform(-3, 3, (120, 2))
    f = np.sin(X[:, 0]) * np.cos(X[:, 1])
    y = f + 0.05 * rng.standard_normal(120)
    U = X[rng.choice(120, 25, replace=False)]
    Xs = rng.uniform(-3, 3, (30, 2))
    fs = np.sin(Xs[:, 0]) * np.cos(Xs[:, 1])
    return X, y, U, Xs, fs


HYP = np.array([0.3, -0.1, 0.2, -2.3, 0.1])  # d=2 SEard + noise + mean


def test_fitc_nll_matches_numpy(sparse_problem):
    X, y, U, _, _ = sparse_problem
    m = FITC(X, y)
    m.set_inducing(U)
    ours = m.nll(HYP)
    golden = np_fitc_nll(HYP, X, y, U, m._jitter_u)
    assert ours == pytest.approx(golden, rel=1e-9)


def test_vfe_nll_matches_numpy(sparse_problem):
    X, y, U, _, _ = sparse_problem
    m = VFE(X, y)
    m.set_inducing(U)
    ours = m.nll(HYP)
    golden = np_vfe_nll(HYP, X, y, U, m._jitter_u)
    assert ours == pytest.approx(golden, rel=1e-9)


def test_fitc_test_obj_gradient(sparse_problem):
    """FITC::test_obj (FITC.cpp:324-352): analytic vs central differences."""
    X, y, U, _, _ = sparse_problem
    m = FITC(X, y)
    m.set_inducing(U)
    v, g, fd = m.test_obj(HYP, eps=1e-5)
    assert np.isfinite(v)
    np.testing.assert_allclose(g, fd, rtol=1e-4, atol=1e-6)


def test_vfe_test_obj_gradient(sparse_problem):
    X, y, U, _, _ = sparse_problem
    m = VFE(X, y)
    m.set_inducing(U)
    v, g, fd = m.test_obj(HYP, eps=1e-6)
    assert np.isfinite(v)
    np.testing.assert_allclose(g, fd, rtol=1e-3, atol=1e-5)


def test_fitc_defaults_to_full_inducing(sparse_problem):
    X, y, _, _, _ = sparse_problem
    m = FITC(X, y)
    assert m.num_inducing == 120  # FITC.cpp:12-13
    m.set_inducing(X[:10])
    assert m.num_inducing == 10


def test_fitc_jitter_value():
    """_jitter_u = (0.1 * noise_lb)^2 at train start (FITC.cpp:27-31)."""
    X = np.random.default_rng(0).uniform(-1, 1, (20, 2))
    y = X[:, 0]
    m = FITC(X, y)
    assert m._jitter_u == pytest.approx((0.1 * 1e-3) ** 2)
    m.set_noise_lower_bound(0.01)
    m._reset_jitter()
    assert m._jitter_u == pytest.approx(1e-6)


def test_fitc_single_start_matches_scipy(sparse_problem):
    """Plain train() must do at least as well as scipy L-BFGS-B from the
    same start on the identical objective.  (train() optimizes in the
    internally standardized space, which conditions the problem better —
    it may land in a strictly deeper optimum than raw-space scipy.)"""
    import jax.numpy as jnp
    from scipy.optimize import minimize
    from gp_tpu.models import fitc as F

    X, y, U, _, _ = sparse_problem
    m = FITC(X, y)
    m.set_inducing(U)
    nlz = m.train()

    m2 = FITC(X, y)
    m2.set_inducing(U)
    m2._reset_jitter()
    lb, ub = m2.hyp_bounds()
    v0 = np.clip(m2.get_default_hyps(), lb, ub)

    def fg(v):
        f_, g_ = F.objective_vg(m2.kernel, False, jnp.asarray(v), m2._x,
                                m2._y, m2._u, jnp.asarray(m2._jitter_u))
        return float(f_), np.asarray(g_)

    r = minimize(fg, v0, jac=True, method="L-BFGS-B",
                 bounds=list(zip(lb, ub)), options={"maxiter": 400})
    assert nlz <= r.fun + 1e-3


def test_fitc_train_predict(sparse_problem):
    X, y, U, Xs, fs = sparse_problem
    m = FITC(X, y)
    m.set_inducing(U)
    nlz = m.train_multistart(8)
    assert np.isfinite(nlz)
    mu, s2 = m.batch_predict(Xs)
    rmse = np.sqrt(np.mean((mu - fs) ** 2))
    assert rmse < 0.25
    sn2 = np.exp(2 * m.get_hyp()[-2])
    assert (s2 >= sn2 - 1e-12).all()  # FITC s2 floor is sn2 (FITC.cpp:117)
    # split paths consistent
    np.testing.assert_allclose(m.batch_predict_y(Xs), mu, rtol=1e-10)
    np.testing.assert_allclose(m.batch_predict_s2(Xs), s2, rtol=1e-10)


def test_vfe_train_predict(sparse_problem):
    X, y, U, Xs, fs = sparse_problem
    m = VFE(X, y)
    m.set_inducing(U)
    nlz = m.train_multistart(8)
    assert np.isfinite(nlz)
    mu, s2 = m.batch_predict(Xs)
    rmse = np.sqrt(np.mean((mu - fs) ** 2))
    assert rmse < 0.25
    assert (s2 >= 0).all()  # VFE s2 floor is 0, no sn2 (VFE.cpp:130)


def test_exact_multistart(sparse_problem):
    """train_multistart on the exact GP reaches at least the single-start
    optimum."""
    X, y, _, _, _ = sparse_problem
    g1 = GP(X, y)
    n1 = g1.train()
    g2 = GP(X, y)
    n2 = g2.train_multistart(4)
    assert n2 <= n1 + 1e-6


def test_sparse_close_to_exact_when_inducing_is_full(sparse_problem):
    """With U = X and tiny jitter, FITC/VFE NLL equals the exact GP NLL."""
    X, y, _, _, _ = sparse_problem
    g = GP(X, y)
    f = FITC(X, y)   # inducing defaults to X
    v = VFE(X, y)
    exact_v = g.nll(HYP)
    assert f.nll(HYP) == pytest.approx(exact_v, rel=1e-4)
    assert v.nll(HYP) == pytest.approx(exact_v, rel=1e-4)


def test_sparse_refuses_noise_free(sparse_problem):
    X, y, U, _, _ = sparse_problem
    for cls in (FITC, VFE):
        m = cls(X, y)
        m.set_inducing(U)
        m.set_noise_free(True)
        with pytest.warns(UserWarning, match="can't be noise free"):
            nlz = m.train()
        assert not m.noise_free
        assert np.isfinite(nlz)


def test_fitc_prediction_gradients_fd(sparse_problem):
    X, y, U, Xs, _ = sparse_problem
    m = FITC(X, y)
    m.set_inducing(U)
    m.train_multistart(4)
    xs = Xs[0]
    eps = 1e-6
    _, gy = m.predict_y_with_grad(xs)
    _, gs2 = m.predict_s2_with_grad(xs)
    for i in range(2):
        e = np.zeros(2); e[i] = eps
        fd_y = (m.predict_y(xs + e) - m.predict_y(xs - e)) / (2 * eps)
        fd_s2 = (m.predict_s2(xs + e) - m.predict_s2(xs - e)) / (2 * eps)
        assert gy[i] == pytest.approx(fd_y, rel=1e-4, abs=1e-7)
        assert gs2[i] == pytest.approx(fd_s2, rel=1e-3, abs=1e-7)


def test_vfe_prediction_gradients_fd(sparse_problem):
    X, y, U, Xs, _ = sparse_problem
    m = VFE(X, y)
    m.set_inducing(U)
    m.train_multistart(4)
    xs = Xs[1]
    eps = 1e-6
    _, gy = m.predict_y_with_grad(xs)
    _, gs2 = m.predict_s2_with_grad(xs)
    for i in range(2):
        e = np.zeros(2); e[i] = eps
        fd_y = (m.predict_y(xs + e) - m.predict_y(xs - e)) / (2 * eps)
        fd_s2 = (m.predict_s2(xs + e) - m.predict_s2(xs - e)) / (2 * eps)
        assert gy[i] == pytest.approx(fd_y, rel=1e-4, abs=1e-7)
        assert gs2[i] == pytest.approx(fd_s2, rel=1e-3, abs=1e-7)


def test_fitc_scales_vs_exact_formulaically(sparse_problem):
    """FITC beats exact-GP complexity: alpha has M entries, prediction never
    touches N (structure check, not a perf test)."""
    X, y, U, _, _ = sparse_problem
    m = FITC(X, y)
    m.set_inducing(U)
    m.train_multistart(4)
    _, _, alpha = m._post
    assert alpha.shape == (25,)


def test_sparse_hosted_opt_routing(monkeypatch, toy_problem):
    """Past the watchdog work threshold the sparse fit must run through
    the host-driven optimizer (one device program per evaluation) — the
    monolithic jitted fit CRASHED the TPU worker at N=102400 M=512 —
    and reach the same optimum on a small problem."""
    X, y, Xs, _ = toy_problem
    from gp_tpu import FITC

    a = FITC(X, y)
    a.set_inducing(X[-20:])
    nll_a = a.train()

    b = FITC(X, y)
    b.set_inducing(X[-20:])
    monkeypatch.setattr(type(b), "_use_hosted_opt", lambda self: True)
    nll_b = b.train()
    np.testing.assert_allclose(nll_b, nll_a, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b.batch_predict_y(Xs)),
                               np.asarray(a.batch_predict_y(Xs)),
                               rtol=1e-4, atol=1e-6)


def test_nm_envelope_guard(sparse_problem, monkeypatch):
    """The (N, M) HBM-envelope guard (models/sparse.check_nm_envelope)
    must fail LOUD at the wrapper before a too-big sparse fit OOMs
    mid-train, and must scale its budget by the device count on the
    distributed path."""
    from gp_tpu.models import sparse as sparse_mod

    X, y, U, _, _ = sparse_problem
    m = FITC(X, y)
    m.set_inducing(U)

    # shrink the budget below this problem's estimated footprint
    est = (sparse_mod.SPARSE_PANEL_FACTOR * m.num_train * m.num_inducing
           * np.dtype(np.float64).itemsize)
    monkeypatch.setenv("GP_TPU_HBM_BYTES", str(est // 2))
    with pytest.raises(ValueError, match="HBM budget"):
        m.train()
    with pytest.raises(ValueError, match="HBM budget"):
        m.train_multistart(2)
    # enough devices divide the per-device footprint under the budget
    sparse_mod.check_nm_envelope(m.num_train, m.num_inducing, 8, n_dev=4)

    # with the real budget the same fit proceeds
    monkeypatch.delenv("GP_TPU_HBM_BYTES")
    assert np.isfinite(m.train())
