"""Extra covariance families (Matern-5/2, -3/2, RQ): PSD, grads, model
fit, and parity against an INDEPENDENT NumPy-f64 closed-form oracle
(round 5: same contract discipline as the SE goldens — the implementation
below shares no code with gp_tpu.ops.kernels_extra)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu import GP, get_kernel

NAMES = ["matern52", "matern32", "rq",
         "matern52_iso", "matern32_iso", "rq_iso"]


# -- independent NumPy-f64 oracle (textbook formulas, no JAX) --------------

def _oracle_dists(X1, X2, ell):
    """Pairwise Euclidean distance of inputs scaled per-dim by 1/ell."""
    A = np.asarray(X1, np.float64) / ell
    B = np.asarray(X2, np.float64) / ell
    d2 = (np.sum(A * A, 1)[:, None] + np.sum(B * B, 1)[None, :]
          - 2.0 * A @ B.T)
    return np.sqrt(np.maximum(d2, 0.0)), np.maximum(d2, 0.0)


def oracle_k(name, hyp, X1, X2):
    """Covariance matrix from the published closed forms (RW book eq.
    4.17 / 4.16 / 4.19).  hyp follows gp_tpu packing: ARD
    [log l_1..d, log sf (, log alpha)]; iso [log l, log sf (, log alpha)].
    """
    hyp = np.asarray(hyp, np.float64)
    d = np.asarray(X1).shape[1]
    iso = name.endswith("_iso")
    nl = 1 if iso else d
    ell = np.exp(hyp[:nl]) * np.ones(d)
    sf2 = np.exp(2.0 * hyp[nl])
    r, d2 = _oracle_dists(X1, X2, ell)
    if name.startswith("matern52"):
        a = np.sqrt(5.0) * r
        return sf2 * (1.0 + a + a * a / 3.0) * np.exp(-a)
    if name.startswith("matern32"):
        a = np.sqrt(3.0) * r
        return sf2 * (1.0 + a) * np.exp(-a)
    if name.startswith("rq"):
        alpha = np.exp(hyp[nl + 1])
        return sf2 * (1.0 + d2 / (2.0 * alpha)) ** (-alpha)
    raise ValueError(name)


def oracle_nll(name, hyp, X, y):
    """Exact-GP NLL from the oracle covariance, pure NumPy f64
    (hyp = [cov hyps..., log sigma_n, mean])."""
    hyp = np.asarray(hyp, np.float64)
    n = X.shape[0]
    K = oracle_k(name, hyp[:-2], X, X) + np.exp(2.0 * hyp[-2]) * np.eye(n)
    L = np.linalg.cholesky(K)
    r = np.asarray(y, np.float64) - hyp[-1]
    w = np.linalg.solve(L, r)
    return (0.5 * w @ w + np.sum(np.log(np.diag(L)))
            + 0.5 * n * np.log(2 * np.pi))


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_k_and_nll(name, data):
    """k / diag_k / NLL vs the independent f64 closed-form oracle at
    1e-10 — including off-default hyps (anisotropic lengthscales,
    non-unit signal, alpha != 1 for RQ)."""
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    X, y, Xs, _ = data
    k = get_kernel(name)
    chyp = np.array(k.default_hyp(X, y), np.float64)
    # push the hyps off the default point so the parity is not a
    # coincidence of symmetric defaults
    nl = 1 if name.endswith("_iso") else X.shape[1]
    chyp[:nl] += np.linspace(-0.4, 0.3, nl)
    chyp[nl] += 0.2
    if name.startswith("rq"):
        chyp[nl + 1] = np.log(0.7)

    K = np.asarray(k.k(jnp.asarray(chyp), jnp.asarray(X), jnp.asarray(Xs)))
    K_o = oracle_k(name, chyp, X, Xs)
    np.testing.assert_allclose(K, K_o, rtol=1e-10, atol=1e-12)

    dk = np.asarray(k.diag_k(jnp.asarray(chyp), jnp.asarray(X)))
    np.testing.assert_allclose(dk, np.diag(oracle_k(name, chyp, X, X)),
                               rtol=1e-10)

    hyp = np.concatenate([chyp, [np.log(0.1), float(np.mean(y))]])
    f = float(exact.nll(k, jnp.asarray(hyp), jnp.asarray(X), jnp.asarray(y)))
    np.testing.assert_allclose(f, oracle_nll(name, hyp, X, y), rtol=1e-10)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    X = rng.uniform(-2, 2, (40, 3))
    y = np.sin(2 * X[:, 0]) + 0.4 * np.abs(X[:, 1]) \
        + 0.05 * rng.standard_normal(40)
    Xs = rng.uniform(-2, 2, (15, 3))
    fs = np.sin(2 * Xs[:, 0]) + 0.4 * np.abs(Xs[:, 1])
    return X, y, Xs, fs


@pytest.mark.parametrize("name", NAMES)
def test_psd_and_diag(name, data):
    X, y, _, _ = data
    k = get_kernel(name)
    chyp = jnp.asarray(k.default_hyp(X, y))
    K = np.asarray(k.k(chyp, jnp.asarray(X), jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-8 * w.max()
    np.testing.assert_allclose(np.diag(K),
                               np.asarray(k.diag_k(chyp, jnp.asarray(X))),
                               rtol=1e-10)


@pytest.mark.parametrize("name", NAMES)
def test_k_preserves_f32(name, data):
    """The covariance must NOT silently promote f32 inputs to f64: a
    strong-typed numpy scalar inside the kernel formula promotes the
    whole K, putting the TPU factorization on the emulated-f64 path —
    measured 42x slowdown for Matern at N=8000 before the round-5 fix
    (1126 ms vs 25 ms per NLL)."""
    X, y, _, _ = data
    k = get_kernel(name)
    chyp = jnp.asarray(np.asarray(k.default_hyp(X, y)), jnp.float32)
    X32 = jnp.asarray(X, jnp.float32)
    assert k.k(chyp, X32, X32).dtype == jnp.float32
    assert k.diag_k(chyp, X32).dtype == jnp.float32


@pytest.mark.parametrize("name", NAMES)
def test_hyp_gradients_finite(name, data):
    """Gradients finite everywhere incl. the r=0 diagonal (safe-sqrt)."""
    X, y, _, _ = data
    k = get_kernel(name)
    chyp = jnp.asarray(k.default_hyp(X, y))
    g = jax.grad(lambda c: jnp.sum(k.k(c, jnp.asarray(X), jnp.asarray(X))))(
        chyp)
    assert np.all(np.isfinite(np.asarray(g)))
    gx = jax.grad(lambda x1: jnp.sum(k.k(chyp, x1, jnp.asarray(X))))(
        jnp.asarray(X))
    assert np.all(np.isfinite(np.asarray(gx)))


@pytest.mark.parametrize("name", ["matern52", "rq"])
def test_gp_fit_and_gradcheck(name, data):
    X, y, Xs, fs = data
    m = GP(X, y, kernel=name)
    _, _, rel = m.check_gradients()
    assert rel < 1e-4
    nlz = m.train()
    assert np.isfinite(nlz)
    mu = m.batch_predict_y(Xs)
    rmse = float(np.sqrt(np.mean((mu - fs) ** 2)))
    assert rmse < 0.7 * float(np.std(fs))
    # BO acquisition path (input gradients) works for the new families
    y0, g0 = m.predict_y_with_grad(Xs[0])
    assert np.all(np.isfinite(g0))


@pytest.mark.parametrize("name", ["matern52", "matern32", "matern52_iso",
                                  "matern32_iso"])
def test_matern_closed_form_vjp_matches_ad(name, data):
    """The Matern custom VJP (pallas_kernels._matern_bwd_terms: E2
    quadratic expansion + saved-K g_logsf) == jax.vjp of the plain jnp
    formula, for hyp AND input cotangents."""
    from gp_tpu.ops.kernels_extra import _ard, _iso, _matern_k

    X, y, Xs, _ = data
    k = get_kernel(name)
    nu = np.sqrt(5.0) if "52" in name else np.sqrt(3.0)
    plain = (_iso if name.endswith("_iso") else _ard)(_matern_k(nu))
    chyp = jnp.asarray(np.asarray(k.default_hyp(X, y)))
    nl = 1 if name.endswith("_iso") else X.shape[1]
    chyp = chyp.at[:nl].add(jnp.linspace(-0.3, 0.2, nl))
    x1, x2 = jnp.asarray(X), jnp.asarray(Xs)
    rng = np.random.default_rng(3)
    G = jnp.asarray(rng.standard_normal((X.shape[0], Xs.shape[0])))

    K1, vjp1 = jax.vjp(lambda c, a, b: k.k(c, a, b), chyp, x1, x2)
    K0, vjp0 = jax.vjp(lambda c, a, b: plain(c, a, b), chyp, x1, x2)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K0), rtol=1e-12)
    for g1, g0 in zip(vjp1(G), vjp0(G)):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("name", ["matern52", "matern32"])
def test_matern_far_padded_objective_matches_plain(name, data):
    """Matern is far-pad eligible (round 5: exponential decay — decoy
    cross-covariances underflow like SE's): the decoy-row capacity
    objective == nll_vg_raw at non-multiple sizes."""
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    X, y, _, _ = data
    k = get_kernel(name)
    assert k.far_pad_ok
    hyp = jnp.asarray(default_hyps(k, X, y, 1e-3, False))
    hyp = hyp.at[-2].set(np.log(0.05))
    x_d, y_d = jnp.asarray(X), jnp.asarray(y)
    f0, g0 = exact.nll_vg_raw(k, hyp, x_d, y_d)
    for blk in (32, 64):
        f1, g1 = exact._nll_vg_far_padded(k, hyp, x_d, y_d, blk)
        np.testing.assert_allclose(float(f1), float(f0), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("name", ["rq", "rq_iso"])
def test_rq_closed_form_vjp_matches_ad(name, data):
    """The RQ custom VJP (pallas_kernels._rq_bwd_terms: E2 expansion +
    the extra log-alpha reduction) == jax.vjp of the plain jnp formula."""
    from gp_tpu.ops.kernels_extra import _rq_k_ard, _rq_k_iso

    X, y, Xs, _ = data
    k = get_kernel(name)
    plain = _rq_k_iso if name.endswith("_iso") else _rq_k_ard
    chyp = jnp.asarray(np.asarray(k.default_hyp(X, y)))
    nl = 1 if name.endswith("_iso") else X.shape[1]
    chyp = chyp.at[:nl].add(jnp.linspace(-0.3, 0.2, nl))
    chyp = chyp.at[nl + 1].set(np.log(0.7))      # off-default alpha
    x1, x2 = jnp.asarray(X), jnp.asarray(Xs)
    rng = np.random.default_rng(7)
    G = jnp.asarray(rng.standard_normal((X.shape[0], Xs.shape[0])))

    K1, vjp1 = jax.vjp(lambda c, a, b: k.k(c, a, b), chyp, x1, x2)
    K0, vjp0 = jax.vjp(lambda c, a, b: plain(c, a, b), chyp, x1, x2)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K0), rtol=1e-12)
    for g1, g0 in zip(vjp1(G), vjp0(G)):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-8, atol=1e-10)
