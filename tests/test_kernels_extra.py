"""Extra covariance families (Matern-5/2, -3/2, RQ): PSD, grads, model fit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu import GP, get_kernel

NAMES = ["matern52", "matern32", "rq",
         "matern52_iso", "matern32_iso", "rq_iso"]


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
