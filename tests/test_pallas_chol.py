"""Pallas base-case Cholesky (interpret mode on CPU) vs stock + VJP parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu.ops.pallas_chol import pallas_cholesky


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.mark.parametrize("n", [8, 32, 128])
def test_matches_stock(n):
    K = _spd(n, n)
    L = pallas_cholesky(K)
    np.testing.assert_allclose(np.asarray(L),
                               np.linalg.cholesky(np.asarray(K)),
                               rtol=1e-9, atol=1e-10)


def test_nan_on_indefinite():
    K = _spd(32, 3) - 80.0 * jnp.eye(32)
    assert np.min(np.linalg.eigvalsh(np.asarray(K))) < 0
    L = pallas_cholesky(K)
    assert not np.all(np.isfinite(np.asarray(L)))


def test_vjp_matches_stock_vjp():
    """The custom pullback must equal jax.vjp of jnp.linalg.cholesky."""
    K = _spd(24, 5)
    rng = np.random.default_rng(6)
    Lbar = jnp.asarray(np.tril(rng.standard_normal((24, 24))))

    _, vjp_ref = jax.vjp(jnp.linalg.cholesky, K)
    _, vjp_p = jax.vjp(pallas_cholesky, K)
    (Kbar_ref,) = vjp_ref(Lbar)
    (Kbar_p,) = vjp_p(Lbar)
    np.testing.assert_allclose(np.asarray(Kbar_p), np.asarray(Kbar_ref),
                               rtol=1e-8, atol=1e-9)


def test_grad_through_logdet():
    K0 = _spd(40, 7)

    def f(s, chol):
        L = chol(K0 * jnp.exp(s) + jnp.eye(40))
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    g_ref = jax.grad(lambda s: f(s, jnp.linalg.cholesky))(0.2)
    g_p = jax.grad(lambda s: f(s, pallas_cholesky))(0.2)
    np.testing.assert_allclose(float(g_p), float(g_ref), rtol=1e-9)


@pytest.mark.parametrize("n,w", [(64, 8), (128, 32), (128, 128), (256, 64)])
def test_panel_kernel_matches_stock(n, w):
    """Rank-w micro-panel variant == stock factor."""
    from gp_tpu.ops.pallas_chol import pallas_cholesky_panel
    K = _spd(n, n + w)
    L = pallas_cholesky_panel(K, w)
    np.testing.assert_allclose(np.asarray(L),
                               np.asarray(jnp.linalg.cholesky(K)),
                               rtol=1e-10, atol=1e-10)


def test_panel_kernel_nan_on_indefinite():
    from gp_tpu.ops.pallas_chol import pallas_cholesky_panel
    K = _spd(64, 3) - 160.0 * jnp.eye(64)
    assert np.min(np.linalg.eigvalsh(np.asarray(K))) < 0
    L = pallas_cholesky_panel(K, 16)
    assert not np.all(np.isfinite(np.asarray(L)))


def test_panel_kernel_grad():
    from gp_tpu.ops.pallas_chol import pallas_cholesky_panel
    K0 = _spd(64, 7)

    def f(s, chol):
        L = chol(K0 * jnp.exp(s) + jnp.eye(64))
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    g_ref = jax.grad(lambda s: f(s, jnp.linalg.cholesky))(0.2)
    g_p = jax.grad(lambda s: f(s, lambda K: pallas_cholesky_panel(K, 16)))(0.2)
    np.testing.assert_allclose(float(g_p), float(g_ref), rtol=1e-9)


# -- fused (L, L^{-1}) leaf (round 5: pallas_chol_inv) ----------------------

@pytest.mark.parametrize("n", [8, 32, 128])
def test_chol_inv_matches_stock(n):
    from jax.scipy.linalg import solve_triangular

    from gp_tpu.ops.pallas_chol import pallas_chol_inv

    K = _spd(n, n + 1)
    L, T = pallas_chol_inv(K)
    Lr = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(L), Lr, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(T), np.linalg.inv(Lr),
                               rtol=1e-8, atol=1e-9)


def test_chol_inv_vjp_matches_stock():
    """Combined (Lbar, Tbar) pullback vs jax.vjp of the stock pair."""
    from jax.scipy.linalg import solve_triangular

    from gp_tpu.ops.pallas_chol import pallas_chol_inv

    n = 24
    K = _spd(n, 9)
    rng = np.random.default_rng(11)
    Lbar = jnp.asarray(np.tril(rng.standard_normal((n, n))))
    Tbar = jnp.asarray(np.tril(rng.standard_normal((n, n))))

    def ref(K):
        L = jnp.linalg.cholesky(K)
        T = solve_triangular(L, jnp.eye(n, dtype=K.dtype), lower=True)
        return L, T

    _, vjp_ref = jax.vjp(ref, K)
    _, vjp_p = jax.vjp(pallas_chol_inv, K)
    np.testing.assert_allclose(np.asarray(vjp_p((Lbar, Tbar))[0]),
                               np.asarray(vjp_ref((Lbar, Tbar))[0]),
                               rtol=1e-8, atol=1e-9)


def test_chol_inv_nan_on_indefinite():
    from gp_tpu.ops.pallas_chol import pallas_chol_inv

    K = _spd(32, 3) - 80.0 * jnp.eye(32)
    L, T = pallas_chol_inv(K)
    assert not np.all(np.isfinite(np.asarray(L)))
