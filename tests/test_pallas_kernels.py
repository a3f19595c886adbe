"""Fused Pallas SE kernels vs the XLA formulas (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gp_tpu.ops.pallas_kernels as pk
from gp_tpu import get_kernel, SE_ARD, SE_ISO
from gp_tpu.ops.sdist import sqdist


@pytest.fixture(autouse=True)
def force_pallas_path(monkeypatch):
    """Small test sizes must still exercise the Pallas (interpret) path."""
    monkeypatch.setattr(pk, "_MIN_ROWS", 1)


def _ref_k(inv_l, sf2, x1, x2):
    return sf2 * jnp.exp(-0.5 * sqdist(x1 * inv_l, x2 * inv_l))


@pytest.mark.parametrize("m,n,d", [(70, 130, 5), (8, 8, 1), (257, 64, 24)])
def test_se_matrix_matches_xla(m, n, d):
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((m, d)))
    x2 = jnp.asarray(rng.standard_normal((n, d)))
    inv_l = jnp.asarray(np.exp(rng.uniform(-1, 1, d)))
    K = pk.se_matrix(inv_l, 2.5, x1, x2, interpret=True)
    K_ref = _ref_k(inv_l, 2.5, x1, x2)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("which", ["ard", "iso"])
def test_custom_vjp_matches_autodiff(which):
    rng = np.random.default_rng(1)
    m, n, d = 20, 15, 4
    x1 = jnp.asarray(rng.standard_normal((m, d)))
    x2 = jnp.asarray(rng.standard_normal((n, d)))
    W = jnp.asarray(rng.standard_normal((m, n)))

    if which == "ard":
        chyp = jnp.asarray(rng.uniform(-1, 1, d + 1))
        f_pallas = lambda c, a, b: jnp.sum(W * pk.seard_k_pallas(c, a, b))
        f_ref = lambda c, a, b: jnp.sum(W * SE_ARD.k(c, a, b))
    else:
        chyp = jnp.asarray(rng.uniform(-1, 1, 2))
        f_pallas = lambda c, a, b: jnp.sum(W * pk.seiso_k_pallas(c, a, b))
        f_ref = lambda c, a, b: jnp.sum(W * SE_ISO.k(c, a, b))

    g = jax.grad(f_pallas, argnums=(0, 1, 2))(chyp, x1, x2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(chyp, x1, x2)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_registered_variants():
    k = get_kernel("se_ard_pallas")
    assert k.num_hyp(7) == 8
    k2 = get_kernel("se_iso_pallas")
    assert k2.num_hyp(7) == 2


def test_gp_trains_with_pallas_kernel(toy_problem):
    """End-to-end: model fit through the custom-vjp Pallas covariance equals
    the stock XLA covariance fit."""
    from gp_tpu import GP
    X, y, Xs, _ = toy_problem
    g1 = GP(X, y, kernel="se_ard")
    g2 = GP(X, y, kernel="se_ard_pallas")
    n1, n2 = g1.train(), g2.train()
    np.testing.assert_allclose(n1, n2, rtol=1e-7)
    mu1, s21 = g1.batch_predict(Xs)
    mu2, s22 = g2.batch_predict(Xs)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-6)
    np.testing.assert_allclose(s21, s22, rtol=1e-5, atol=1e-9)
    # input-gradient path (vmapped per-point custom-vjp)
    y1, gy1 = g1.batch_predict_y_with_grad(Xs[:3])
    y2, gy2 = g2.batch_predict_y_with_grad(Xs[:3])
    np.testing.assert_allclose(gy1, gy2, rtol=1e-5, atol=1e-8)
