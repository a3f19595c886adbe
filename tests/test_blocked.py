"""Blocked MXU Cholesky / TRSM (ops/blocked.py) vs stock LAPACK-path ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu.ops.blocked import (add_diag, blocked_chol_solve,
                                blocked_cholesky, blocked_solve_lower,
                                blocked_solve_lower_t, spd_inv_from_chol,
                                tri_inv)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.mark.parametrize("n,block,base", [
    (512, 128, 64),      # even blocking, one recursion level
    (520, 128, 64),      # needs identity padding
    (256, 128, 128),     # block == base
    (100, 128, 64),      # smaller than base -> stock path
])
def test_blocked_cholesky(n, block, base):
    K = _spd(n, n)
    L = blocked_cholesky(K, block=block, base_block=base)
    L_ref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-9, atol=1e-9)


def test_blocked_cholesky_nan_on_indefinite():
    K = _spd(256, 1) - 600.0 * jnp.eye(256)
    assert np.min(np.linalg.eigvalsh(np.asarray(K))) < 0
    L = blocked_cholesky(K, block=128, base_block=64)
    assert not np.all(np.isfinite(np.asarray(L)))


@pytest.mark.parametrize("n,k,block", [(512, 7, 128), (300, 5, 128)])
def test_blocked_solves(n, k, block):
    K = _spd(n, 3)
    L = jnp.linalg.cholesky(K)
    B = jnp.asarray(np.random.default_rng(4).standard_normal((n, k)))
    import scipy.linalg as sla
    W_ref = sla.solve_triangular(np.asarray(L), np.asarray(B), lower=True)
    W = blocked_solve_lower(L, B, block=block)
    np.testing.assert_allclose(np.asarray(W), W_ref, rtol=1e-9, atol=1e-9)
    X_ref = np.linalg.solve(np.asarray(K), np.asarray(B))
    X = blocked_chol_solve(L, B, block=block)
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-7, atol=1e-8)
    Xt_ref = sla.solve_triangular(np.asarray(L), np.asarray(B), lower=True,
                                  trans=1)
    Xt = blocked_solve_lower_t(L, B, block=block)
    np.testing.assert_allclose(np.asarray(Xt), Xt_ref, rtol=1e-9, atol=1e-9)


def test_blocked_solve_vector_rhs():
    K = _spd(256, 5)
    L = jnp.linalg.cholesky(K)
    b = jnp.asarray(np.random.default_rng(6).standard_normal(256))
    x = blocked_chol_solve(L, b, block=128)
    assert x.shape == (256,)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(np.asarray(K), np.asarray(b)),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("n,block", [(512, 128), (520, 128), (100, 128)])
def test_spd_inv_from_chol(n, block):
    """lauum-style symmetric product == dense inverse (even + padded +
    sub-block sizes)."""
    K = _spd(n, n + 1)
    L = jnp.linalg.cholesky(K)
    Ki = spd_inv_from_chol(L, block=block, base=64)
    np.testing.assert_allclose(np.asarray(Ki), np.linalg.inv(np.asarray(K)),
                               rtol=1e-8, atol=1e-9)
    # exactly symmetric by construction (strip + strip.T writes)
    np.testing.assert_array_equal(np.asarray(Ki), np.asarray(Ki).T)


def test_zero_upper_factor_feeds_lower_triangle_readers():
    """zero_upper=False leaves K junk above the diagonal but every
    lower-triangle consumer (logdet, tri_inv, spd_inv) is unaffected."""
    K = _spd(512, 9)
    L_clean = blocked_cholesky(K, block=128, base_block=64)
    L_fast = blocked_cholesky(K, block=128, base_block=64, zero_upper=False)
    np.testing.assert_allclose(np.asarray(jnp.tril(L_fast)),
                               np.asarray(L_clean), rtol=1e-12, atol=1e-12)
    # strictly-upper junk really is present (the writes were skipped)...
    assert np.any(np.triu(np.asarray(L_fast), 1) != 0)
    # ...and invisible to the consumers in the fused objective path
    np.testing.assert_allclose(
        np.asarray(spd_inv_from_chol(L_fast, block=128, base=64)),
        np.asarray(spd_inv_from_chol(L_clean, block=128, base=64)),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(tri_inv(L_fast, base=64) * np.tri(512)),
        np.asarray(tri_inv(L_clean, base=64) * np.tri(512)),
        rtol=1e-12, atol=1e-12)


def test_triangular_matmul_helpers():
    """lt_matmul / ut_matmul == dense product at every recursion depth."""
    from gp_tpu.ops.blocked import lt_matmul, ut_matmul
    rng = np.random.default_rng(11)
    A = jnp.asarray(rng.standard_normal((96, 640)))
    T = jnp.asarray(np.tril(rng.standard_normal((640, 640))))
    for cutoff in (64, 100, 640):
        np.testing.assert_allclose(np.asarray(lt_matmul(A, T, cutoff)),
                                   np.asarray(A @ T), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ut_matmul(A, T.T, cutoff)),
                                   np.asarray(A @ T.T), rtol=1e-12,
                                   atol=1e-12)


def test_add_diag():
    K = _spd(130, 3)
    np.testing.assert_allclose(np.asarray(add_diag(K, 2.5)),
                               np.asarray(K + 2.5 * jnp.eye(130)),
                               rtol=1e-15)


def test_autodiff_through_blocked_cholesky():
    """value_and_grad through the blocked factorization == through stock."""
    K0 = _spd(320, 7)

    def nll_like(s, chol_fn):
        K = K0 * jnp.exp(s) + jnp.eye(320)
        L = chol_fn(K)
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    f1, g1 = jax.value_and_grad(
        lambda s: nll_like(s, lambda K: blocked_cholesky(K, 128, 64)))(0.3)
    f2, g2 = jax.value_and_grad(
        lambda s: nll_like(s, jnp.linalg.cholesky))(0.3)
    np.testing.assert_allclose(float(f1), float(f2), rtol=1e-10)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-8)


def test_return_diag_inv_and_tri_inv_from_diag():
    """blocked_cholesky(return_diag_inv=True) hands back the per-panel
    diagonal inverses; tri_inv_from_diag / spd_inv_from_chol(diag_inv=..)
    must match the standalone tri_inv / lauum results."""
    from gp_tpu.ops.blocked import (blocked_cholesky, spd_inv_from_chol,
                                    tri_inv, tri_inv_from_diag)

    rng = np.random.default_rng(8)
    n, blk = 512, 128
    A = rng.standard_normal((n, n))
    K = A @ A.T + n * np.eye(n)
    L, Td = blocked_cholesky(jnp.asarray(K), block=blk, base_block=64,
                             zero_upper=False, return_diag_inv=True)
    assert Td.shape == (n // blk, blk, blk)
    Lref = np.linalg.cholesky(K)
    for k in range(n // blk):
        s = slice(k * blk, (k + 1) * blk)
        np.testing.assert_allclose(np.asarray(Td[k]),
                                   np.linalg.inv(Lref[s, s]),
                                   rtol=1e-9, atol=1e-9)
    T = tri_inv_from_diag(L, Td, blk)
    np.testing.assert_allclose(np.asarray(T), np.linalg.inv(Lref),
                               rtol=1e-8, atol=1e-9)
    Kinv = spd_inv_from_chol(L, block=blk, diag_inv=Td)
    np.testing.assert_allclose(np.asarray(Kinv), np.linalg.inv(K),
                               rtol=1e-8, atol=1e-9)
    # stock fallback (block % base != 0) reports no panel structure
    L2, Td2 = blocked_cholesky(jnp.asarray(K), block=128, base_block=96,
                               return_diag_inv=True)
    assert Td2 is None
