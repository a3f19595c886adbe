"""Column-pivoted Householder QR (the reference's default solver).

`MatrixSolverQR` wraps Eigen's ColPivHouseholderQR
(/root/reference/MatrixSolver.cpp:31-53) and is the solver every reference
driver passes explicitly (mygp.cpp:24, test_fitc.cpp:35, test_vfe.cpp:36).
jnp.linalg.qr is unpivoted, so on rank-deficient K the two strategies
disagree about invertibility; this module supplies the pivoted
factorization with Eigen-compatible semantics.

Design note: column pivoting is inherently sequential (the pivot choice
depends on the previous step's downdated norms), so this runs as one
lax.fori_loop of rank-1 updates — O(N^3) with O(N) latency-bound steps,
NOT an MXU-saturating kernel.  It exists for fidelity and for genuinely
rank-deficient systems; the Cholesky path (ops/blocked.py) is the
performance solver and the library default, exactly because a jitter-
rescued Cholesky is the TPU-idiomatic answer to the same robustness
problem the reference buys with pivoting (DESIGN.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def qr_pivot(K):
    """K = Q R P^T with column pivoting.  Returns (Q, R, perm) where
    `perm` maps pivoted column position -> original column index
    (K[:, perm] = Q R)."""
    n = K.shape[0]
    dtype = K.dtype

    def body(j, state):
        R, Q, perm, cn = state
        rows = jnp.arange(n)

        # pivot: remaining column with the largest downdated norm
        masked = jnp.where(rows >= j, cn, -jnp.inf)
        p = jnp.argmax(masked)
        idx = rows.at[j].set(p).at[p].set(j)
        R = R[:, idx]
        perm = perm[idx]
        cn = cn[idx]

        # Householder reflector for column j, rows j:
        xcol = jnp.where(rows >= j, R[:, j], 0.0)
        normx = jnp.sqrt(jnp.sum(xcol * xcol))
        sgn = jnp.where(xcol[j] >= 0, 1.0, -1.0).astype(dtype)
        v = xcol.at[j].add(sgn * normx)
        vnorm2 = jnp.sum(v * v)
        # guard: zero column -> identity reflector
        scale = jnp.where(vnorm2 > 0, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0),
                          0.0)
        R = R - scale * jnp.outer(v, v @ R)
        Q = Q - scale * jnp.outer(Q @ v, v)

        # norm downdate for the remaining columns
        cn = jnp.maximum(cn - R[j, :] ** 2, 0.0)
        return R, Q, perm, cn

    R0 = K
    Q0 = jnp.eye(n, dtype=dtype)
    perm0 = jnp.arange(n)
    cn0 = jnp.sum(K * K, axis=0)
    R, Q, perm, _ = jax.lax.fori_loop(0, n, body, (R0, Q0, perm0, cn0))
    return Q, jnp.triu(R), perm


def qrp_ok(R):
    """Eigen isInvertible analog: |R_ii| above the relative threshold."""
    d = jnp.abs(jnp.diagonal(R))
    n = R.shape[-1]
    thresh = jnp.max(d) * n * jnp.finfo(R.dtype).eps
    return jnp.all(jnp.isfinite(d)) & jnp.all(d > thresh)


def qrp_logabsdet(R):
    """logAbsDeterminant (MatrixSolver.cpp:46-49); |det P| = 1."""
    return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(R))))


def qrp_solve(Q, R, perm, b):
    """Solve K x = b given K[:, perm] = Q R:  x[perm] = R^-1 Q^T b."""
    from jax.scipy.linalg import solve_triangular
    z = solve_triangular(R, Q.T @ b, lower=False)
    if b.ndim == 1:
        return jnp.zeros_like(z).at[perm].set(z)
    return jnp.zeros_like(z).at[perm, :].set(z)
