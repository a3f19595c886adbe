"""Cholesky solver core.

TPU-native replacement for the reference's MatrixSolver strategy layer
(MatrixSolver.{h,cpp}).  The reference offers LLT-Cholesky and col-pivoted
QR backends plus a triple-redundant O(N^3) SPD check (GP.cpp:445-461:
eigendecomposition + inverse residual + solver flag).  On TPU the idiomatic
equivalent is: factor with jnp.linalg.cholesky, detect failure as NaN in the
factor's diagonal, and recover with jitter/noise escalation inside
lax.while_loop (SURVEY.md section 3.5).  The escalation loops themselves
live with their models (exact.set_k, fitc.set_k, vfe.set_k,
parallel/pgp.pset_k, parallel/psparse) because each rebuilds different
intermediate quantities per retry.

On a device mesh the factorization is replaced by the distributed blocked
Cholesky in gp_tpu.parallel.pchol; this module is the single-device path and
the shared solve/logdet helpers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

# minimum size at which the MXU-blocked routines (ops/blocked.py) beat the
# stock XLA fori-loop factorization on TPU
_BLOCKED_MIN_N = 2048


def _use_blocked(n: int) -> bool:
    return n >= _BLOCKED_MIN_N and jax.default_backend() == "tpu"


def cholesky(K):
    """Lower Cholesky factor; rows from the first failing pivot are NaN.

    Large factorizations on TPU route to the blocked MXU implementation
    (ops/blocked.py) — same semantics, ~1.4-2x faster forward and much
    cheaper under autodiff (the backward pass becomes blocked matmuls)."""
    if K.ndim == 2 and _use_blocked(K.shape[-1]):
        from .blocked import blocked_cholesky
        return blocked_cholesky(K)
    return jnp.linalg.cholesky(K)


def chol_ok(L):
    """SPD test: the factor diagonal is finite and strictly positive.

    Replaces MatrixSolverLLT::check_SPD + GP::_check_SPD's eigen/inverse
    checks with the O(N) NaN probe.
    """
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(d) & (d > 0), axis=-1)


def chol_logdet(L):
    """log|K| = 2 sum log diag(L)  (MatrixSolver.cpp:21-24)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def chol_solve(L, b):
    """Solve K x = b given K = L L^T."""
    if L.ndim == 2 and _use_blocked(L.shape[-1]):
        from .blocked import blocked_chol_solve
        return blocked_chol_solve(L, b)
    z = solve_triangular(L, b, lower=True)
    return solve_triangular(L, z, lower=True, trans=1)


def solve_lower(L, b):
    """Solve L z = b (forward substitution)."""
    if L.ndim == 2 and _use_blocked(L.shape[-1]):
        from .blocked import blocked_solve_lower
        return blocked_solve_lower(L, b)
    return solve_triangular(L, b, lower=True)
