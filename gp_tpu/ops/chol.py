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


def _block_for(n: int) -> int:
    """Panel width scaling with N: the blocked routines Python-unroll
    n/block steps, and program size (remote-compile cost/limits) grows
    with the step count — keep it <=~25 at any N.  Perf A/B at N<=16384
    prefers 1024 (BASELINE.md)."""
    if n <= 24576:
        return 1024
    if n <= 65536:
        return 2048
    return 4096


def _is_slabs(L) -> bool:
    """Factors past the int32 single-buffer limit are slab tuples
    (ops/slabbed.py); every helper below dispatches on the type."""
    return isinstance(L, (tuple, list))


def cholesky(K, zero_upper: bool = True):
    """Lower Cholesky factor; rows from the first failing pivot are NaN.

    Large factorizations on TPU route to the blocked MXU implementation
    (ops/blocked.py) — same semantics, ~1.4-2x faster forward and much
    cheaper under autodiff (the backward pass becomes blocked matmuls).
    A slab-tuple K (ops/slabbed.py) factors slab-in-place.

    zero_upper=False (blocked TPU path only) leaves K leftovers in the
    strictly-upper triangle, skipping N^2/2 HBM writes — safe when the
    factor only feeds lower-triangle readers (see blocked_cholesky)."""
    if _is_slabs(K):
        from .slabbed import slabbed_cholesky
        return slabbed_cholesky(K)
    if K.ndim == 2 and _use_blocked(K.shape[-1]):
        from .blocked import blocked_cholesky
        return blocked_cholesky(K, block=_block_for(K.shape[-1]),
                                zero_upper=zero_upper)
    return jnp.linalg.cholesky(K)


def chol_ok(L):
    """SPD test: the factor diagonal is finite and strictly positive.

    Replaces MatrixSolverLLT::check_SPD + GP::_check_SPD's eigen/inverse
    checks with the O(N) NaN probe.
    """
    if _is_slabs(L):
        from .slabbed import slabbed_diagonal
        d = slabbed_diagonal(L)
        return jnp.all(jnp.isfinite(d) & (d > 0))
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(d) & (d > 0), axis=-1)


def chol_logdet(L):
    """log|K| = 2 sum log diag(L)  (MatrixSolver.cpp:21-24)."""
    if _is_slabs(L):
        from .slabbed import slabbed_logdet
        return slabbed_logdet(L)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def chol_solve(L, b):
    """Solve K x = b given K = L L^T."""
    if _is_slabs(L):
        from .slabbed import slabbed_chol_solve
        return slabbed_chol_solve(L, b)
    if L.ndim == 2 and _use_blocked(L.shape[-1]):
        from .blocked import blocked_chol_solve
        return blocked_chol_solve(L, b, block=_block_for(L.shape[-1]))
    z = solve_triangular(L, b, lower=True)
    return solve_triangular(L, z, lower=True, trans=1)


def solve_lower(L, b):
    """Solve L z = b (forward substitution)."""
    if _is_slabs(L):
        from .slabbed import slabbed_solve_lower
        return slabbed_solve_lower(L, b)
    if L.ndim == 2 and _use_blocked(L.shape[-1]):
        from .blocked import blocked_solve_lower
        return blocked_solve_lower(L, b, block=_block_for(L.shape[-1]))
    return solve_triangular(L, b, lower=True)
