"""Pluggable dense-solver strategies for the exact GP.

TPU-native re-design of the reference's MatrixSolver layer
(MatrixSolver.{h,cpp}): an abstract decomp / check / log_det / solve
strategy with two implementations —

  CHOL: LLT Cholesky (MatrixSolverLLT, MatrixSolver.cpp:6-28).  Failure
        shows as NaN in the factor (no O(N^3) eigendecomposition checks);
        the models' noise-inflation loop recovers, reproducing
        GP::_setK semantics (GP.cpp:431-440).
  QR:   Householder QR (MatrixSolverQR, MatrixSolver.cpp:31-53 uses
        column-pivoted QR; jax.numpy.qr is unpivoted — rank problems are
        instead caught by the diagonal-magnitude check below).  log|det| is
        the ABSOLUTE value, and an indefinite-but-invertible K still
        "succeeds", exactly like the reference's QR path.

The sparse models keep their Cholesky + jitter-doubling rescue (the
reference gives FITC/VFE the QR solver for robustness; jitter escalation is
the TPU-idiomatic equivalent and is already faithful to FITC.cpp:184-198 /
VFE.cpp:146-158).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .chol import chol_logdet, chol_ok, chol_solve, cholesky


class SolverSpec(NamedTuple):
    """decomp / check_SPD / log_det / solve strategy (MatrixSolver.h:3-13)."""
    name: str
    factor: Callable        # K -> factors (tuple of arrays)
    ok: Callable            # factors -> () bool
    logdet: Callable        # factors -> () log|K|
    solve: Callable         # factors, b -> K^{-1} b


CHOL = SolverSpec(
    name="chol",
    factor=lambda K: (cholesky(K),),
    ok=lambda f: chol_ok(f[0]),
    logdet=lambda f: chol_logdet(f[0]),
    solve=lambda f, b: chol_solve(f[0], b),
)


def _qr_factor(K):
    Q, R = jnp.linalg.qr(K)
    return Q, R


def _qr_ok(f):
    """Invertibility test standing in for Eigen's isInvertible
    (MatrixSolver.cpp:42-45): all |R_ii| above a relative threshold."""
    R = f[1]
    d = jnp.abs(jnp.diagonal(R))
    n = R.shape[-1]
    thresh = jnp.max(d) * n * jnp.finfo(R.dtype).eps
    return jnp.all(jnp.isfinite(d)) & jnp.all(d > thresh)


QR = SolverSpec(
    name="qr",
    factor=_qr_factor,
    ok=_qr_ok,
    # logAbsDeterminant (MatrixSolver.cpp:46-49)
    logdet=lambda f: jnp.sum(jnp.log(jnp.abs(jnp.diagonal(f[1])))),
    solve=lambda f, b: solve_triangular(f[1], f[0].T @ b, lower=False),
)


def _qrp_factor(K):
    from .qr_pivot import qr_pivot
    return qr_pivot(K)


def _qrp_ok(f):
    from .qr_pivot import qrp_ok
    return qrp_ok(f[1])


def _qrp_logdet(f):
    from .qr_pivot import qrp_logabsdet
    return qrp_logabsdet(f[1])


def _qrp_solve(f, b):
    from .qr_pivot import qrp_solve
    return qrp_solve(f[0], f[1], f[2], b)


# The reference's actual default: ColPivHouseholderQR
# (MatrixSolver.cpp:31-53; all three drivers pass QR explicitly).
# Sequential pivoting makes this latency-bound on TPU — see
# ops/qr_pivot.py for why Cholesky stays the performance default.
QR_PIVOT = SolverSpec(
    name="qr_pivot",
    factor=_qrp_factor,
    ok=_qrp_ok,
    logdet=_qrp_logdet,
    solve=_qrp_solve,
)


SOLVERS = {"chol": CHOL, "cholesky": CHOL, "qr": QR, "qr_pivot": QR_PIVOT,
           "qrp": QR_PIVOT}


def get_solver(name_or_spec) -> SolverSpec:
    """Factory mirroring GP::_specify_matrix_solver (GP.cpp:588-600)."""
    if isinstance(name_or_spec, SolverSpec):
        return name_or_spec
    try:
        return SOLVERS[str(name_or_spec).lower()]
    except KeyError:
        raise ValueError(
            f"Unknown solver {name_or_spec!r}; available: chol, qr"
        ) from None
