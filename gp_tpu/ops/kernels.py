"""Covariance kernels as pure JAX functions.

Replaces the reference's Cov class hierarchy (Cov/Cov.h:13-27, CovSEard.cpp,
CovSEiso.cpp).  Hyperparameter packing is IDENTICAL to the reference so fitted
vectors compare one-to-one:

  se_ard: chyp = [log l_1 .. log l_d, log sigma_f]   (CovSEard.cpp:6)
  se_iso: chyp = [log l, log sigma_f]                (CovSEiso.cpp:5)

The reference's hand-written dk_dhyp / dk_dx1 / diag_* derivative methods are
NOT reimplemented: jax.grad / jax.jacfwd of `k` supplies every derivative the
models need (SURVEY.md section 7, step 2).

Data layout is TPU-first: points are ROWS, x has shape (n, d) — the transpose
of the reference's dim-by-N Eigen layout.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import DBL_EPS, DBL_MAX, DBL_MIN
from .sdist import sqdist


class KernelSpec(NamedTuple):
    """A covariance function bundle (pure functions, no state)."""
    name: str
    num_hyp: Callable[[int], int]            # dim -> number of cov hyps
    k: Callable                              # (chyp, x1, x2) -> (n1, n2)
    diag_k: Callable                         # (chyp, x) -> (n,)
    default_hyp: Callable                    # (x, y) -> np (num_hyp,)
    hyp_range: Callable                      # (x, y) -> (np lb, np ub)
    # index (into chyp) of the log-output-scale hyp (log sigma_f for the SE
    # family).  Used by the internal y-standardization reparameterization:
    # scaling y by 1/s shifts this hyp and log sigma_n by -log s.
    out_scale_idx: int = -1
    # (chyp, sn2, x, n_real) -> (n, n): K(X, X) with the diagonal set to
    # diag_k + sn2 on rows < n_real and to diag_k on rows >= n_real (the
    # far-pad decoys).  Differentiable in (chyp, sn2).  The default builds
    # K then scatters the diagonal; the Pallas SE variants override with a
    # single-pass fused build (any post-hoc diagonal op on an opaque
    # custom-call output costs a full N^2 pass — measured 2.3 ms at
    # N=8192 f32, ~9% of the whole objective).
    k_noise: Callable | None = None
    # (chyp, sn2, x, n_real, K, Kinv, alpha) -> (g_chyp, g_sn2_cot):
    # the k_noise vjp contracted against the IMPLICIT cotangent
    # Q = Kinv - alpha alpha^T with the decoy diagonal zeroed — the exact-GP
    # gradient's contraction (GP.cpp:151-163) — without materializing Q
    # (an N^2 write + re-reads).  None -> callers materialize Q and use
    # jax.vjp of k_noise.
    k_noise_vjp_q: Callable | None = None
    # covariance decays fast enough that cross-terms to the far-pad decoy
    # rows (models/exact._nll_vg_far_padded: scaled squared distance
    # >= ~2e4) UNDERFLOW TO EXACT ZERO in the compute dtype — true for
    # exponential-decay families (SE: exp(-1e4); Matern: exp(-sqrt(3)
    # *141) = e^-244, both below the f32 exp cutoff ~-103), FALSE for
    # polynomial decay (RQ never underflows).  Gates the decoy-row
    # capacity objective.
    far_pad_ok: bool = False


def _generic_k_noise(spec_k, spec_diag_k):
    def k_noise(chyp, sn2, x, n_real: int):
        K0 = spec_k(chyp, x, x)
        ids = jnp.arange(x.shape[0])
        dv = jnp.where(ids < n_real, jnp.diagonal(K0) + sn2,
                       spec_diag_k(chyp, x))
        return K0.at[ids, ids].set(dv.astype(K0.dtype))
    return k_noise


def get_k_noise(spec: "KernelSpec") -> Callable:
    """spec.k_noise, or the generic build+scatter for kernels that did not
    register a fused variant (e.g. ops/kernels_extra.py)."""
    if spec.k_noise is not None:
        return spec.k_noise
    return _generic_k_noise(spec.k, spec.diag_k)


def _se_noise_vjp_q(ard: bool):
    """Structured k_noise vjp for the SE family (see KernelSpec field).

    The exact-GP gradient contracts dK/dtheta against
    Q = Kinv - alpha alpha^T (decoy diagonal zeroed).  Writing
    E = Q o K = (Kinv o K) - (alpha alpha^T o K), every needed reduction
    is a column of E @ [a | 1] (a = x/l, dk/dlog l_i = k (a_i-b_i)^2
    expanded via row/col sums), and the rank-1 part contracts WITHOUT an
    N^2 intermediate:  (alpha alpha^T o K) @ R = alpha o (K @ (alpha o R)).
    So the whole hyp gradient costs two skinny GEMMs reading Kinv and K
    ONCE each — no Q buffer (N^2 write + consumer re-reads; the Q fusion
    alone measured 1.6 ms at N=8192 f32 on v5e) and no dead dx terms.

    Exact-zero bookkeeping for the far-pad decoys (models/exact.
    _nll_vg_far_padded): decoy alpha entries and K cross-blocks are exact
    zeros by construction, so masking the decoy rows of `a` (O(n_pad d))
    and summing row sums over the real slice reproduces the zeroed-decoy-
    diagonal cotangent EXACTLY — no catastrophic a^2-scale cancellation
    (decoy |a| ~ 1e8 never multiplies a nonzero residual).
    """

    def vjp_q(chyp, sn2, x, n_real: int, K, Kinv, alpha):
        n, d = x.shape
        inv_l = jnp.exp(-chyp[:d]) if ard else jnp.exp(-chyp[0])
        a = x * inv_l
        if n_real < n:
            a = a.at[n_real:].set(0.0)
        rhs = jnp.concatenate([a, jnp.ones((n, 1), a.dtype)], axis=1)
        M = (Kinv * K) @ rhs - alpha[:, None] * (K @ (alpha[:, None] * rhs))
        rs = M[:, d]                       # row sums of E (decoy rows: diag only)
        per_dim = 2.0 * (jnp.einsum("ri,r->i", a * a, rs)
                         - jnp.sum(a * M[:, :d], axis=0))
        tr_r = (jnp.sum(jnp.diagonal(Kinv)[:n_real])
                - jnp.dot(alpha[:n_real], alpha[:n_real]))
        # dk/dlog sf = 2 k0; E uses K (noise diag): 2 sum E - 2 sn2 tr_r.
        # Decoy rows' only nonzero is their (zeroed-cotangent) diagonal,
        # so the real-slice row-sum total IS the zeroed-diag sum.
        g_logsf = 2.0 * jnp.sum(rs[:n_real]) - 2.0 * sn2 * tr_r
        if ard:
            g_chyp = jnp.concatenate([per_dim, g_logsf[None]])
        else:
            g_chyp = jnp.stack([jnp.sum(per_dim), g_logsf])
        return g_chyp.astype(chyp.dtype), tr_r

    return vjp_q


# --------------------------------------------------------------------------
# SE-ARD: k(x,z) = sf^2 exp(-1/2 sum_i (x_i-z_i)^2 / l_i^2)   (CovSEard.cpp:7-11)
# --------------------------------------------------------------------------

def _seard_k(chyp, x1, x2):
    d = x1.shape[-1]
    inv_l = jnp.exp(-chyp[:d])
    sf2 = jnp.exp(2.0 * chyp[d])
    return sf2 * jnp.exp(-0.5 * sqdist(x1 * inv_l, x2 * inv_l))


def _seard_diag_k(chyp, x):
    d = x.shape[-1]
    sf2 = jnp.exp(2.0 * chyp[d])
    return jnp.full((x.shape[0],), sf2, dtype=x.dtype)


def _seard_default_hyp(x, y):
    """log l_i = log std(x_i), log sf = log std(y)  (CovSEard.cpp:72-79)."""
    x = np.asarray(x)
    y = np.asarray(y).ravel()
    hyp = np.empty(x.shape[1] + 1)
    with np.errstate(divide="ignore"):  # constant column/target -> -inf
        hyp[:-1] = np.log(np.std(x, axis=0, ddof=1))
        hyp[-1] = np.log(np.std(y, ddof=1))
    return hyp


def _lscale_bounds_per_dim(x):
    """Per-dimension length-scale box from the data span (CovSEard.cpp:46-66).

    lb: exp(-0.5 (0.05 span / l)^2) must stay above 1.5*DBL_MIN;
    ub: min( l^2 < 0.05*DBL_MAX , exp(-0.5 span^2/l^2) > 1 - 1e-4 ).
    """
    x = np.asarray(x)
    span = x.max(axis=0) - x.min(axis=0)
    thres = 1e-4
    with np.errstate(divide="ignore"):
        lb = np.log(0.05 * span) - 0.5 * np.log(-2.0 * np.log(1.5 * DBL_MIN))
        ub1 = 0.5 * np.log(0.05 * DBL_MAX)
        ub2 = np.log(span / np.sqrt(-2.0 * np.log(1.0 - thres)))
    ub = np.minimum(ub1, ub2)
    return lb, ub


def _seard_hyp_range(x, y):
    x = np.asarray(x)
    y = np.asarray(y).ravel()
    d = x.shape[1]
    lb = np.full(d + 1, -np.inf)
    ub = np.full(d + 1, 0.5 * np.log(0.5 * DBL_MAX))
    lb[:d], ub[:d] = _lscale_bounds_per_dim(x)
    yrange = y.max() - y.min()
    lb[d] = np.log(max(DBL_EPS, DBL_EPS * yrange))        # CovSEard.cpp:68
    ub[d] = np.log(max(10 * DBL_EPS, 10 * yrange))        # CovSEard.cpp:69
    return lb, ub


SE_ARD = KernelSpec(
    name="se_ard",
    num_hyp=lambda dim: dim + 1,
    k=_seard_k,
    diag_k=_seard_diag_k,
    default_hyp=_seard_default_hyp,
    hyp_range=_seard_hyp_range,
    k_noise=_generic_k_noise(_seard_k, _seard_diag_k),
    k_noise_vjp_q=_se_noise_vjp_q(True),
    far_pad_ok=True,
)


# --------------------------------------------------------------------------
# SE-iso: k(x,z) = sf^2 exp(-1/2 |x-z|^2 / l^2)   (CovSEiso.cpp:6-11)
# --------------------------------------------------------------------------

def _seiso_k(chyp, x1, x2):
    inv_l = jnp.exp(-chyp[0])
    sf2 = jnp.exp(2.0 * chyp[1])
    return sf2 * jnp.exp(-0.5 * sqdist(x1 * inv_l, x2 * inv_l))


def _seiso_diag_k(chyp, x):
    sf2 = jnp.exp(2.0 * chyp[1])
    return jnp.full((x.shape[0],), sf2, dtype=x.dtype)


def _seiso_default_hyp(x, y):
    """log l = 0, log sf = log std(y)  (CovSEiso.cpp:79-85)."""
    y = np.asarray(y).ravel()
    return np.array([0.0, np.log(np.std(y, ddof=1))])


def _seiso_hyp_range(x, y):
    """Intersects the per-dim boxes across dims (CovSEiso.cpp:70-71); note the
    slightly different sigma_f lower bound vs SE-ARD (CovSEiso.cpp:75-76)."""
    x = np.asarray(x)
    y = np.asarray(y).ravel()
    lb = np.full(2, -np.inf)
    ub = np.full(2, 0.5 * np.log(0.5 * DBL_MAX))
    lb_d, ub_d = _lscale_bounds_per_dim(x)
    lb[0] = max(lb[0], lb_d.max())
    ub[0] = min(ub[0], ub_d.min())
    yrange = y.max() - y.min()
    with np.errstate(divide="ignore"):
        lb[1] = np.log(max(0.0, DBL_EPS * yrange))
        ub[1] = np.log(10 * yrange)
    return lb, ub


SE_ISO = KernelSpec(
    name="se_iso",
    num_hyp=lambda dim: 2,
    k=_seiso_k,
    diag_k=_seiso_diag_k,
    default_hyp=_seiso_default_hyp,
    hyp_range=_seiso_hyp_range,
    k_noise=_generic_k_noise(_seiso_k, _seiso_diag_k),
    k_noise_vjp_q=_se_noise_vjp_q(False),
    far_pad_ok=True,
)


KERNELS = {"se_ard": SE_ARD, "se_iso": SE_ISO}


def _register_pallas_variants():
    """Fused Pallas builds of the same covariances (ops/pallas_kernels.py):
    identical contract and hyp packing, single-pass K construction on TPU.

    On TPU the fused build IS the default for large shapes: a plain-XLA
    SE-ARD K at N=8000 costs ~15.8 ms (sqdist materialization + separate
    exp pass, both HBM-bound) vs one fused tile pass; the custom VJP
    replaces AD-of-sqdist with closed-form cotangent matmuls.  Off TPU or
    below the tile threshold the pallas wrappers fall back to the plain
    formula, so the default is safe everywhere (and vmap-safe for the
    per-point gradient APIs)."""
    global SE_ARD, SE_ISO
    from .pallas_kernels import (seard_k_noise_pallas, seard_k_pallas,
                                 seiso_k_noise_pallas, seiso_k_pallas)
    KERNELS["se_ard_xla"] = SE_ARD._replace(name="se_ard_xla")
    KERNELS["se_iso_xla"] = SE_ISO._replace(name="se_iso_xla")
    SE_ARD = SE_ARD._replace(k=seard_k_pallas,
                             k_noise=seard_k_noise_pallas)
    SE_ISO = SE_ISO._replace(k=seiso_k_pallas,
                             k_noise=seiso_k_noise_pallas)
    KERNELS["se_ard"] = SE_ARD
    KERNELS["se_iso"] = SE_ISO
    KERNELS["se_ard_pallas"] = SE_ARD._replace(name="se_ard_pallas")
    KERNELS["se_iso_pallas"] = SE_ISO._replace(name="se_iso_pallas")


_register_pallas_variants()


def get_kernel(name_or_spec) -> KernelSpec:
    """Factory mirroring GP::_specify_cov (GP.cpp:575-587)."""
    if isinstance(name_or_spec, KernelSpec):
        return name_or_spec
    try:
        return KERNELS[str(name_or_spec).lower()]
    except KeyError:
        raise ValueError(
            f"Unknown kernel {name_or_spec!r}; available: {sorted(KERNELS)}"
        ) from None
