"""VFE sparse GP (Titsias variational free energy) — reference: VFE.{h,cpp}.

Same structure as FITC with the variational objective:

  A   = sn2 Kuu + Kux Kxu                                   (VFE.cpp:174)
  NLL = 0.5 [ N log 2pi + log|A| - log|Kuu| + (N-M) log sn2 + y^T alpha ]
      + 0.5 (sum diag K - tr(Kuu^-1 Kux Kxu)) / sn2         (VFE.cpp:185-189)
  alpha = (y - Kxu A^-1 Kux y) / sn2                        (VFE.cpp:183)

The trailing trace regularizer is the FITC/VFE difference.  Hyp-gradients
(VFE.cpp:197-241) come from jax.value_and_grad.

Reference quirks handled deliberately:
  * VFE::_predict is a stub (assert(!need_g), VFE.cpp:109-112), making the
    combined batch_predict path non-functional in the reference — here it
    works (mean + VFE variance), a strict superset.
  * predict_s2 adds NO sn2 and floors at 0 (VFE.cpp:125-131).
  * VFE::_setK accumulates jitter cumulatively into Kuu while doubling
    (VFE.cpp:146-158); reproduced below.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INF
from ..ops.chol import chol_logdet, chol_ok, chol_solve, cholesky, solve_lower
from ..ops.kernels import KernelSpec
from ..optim.lbfgsb import lbfgsb_impl
from .base import (from_opt_vec, hyp_mean, hyp_sn2,
                   sanitize_value_and_grad)
from .sparse import SparseGPBase


# --------------------------------------------------------------------------
# Pure functions
# --------------------------------------------------------------------------

def nll_raw(kernel: KernelSpec, hyp, x, y, u, jitter):
    """VFE::_calcNegLogProb (VFE.cpp:161-189); NaN/inf propagate."""
    n, d = x.shape
    m = u.shape[0]
    nc = kernel.num_hyp(d)
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    r = y - hyp_mean(hyp)

    Kuu = kernel.k(chyp, u, u) + jitter * jnp.eye(m, dtype=x.dtype)
    Kxu = kernel.k(chyp, x, u)
    Kuxxu = Kxu.T @ Kxu
    A = sn2 * Kuu + Kuxxu

    Luu = cholesky(Kuu)
    LA = cholesky(A)

    alpha = (r - Kxu @ chol_solve(LA, Kxu.T @ r)) / sn2
    f0 = 0.5 * n * jnp.log(2 * jnp.pi)
    complexity = 0.5 * (chol_logdet(LA) - chol_logdet(Luu)
                        + (n - m) * jnp.log(sn2))
    data_fit = 0.5 * jnp.dot(r, alpha)
    V = solve_lower(Luu, Kxu.T)          # tr(Kuu^-1 Kuxxu) = |V|_F^2
    # clamp: the trace of the Nystrom residual is >= 0 mathematically
    trace_term = 0.5 * jnp.maximum(
        jnp.sum(kernel.diag_k(chyp, x)) - jnp.sum(V * V), 0.0) / sn2
    from .base import debug_decomp_enabled, debug_print_nll_decomp
    if debug_decomp_enabled():
        # per-eval decomposition (MYDEBUG parity: VFE.cpp:242-245)
        debug_print_nll_decomp(
            "vfe_nll", nlz=f0 + complexity + data_fit + trace_term,
            data_fit=data_fit, complexity=complexity,
            trace_term=trace_term, norm_const=f0)
    return f0 + complexity + data_fit + trace_term


@partial(jax.jit, static_argnames=("kernel",))
def nll(kernel: KernelSpec, hyp, x, y, u, jitter):
    v = nll_raw(kernel, hyp, x, y, u, jitter)
    return jnp.where(jnp.isfinite(v), v, INF)


def objective_vg(kernel: KernelSpec, noise_free: bool, vec, x, y, u, jitter):
    f, g = jax.value_and_grad(
        lambda v: nll_raw(kernel, from_opt_vec(v, noise_free), x, y, u, jitter)
    )(vec)
    return sanitize_value_and_grad(f, g)


def multistart_objective(kernel, noise_free, vec, x, y, u, jitter):
    hyp = from_opt_vec(vec, noise_free)
    nc = kernel.num_hyp(x.shape[1])
    sf2_mean = jnp.mean(kernel.diag_k(hyp[:nc], x))
    v = nll_raw(kernel, hyp, x, y, u, jitter)
    ok = jnp.isfinite(v) & (hyp_sn2(hyp) <= sf2_mean)
    return jnp.where(ok, v, INF)


@partial(jax.jit, static_argnames=("kernel", "noise_free", "max_evals"))
def fit(kernel, noise_free, x, y, u, jitter, vec0, lb, ub, max_evals=150):
    fun = lambda v: objective_vg(kernel, noise_free, v, x, y, u, jitter)
    # dtype contract: optimizer state in the data dtype (see exact.fit)
    vec0, lb, ub = (a.astype(x.dtype) for a in (vec0, lb, ub))
    return lbfgsb_impl(fun, vec0, lb, ub, max_evals=max_evals)


@partial(jax.jit, static_argnames=("kernel", "max_tries"))
def set_k(kernel: KernelSpec, hyp, x, y, u, jitter0, max_tries: int = 64):
    """VFE::_setK (VFE.cpp:132-160): A = Kuu + Kux Kxu / sn2 (the NLL's A
    divided by sn2); on failure jitter is ADDED to Kuu cumulatively, then
    doubled.  alpha = A^-1 Kux r / sn2.

    Returns (Luu, LA, alpha, total_added, ok).
    """
    d = x.shape[1]
    m = u.shape[0]
    nc = kernel.num_hyp(d)
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    r = y - hyp_mean(hyp)
    Kuu0 = kernel.k(chyp, u, u)
    Kxu = kernel.k(chyp, x, u)
    Kuxxu = Kxu.T @ Kxu
    eye = jnp.eye(m, dtype=x.dtype)

    def attempt(added):
        Kuu = Kuu0 + added * eye
        A = Kuu + Kuxxu / sn2
        return cholesky(Kuu), cholesky(A)

    def cond(state):
        Luu, LA, added, jitter, tries = state
        return jnp.logical_and(~(chol_ok(Luu) & chol_ok(LA)),
                               tries < max_tries)

    def body(state):
        _, _, added, jitter, tries = state
        added = added + jitter
        Luu, LA = attempt(added)
        return Luu, LA, added, jitter * 2.0, tries + 1

    zero = jnp.zeros((), x.dtype)
    Luu0_, LA0_ = attempt(zero)
    Luu, LA, added, _, _ = jax.lax.while_loop(
        cond, body,
        (Luu0_, LA0_, zero, jnp.asarray(jitter0, x.dtype),
         jnp.zeros((), jnp.int32)))

    alpha = chol_solve(LA, Kxu.T @ r) / sn2
    return Luu, LA, alpha, added, chol_ok(Luu) & chol_ok(LA)


@partial(jax.jit, static_argnames=("kernel",))
def predict(kernel: KernelSpec, hyp, u, Luu, LA, alpha, xs):
    """Mean (VFE.cpp:113-117) + VFE variance (VFE.cpp:125-131):
    s2 = max(sf2 - diag(K*u (Kuu^-1 - A^-1) K*u^T), 0), NO sn2 added."""
    nc = kernel.num_hyp(xs.shape[1])
    chyp = hyp[:nc]
    Ksu = kernel.k(chyp, xs, u)
    mu = Ksu @ alpha + hyp_mean(hyp)
    KinvK = chol_solve(Luu, Ksu.T) - chol_solve(LA, Ksu.T)
    sf2 = kernel.diag_k(chyp, xs)
    s2 = jnp.maximum(sf2 - jnp.sum(Ksu * KinvK.T, axis=1), 0.0)
    return mu, s2


@partial(jax.jit, static_argnames=("kernel",))
def predict_y(kernel: KernelSpec, hyp, u, alpha, xs):
    nc = kernel.num_hyp(xs.shape[1])
    Ksu = kernel.k(hyp[:nc], xs, u)
    return Ksu @ alpha + hyp_mean(hyp)


def _predict_y_single(kernel, hyp, u, alpha, xi):
    nc = kernel.num_hyp(u.shape[1])
    kt = kernel.k(hyp[:nc], xi[None, :], u)[0]
    return jnp.dot(kt, alpha) + hyp_mean(hyp)


def _predict_s2_single(kernel, hyp, u, Luu, LA, xi):
    nc = kernel.num_hyp(u.shape[1])
    chyp = hyp[:nc]
    kt = kernel.k(chyp, xi[None, :], u)[0]
    KinvK = chol_solve(Luu, kt) - chol_solve(LA, kt)
    sf2 = kernel.diag_k(chyp, xi[None, :])[0]
    raw = sf2 - jnp.dot(kt, KinvK)
    clamped = jnp.maximum(raw, 0.0)
    return raw + jax.lax.stop_gradient(clamped - raw)


@partial(jax.jit, static_argnames=("kernel",))
def predict_y_with_grad(kernel, hyp, u, alpha, xs):
    f = lambda xi: _predict_y_single(kernel, hyp, u, alpha, xi)
    return jax.vmap(jax.value_and_grad(f))(xs)


@partial(jax.jit, static_argnames=("kernel",))
def predict_s2_with_grad(kernel, hyp, u, Luu, LA, xs):
    """Input-gradient of the VFE variance — unsupported in the reference
    (VFE.cpp:125-131 ignores need_g); provided here as a superset."""
    f = lambda xi: _predict_s2_single(kernel, hyp, u, Luu, LA, xi)
    return jax.vmap(jax.value_and_grad(f))(xs)


# --------------------------------------------------------------------------
# Class wrapper
# --------------------------------------------------------------------------

class VFE(SparseGPBase):
    """VFE sparse GP with the reference's public surface (VFE.h)."""

    _MAX_EVAL = 150  # VFE.cpp:74

    def train(self, init_hyps=None) -> float:
        """VFE.cpp:94-101: uniquely among the models, a failed optimization
        re-seeds via the global search and retries once."""
        nlz = super().train(init_hyps)
        if not np.isfinite(nlz):
            reseeded = self.select_init_hyp(
                self._num_hyp * 50, self.get_default_hyps())
            nlz = super().train(reseeded)
        return nlz

    def _nll_value(self, hyp):
        return nll(self.kernel, hyp, self._x, self._y, self._u,
                   jnp.asarray(self._jitter_u, self._dtype))

    def _multistart_objective(self):
        fun = self._ms_fun
        if fun is None:
            kernel, noise_free = self.kernel, self._noise_free
            x, y, u = self._x, self._ys, self._u
            jit_u = jnp.asarray(self._jitter_std, self._dtype)
            fun = lambda v: multistart_objective(kernel, noise_free, v, x, y,
                                                 u, jit_u)
            self._ms_fun = fun
        return fun


    def _objective_closure(self):
        fun = self._obj_fun
        if fun is None:
            kernel, noise_free = self.kernel, self._noise_free
            x, y, u = self._x, self._ys, self._u
            jit_u = jnp.asarray(self._jitter_std, self._dtype)
            fun = lambda v: objective_vg(kernel, noise_free, v, x, y, u, jit_u)
            self._obj_fun = fun
        return fun
    def _run_local_opt(self, vec0, lb_v, ub_v):
        return self._run_local_opt_guarded(
            lambda: fit(self.kernel, self._noise_free, self._x, self._ys,
                        self._u, jnp.asarray(self._jitter_std, self._dtype),
                        vec0, lb_v, ub_v, max_evals=self._MAX_EVAL),
            vec0, lb_v, ub_v)

    def _update_posterior(self):
        Luu, LA, alpha, added, ok = set_k(
            self.kernel, self._hyps, self._x, self._y, self._u,
            jnp.asarray(self._jitter_u, self._dtype))
        if not bool(ok):
            # VFE::_setK loops until SPD (VFE.cpp:146-158) — it can never
            # serve a failed factor; fail loud (matches train_distributed)
            raise RuntimeError(
                "VFE posterior factorization failed after jitter doubling "
                "(set_k exhausted max_tries); refusing to cache a NaN "
                "posterior")
        self._post = (Luu, LA, alpha)

    # -- prediction API ------------------------------------------------------


    def batch_predict(self, xs):
        self._require_trained()
        Luu, LA, alpha = self._post
        mu, s2 = predict(self.kernel, self._hyps, self._u, Luu, LA, alpha,
                         self._as_batch(xs))
        return np.asarray(mu), np.asarray(s2)

    def batch_predict_y(self, xs):
        self._require_trained()
        _, _, alpha = self._post
        return np.asarray(predict_y(self.kernel, self._hyps, self._u, alpha,
                                    self._as_batch(xs)))

    def batch_predict_s2(self, xs):
        return self.batch_predict(xs)[1]

    def batch_predict_y_with_grad(self, xs):
        self._require_trained()
        _, _, alpha = self._post
        y, gy = predict_y_with_grad(self.kernel, self._hyps, self._u, alpha,
                                    self._as_batch(xs))
        return np.asarray(y), np.asarray(gy)

    def batch_predict_s2_with_grad(self, xs):
        self._require_trained()
        Luu, LA, _ = self._post
        s2, gs2 = predict_s2_with_grad(self.kernel, self._hyps, self._u,
                                       Luu, LA, self._as_batch(xs))
        return np.asarray(s2), np.asarray(gs2)


    def test_obj(self, hyp, eps: float = 1e-6):
        """VFE::test_obj (VFE.cpp:254-282): analytic vs finite-difference
        NLL gradient.  Returns (nll, grad, grad_fd)."""
        hyp = jnp.asarray(np.asarray(hyp), self._dtype)
        jit_u = jnp.asarray(self._jitter_u, self._dtype)
        f = lambda h: nll_raw(self.kernel, h, self._x, self._y, self._u, jit_u)
        v, g = jax.value_and_grad(f)(hyp)
        fd = np.zeros(self._num_hyp)
        for i in range(self._num_hyp):
            e = np.zeros(self._num_hyp); e[i] = eps
            fd[i] = (float(f(hyp + e)) - float(f(hyp - e))) / (2 * eps)
        return float(v), np.asarray(g), fd
