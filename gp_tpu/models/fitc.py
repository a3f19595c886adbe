"""FITC sparse GP (Snelson & Ghahramani) — reference: FITC.{h,cpp}.

The Woodbury/Nystrom algebra is O(N M^2) in MXU-friendly matmuls:

  Gamma = (sn2 + sf2 - diag(Kxu Kuu^-1 Kux)) / sn2          (FITC.cpp:215)
  A     = sn2 Kuu + Kux Gamma^-1 Kxu                        (FITC.cpp:217)
  NLL   = 0.5 [ y^T Gamma^-1 (y - Kxu A^-1 Kux Gamma^-1 y)/sn2
              + log|A| - log|Kuu| + sum log Gamma + (N-M) log sn2
              + N log 2pi ]                                  (FITC.cpp:220-227)

The reference's 100-line analytic hyp-gradient block with its flagged
O(N M^2) dGamma bottleneck (FITC.cpp:237-315) is replaced by
jax.value_and_grad of this objective — reverse-mode AD through the
factorizations has the same O(N M^2) complexity and fuses on XLA.
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
    """FITC::_calcNegLogProb (FITC.cpp:201-228); NaN/inf propagate."""
    n, d = x.shape
    m = u.shape[0]
    nc = kernel.num_hyp(d)
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    r = y - hyp_mean(hyp)

    sf2 = kernel.diag_k(chyp, x)
    Kuu = kernel.k(chyp, u, u) + jitter * jnp.eye(m, dtype=x.dtype)
    Kxu = kernel.k(chyp, x, u)

    Luu = cholesky(Kuu)
    V = solve_lower(Luu, Kxu.T)                     # (M, N): Luu^-1 Kux
    qdiag = jnp.sum(V * V, axis=0)                  # diag(Kxu Kuu^-1 Kux)
    # The Nystrom residual sf2 - qdiag is >= 0 mathematically; clamping
    # suppresses float cancellation noise (it is 0 exactly when an inducing
    # point coincides with a data point).
    gamma = 1.0 + jnp.maximum(sf2 - qdiag, 0.0) / sn2
    inv_gamma = 1.0 / gamma

    A = sn2 * Kuu + (Kxu.T * inv_gamma) @ Kxu       # (M, M)
    LA = cholesky(A)

    t1 = Kxu.T @ (inv_gamma * r)                    # (M,)
    fit = jnp.dot(inv_gamma * r, r - Kxu @ chol_solve(LA, t1)) / sn2
    complexity = (chol_logdet(LA) - chol_logdet(Luu)
                  + jnp.sum(jnp.log(gamma)) + (n - m) * jnp.log(sn2))
    from .base import debug_decomp_enabled, debug_print_nll_decomp
    if debug_decomp_enabled():
        # per-eval decomposition (MYDEBUG parity: GP.cpp:144-146 analog)
        debug_print_nll_decomp(
            "fitc_nll",
            nlz=0.5 * (fit + complexity + n * jnp.log(2 * jnp.pi)),
            data_fit=0.5 * fit, complexity=0.5 * complexity,
            norm_const=0.5 * n * jnp.log(2 * jnp.pi))
    return 0.5 * (fit + complexity + n * jnp.log(2 * jnp.pi))


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
def fit(kernel, noise_free, x, y, u, jitter, vec0, lb, ub, max_evals=130):
    fun = lambda v: objective_vg(kernel, noise_free, v, x, y, u, jitter)
    # dtype contract: optimizer state in the data dtype (see exact.fit)
    vec0, lb, ub = (a.astype(x.dtype) for a in (vec0, lb, ub))
    return lbfgsb_impl(fun, vec0, lb, ub, max_evals=max_evals)


@partial(jax.jit, static_argnames=("kernel", "max_tries"))
def set_k(kernel: KernelSpec, hyp, x, y, u, jitter0, max_tries: int = 64):
    """FITC::_setK (FITC.cpp:165-200): factor Kuu+jI and A, doubling the
    jitter until both are SPD (the first attempt leaves A un-jittered, the
    retries add jitter to A too — exactly the reference's loop shape).

    Returns (Luu, LA, alpha, jitter, ok).
    """
    n, d = x.shape
    m = u.shape[0]
    nc = kernel.num_hyp(d)
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    r = y - hyp_mean(hyp)
    sf2 = kernel.diag_k(chyp, x)
    Kuu = kernel.k(chyp, u, u)
    Kxu = kernel.k(chyp, x, u)
    eye = jnp.eye(m, dtype=x.dtype)

    def attempt(jitter, a_jitter):
        Luu = cholesky(Kuu + jitter * eye)
        V = solve_lower(Luu, Kxu.T)
        qdiag = jnp.sum(V * V, axis=0)
        inv_gamma = 1.0 / (1.0 + jnp.maximum(sf2 - qdiag, 0.0) / sn2)
        # A from the raw Kuu (FITC.cpp:180), unlike the NLL's jittered one.
        A = sn2 * Kuu + (Kxu.T * inv_gamma) @ Kxu
        LA = cholesky(A + a_jitter * eye)
        return Luu, LA, inv_gamma

    def cond(state):
        Luu, LA, _, _, tries = state
        return jnp.logical_and(~(chol_ok(Luu) & chol_ok(LA)),
                               tries < max_tries)

    def body(state):
        _, _, _, jitter, tries = state
        jitter = jitter * 2.0
        Luu, LA, inv_gamma = attempt(jitter, jitter)
        return Luu, LA, inv_gamma, jitter, tries + 1

    jitter0 = jnp.asarray(jitter0, x.dtype)
    Luu0, LA0, ig0 = attempt(jitter0, jnp.zeros((), x.dtype))
    Luu, LA, inv_gamma, jitter, _ = jax.lax.while_loop(
        cond, body, (Luu0, LA0, ig0, jitter0, jnp.zeros((), jnp.int32)))

    alpha = chol_solve(LA, Kxu.T @ (inv_gamma * r))
    return Luu, LA, alpha, jitter, chol_ok(Luu) & chol_ok(LA)


@partial(jax.jit, static_argnames=("kernel",))
def predict(kernel: KernelSpec, hyp, u, Luu, LA, alpha, xs):
    """FITC::_predict (FITC.cpp:109-117): O(M)/O(M^2) per point.

    y*  = K*u alpha + mean
    s2* = max(sn2 + sf2 - diag(K*u (Kuu^-1 - sn2 A^-1) K*u^T), sn2)
    """
    nc = kernel.num_hyp(xs.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    Ksu = kernel.k(chyp, xs, u)                      # (T, M)
    mu = Ksu @ alpha + hyp_mean(hyp)
    KinvK = chol_solve(Luu, Ksu.T) - sn2 * chol_solve(LA, Ksu.T)
    sf2 = kernel.diag_k(chyp, xs)
    s2 = jnp.maximum(sn2 + sf2 - jnp.sum(Ksu * KinvK.T, axis=1), sn2)
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
    sn2 = hyp_sn2(hyp)
    kt = kernel.k(chyp, xi[None, :], u)[0]
    KinvK = chol_solve(Luu, kt) - sn2 * chol_solve(LA, kt)
    sf2 = kernel.diag_k(chyp, xi[None, :])[0]
    raw = sn2 + sf2 - jnp.dot(kt, KinvK)
    clamped = jnp.maximum(raw, sn2)
    # value clamped at sn2 (FITC.cpp:117); gradient ignores the clamp,
    # matching the reference's analytic gs2 (FITC.cpp:127).
    return raw + jax.lax.stop_gradient(clamped - raw)


@partial(jax.jit, static_argnames=("kernel",))
def predict_y_with_grad(kernel, hyp, u, alpha, xs):
    f = lambda xi: _predict_y_single(kernel, hyp, u, alpha, xi)
    return jax.vmap(jax.value_and_grad(f))(xs)


@partial(jax.jit, static_argnames=("kernel",))
def predict_s2_with_grad(kernel, hyp, u, Luu, LA, xs):
    f = lambda xi: _predict_s2_single(kernel, hyp, u, Luu, LA, xi)
    return jax.vmap(jax.value_and_grad(f))(xs)


# --------------------------------------------------------------------------
# Class wrapper
# --------------------------------------------------------------------------

class FITC(SparseGPBase):
    """FITC sparse GP with the reference's public surface (FITC.h)."""

    _MAX_EVAL = 130  # FITC.cpp:75

    # posterior cache: (Luu, LA, alpha)

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
        Luu, LA, alpha, jitter, ok = set_k(
            self.kernel, self._hyps, self._x, self._y, self._u,
            jnp.asarray(self._jitter_u, self._dtype))
        if not bool(ok):
            # FITC::_setK loops until SPD (FITC.cpp:184-198) — it can never
            # serve a failed factor; fail loud (matches train_distributed)
            raise RuntimeError(
                "FITC posterior factorization failed after jitter doubling "
                "(set_k exhausted max_tries); refusing to cache a NaN "
                "posterior")
        self._jitter_u = float(jitter)
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


    def test_obj(self, hyp, eps: float = 1e-3):
        """Analytic-vs-finite-difference gradient self-check
        (FITC::test_obj, FITC.cpp:324-352).  Returns (nll, grad, grad_fd)."""
        hyp = jnp.asarray(np.asarray(hyp), self._dtype)
        jit_u = jnp.asarray(self._jitter_u, self._dtype)
        f = lambda h: nll_raw(self.kernel, h, self._x, self._y, self._u, jit_u)
        v, g = jax.value_and_grad(f)(hyp)
        fd = np.zeros(self._num_hyp)
        for i in range(self._num_hyp):
            e = np.zeros(self._num_hyp); e[i] = eps
            fd[i] = (float(f(hyp + e)) - float(f(hyp - e))) / (2 * eps)
        return float(v), np.asarray(g), fd
