"""BucketedGP: exact GP with O(1)-recompile incremental data.

The reference's Bayesian-optimization workflow adds a point per iteration
(GP::add_data, GP.cpp:43-55) and refits.  Under jit a growing N would
recompile the whole training program each step; BucketedGP instead keeps a
fixed-capacity padded buffer and passes the live point count as a TRACED
scalar (models/exact.py masked-capacity variants), so add_data + train
reuse the same compiled executable until capacity is exceeded — then the
buffer grows by `bucket` rows and exactly one recompile happens.

Semantics match GP on the first n_real rows exactly (padded rows are
identity-masked out of K and zero-masked out of every reduction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import from_opt_vec, hyp_mean, hyp_sn2
from .exact import (GP, fit_masked, nll_raw_masked, predict_masked,
                    set_k_masked)
from ..config import INF


def _pad_rows(a, cap):
    pad = cap - a.shape[0]
    if pad <= 0:
        return a[:cap]
    width = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
    return jnp.pad(a, width)


class BucketedGP(GP):
    """Exact GP over a fixed-capacity buffer; `bucket` = growth granule."""

    def __init__(self, train_x, train_y, bucket: int = 64, **kw):
        super().__init__(train_x, train_y, **kw)
        self._bucket = int(bucket)
        self._refresh_buffers()

    # -- buffer management ---------------------------------------------------
    @property
    def capacity(self) -> int:
        return int(self._xp.shape[0])

    def _refresh_buffers(self):
        n = self.num_train
        cap = -(-n // self._bucket) * self._bucket
        self._n_real = jnp.asarray(n, jnp.int32)
        self._xp = _pad_rows(self._x, cap)
        self._yp = _pad_rows(self._y, cap)
        self._ysp = _pad_rows(self._ys, cap)

    def add_data(self, x, y):
        """Append points; same compiled programs as long as capacity holds.

        NOTE: the y-standardization constants are frozen at the last
        buffer refresh (they are baked into compiled-program inputs only,
        so freezing them is what avoids recompiles); they refresh whenever
        the buffer grows.
        """
        x = jnp.asarray(np.asarray(x, np.float64), self._dtype)
        y = jnp.asarray(np.asarray(y, np.float64).ravel(), self._dtype)
        if x.ndim != 2 or x.shape[1] != self._dim:
            raise ValueError("added x must be (num_added, dim)")
        n0 = self.num_train
        self._x = jnp.concatenate([self._x, x], axis=0)
        self._y = jnp.concatenate([self._y, y], axis=0)
        self._trained = False
        self._invalidate_closures()
        if self.num_train > self.capacity:
            self._set_standardization(np.asarray(self._y, np.float64))
            self._refresh_buffers()
            return
        # in-capacity: write rows in place, no shape change anywhere
        self._n_real = jnp.asarray(self.num_train, jnp.int32)
        self._xp = jax.lax.dynamic_update_slice(
            self._xp, x, (n0, 0))
        self._yp = jax.lax.dynamic_update_slice(self._yp, y, (n0,))
        ys_new = (y - self._y_mu) / self._y_sigma
        self._ysp = jax.lax.dynamic_update_slice(
            self._ysp, ys_new.astype(self._dtype), (n0,))

    def absorb(self, x, y):
        """Add ONE point and update the posterior in O(capacity^2) without
        refitting (hyperparameters kept fixed) — the Bayesian-optimization
        serving fast path.  Requires a trained model with the Cholesky
        solver, in-capacity; falls back to add_data + _update_posterior
        (O(cap^3) refactorization) when the cheap append is not possible.
        """
        from .exact import append_posterior_masked

        x = np.asarray(x, np.float64).reshape(-1)
        y = float(np.asarray(y).reshape(()))
        if x.shape[0] != self._dim:
            raise ValueError(f"absorb expects a single point of dim "
                             f"{self._dim}")
        cheap = (self._trained and self.solver.name == "chol"
                 and self.num_train + 1 <= self.capacity)
        if not cheap:
            self.add_data(x[None, :], [y])
            if self._hyps is not None:
                self._update_posterior()
                self._trained = True
            return

        n0 = self.num_train
        xd = jnp.asarray(x, self._dtype)
        yd = jnp.asarray(y, self._dtype)
        L = self._post[0]
        xp, yp, L2, invKys, ok = append_posterior_masked(
            self.kernel, self._hyps, self._xp, self._yp, n0, L, xd, yd)
        # keep host-side real arrays + standardized buffer in sync
        self._x = jnp.concatenate([self._x, xd[None, :]], axis=0)
        self._y = jnp.concatenate([self._y, yd[None]], axis=0)
        self._n_real = jnp.asarray(self.num_train, jnp.int32)
        self._xp, self._yp = xp, yp
        ys_new = (yd - self._y_mu) / self._y_sigma
        self._ysp = jax.lax.dynamic_update_slice(
            self._ysp, jnp.reshape(ys_new.astype(self._dtype), (1,)), (n0,))
        self._invalidate_closures()
        if bool(ok):
            self._post = (L2, invKys)
        else:   # non-positive pivot: full rescue path
            self._update_posterior()

    # -- jitted-stage overrides (masked-capacity variants) -------------------
    def _nll_value(self, hyp):
        v = nll_raw_masked(self.kernel, jnp.asarray(hyp, self._dtype),
                           self._xp, self._yp, self._n_real, self.solver)
        return jnp.where(jnp.isfinite(v), v, INF)

    def _multistart_objective(self):
        fun = self._ms_fun
        if fun is None:
            kernel, noise_free = self.kernel, self._noise_free
            xp, ysp, n_real = self._xp, self._ysp, self._n_real
            solver = self.solver

            def fun(v):
                hyp = from_opt_vec(v, noise_free)
                nc = kernel.num_hyp(xp.shape[1])
                sf2_mean = jnp.mean(kernel.diag_k(hyp[:nc], xp))
                val = nll_raw_masked(kernel, hyp, xp, ysp, n_real, solver)
                ok = jnp.isfinite(val) & (hyp_sn2(hyp) <= sf2_mean)
                return jnp.where(ok, val, INF)

            self._ms_fun = fun
        return fun

    def _objective_closure(self):
        fun = self._obj_fun
        if fun is None:
            from .exact import objective_vg_masked
            kernel, noise_free = self.kernel, self._noise_free
            xp, ysp, n_real = self._xp, self._ysp, self._n_real
            solver = self.solver
            fun = lambda v: objective_vg_masked(kernel, noise_free, v, xp,
                                                ysp, n_real, solver)
            self._obj_fun = fun
        return fun

    def _run_local_opt(self, vec0, lb_v, ub_v):
        return fit_masked(self.kernel, self._noise_free, self._xp, self._ysp,
                          self._n_real, vec0, lb_v, ub_v,
                          max_evals=self._MAX_EVAL, solver=self.solver)

    def _update_posterior(self):
        hyp, f, invKys, ok = set_k_masked(self.kernel, self._hyps, self._xp,
                                          self._yp, self._n_real, self.solver)
        if not bool(ok):
            # reference parity (GP.cpp:423-444): never serve a failed factor
            raise RuntimeError(
                "posterior factorization failed after noise inflation "
                "(set_k_masked exhausted max_tries); refusing to cache a "
                "NaN posterior")
        self._hyps = hyp
        self._post = (*f, invKys)

    # -- prediction (masked) -------------------------------------------------
    def batch_predict(self, xs):
        self._require_trained()
        mu, s2 = predict_masked(self.kernel, self._hyps, self._xp,
                                self._factors(), self._post[-1],
                                self._n_real, self._as_batch(xs),
                                self.solver)
        return np.asarray(mu), np.asarray(s2)

    def batch_predict_y(self, xs):
        """O(N T) mean-only path (masked kt . invKys; no variance solves)."""
        self._require_trained()
        kernel, hyp = self.kernel, self._hyps
        nc = kernel.num_hyp(self._xp.shape[1])
        real = (jnp.arange(self._xp.shape[0]) < self._n_real)[None, :]
        kt = jnp.where(real, kernel.k(hyp[:nc], self._as_batch(xs),
                                      self._xp), 0.0)
        return np.asarray(hyp_mean(hyp) + kt @ self._post[-1])

    def batch_predict_s2(self, xs):
        return self.batch_predict(xs)[1]

    def _predict_single_masked(self, xi, want):
        kernel, hyp, solver = self.kernel, self._hyps, self.solver
        xp, n_real = self._xp, self._n_real
        f, invKys = self._factors(), self._post[-1]
        nc = kernel.num_hyp(xp.shape[1])
        chyp = hyp[:nc]
        real = jnp.arange(xp.shape[0]) < n_real
        kt = jnp.where(real, kernel.k(chyp, xi[None, :], xp)[0], 0.0)
        if want == "y":
            return hyp_mean(hyp) + jnp.dot(kt, invKys)
        kks = solver.solve(f, kt)
        sf2 = kernel.diag_k(chyp, xi[None, :])[0]
        quad = jnp.dot(kt, kks)
        raw = sf2 - quad + hyp_sn2(hyp)
        clamped = jnp.maximum(sf2 - quad, 0.0) + hyp_sn2(hyp)
        return raw + jax.lax.stop_gradient(clamped - raw)

    def batch_predict_y_with_grad(self, xs):
        self._require_trained()
        g = jax.vmap(jax.value_and_grad(
            lambda xi: self._predict_single_masked(xi, "y")))
        y, gy = g(self._as_batch(xs))
        return np.asarray(y), np.asarray(gy)

    def batch_predict_s2_with_grad(self, xs):
        self._require_trained()
        g = jax.vmap(jax.value_and_grad(
            lambda xi: self._predict_single_masked(xi, "s2")))
        s2, gs2 = g(self._as_batch(xs))
        return np.asarray(s2), np.asarray(gs2)
