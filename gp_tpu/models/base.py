"""Shared model plumbing: hyperparameter packing, bounds, train pipeline.

Reproduces the GP-level hyperparameter contract of the reference
(GP.cpp:85-92, 514-574):

  hyp = [cov hyps ..., log sigma_n, mean]      (length cov.num_hyp + 2)
  sn2  = exp(2 * hyp[-2])                      (GP.cpp:565-569)
  mean = hyp[-1] (raw, not log)                (GP.cpp:570-574)

Noise-free mode removes log sigma_n from the optimization vector
(vec2hyp/hyp2vec packing, GP.cpp:535-564) and pins it at -inf.
"""

from __future__ import annotations

import os
import sys
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DBL_EPS, DEFAULT_SEED, INF, default_dtype
from ..ops.kernels import KernelSpec, get_kernel


# --------------------------------------------------------------------------
# Pure hyp helpers (usable inside jit)
# --------------------------------------------------------------------------

def hyp_sn2(hyp):
    return jnp.exp(2.0 * hyp[-2])


def hyp_mean(hyp):
    return hyp[-1]


def to_opt_vec(hyp, noise_free: bool):
    """hyp2vec (GP.cpp:550-564): drop log sigma_n when noise-free."""
    if not noise_free:
        return hyp
    return jnp.concatenate([hyp[:-2], hyp[-1:]])


def from_opt_vec(vec, noise_free: bool):
    """vec2hyp (GP.cpp:535-549): reinsert log sigma_n = -inf when noise-free."""
    if not noise_free:
        return vec
    neg_inf = jnp.full((1,), -INF, vec.dtype)
    return jnp.concatenate([vec[:-1], neg_inf, vec[-1:]])


def debug_decomp_enabled() -> bool:
    """True when the per-evaluation NLL decomposition print is on — the
    analog of the reference's MYDEBUG per-eval output (GP.cpp:144-146,
    VFE.cpp:242-245).  Requires BOTH debug mode and the verbose-opt knob,
    so plain debug runs don't flood stderr during a 160-eval fit."""
    from .. import config
    return ((config.DEBUG or os.environ.get("GP_TPU_DEBUG", "0") == "1")
            and os.environ.get("GP_TPU_VERBOSE_OPT", "0") == "1")


def debug_print_nll_decomp(tag: str, **terms):
    """Per-evaluation NLL term breakdown via jax.debug.print (works inside
    jit, streams back from the device as a host callback).  Checked at
    TRACE time: zero overhead when the env knobs are off."""
    fmt = " ".join(f"{k}={{{k}}}" for k in terms)
    jax.debug.print("[GP_TPU_DEBUG] " + tag + ": " + fmt, **terms)


def sanitize_value_and_grad(f, g):
    """INF-objective semantics (GP.cpp:147-171): non-finite value OR any
    non-finite gradient component turns the evaluation into (+inf, 0)."""
    ok = jnp.isfinite(f) & jnp.all(jnp.isfinite(g))
    f = jnp.where(ok, f, INF)
    g = jnp.where(ok, g, jnp.zeros_like(g))
    return f, g


# --------------------------------------------------------------------------
# Internal y-standardization (float32/TPU conditioning)
# --------------------------------------------------------------------------
#
# The MLE objective is optimized on y_std = (y - mu)/sigma rather than raw
# y.  This is an EXACT reparameterization of the model (scale-family
# property of the GP likelihood):
#
#   hyp_std = [log l (same), log sf - log sigma, log sn - log sigma,
#              (mean - mu)/sigma]
#   NLL_orig(hyp) = NLL_std(T(hyp)) + N log sigma
#
# Why: with raw y the NLL carries O(N log sigma_y^2) inside its logdet and
# data-fit sums; in float32 that magnitude floor swallows the descent
# signal (and FITC's Gamma cancellation gets amplified).  Standardized, the
# per-element terms are O(1).  The public API is entirely in ORIGINAL
# units — defaults, bounds, get_hyp, nll, prediction.


def hyp_to_std(kernel: KernelSpec, nc: int, hyp, mu: float, sigma: float):
    h = np.array(np.asarray(hyp), np.float64)
    ls = np.log(sigma)
    h[nc + kernel.out_scale_idx if kernel.out_scale_idx < 0
      else kernel.out_scale_idx] -= ls
    h[nc] -= ls                      # log sigma_n  (-inf stays -inf)
    h[nc + 1] = (h[nc + 1] - mu) / sigma
    return h


def hyp_from_std(kernel: KernelSpec, nc: int, hyp, mu: float, sigma: float):
    h = np.array(np.asarray(hyp), np.float64)
    ls = np.log(sigma)
    h[nc + kernel.out_scale_idx if kernel.out_scale_idx < 0
      else kernel.out_scale_idx] += ls
    h[nc] += ls
    h[nc + 1] = h[nc + 1] * sigma + mu
    return h


# --------------------------------------------------------------------------
# Host-side hyp defaults / ranges (data-dependent constants, computed once)
# --------------------------------------------------------------------------

def default_hyps(kernel: KernelSpec, x, y, noise_lb: float,
                 noise_free: bool) -> np.ndarray:
    """GP::get_default_hyps (GP.cpp:85-92)."""
    x = np.asarray(x)
    y = np.asarray(y).ravel()
    cov = kernel.default_hyp(x, y)
    if noise_free:
        log_sn = -np.inf
    else:
        with np.errstate(divide="ignore"):  # std(y)=0 or noise_lb=0 -> -inf
            log_sn = max(np.log(noise_lb), np.log(np.std(y, ddof=1) * 1e-3))
    return np.concatenate([cov, [log_sn, y.mean()]])


def hyp_range(kernel: KernelSpec, x, y, noise_lb: float):
    """GP::_set_hyp_range (GP.cpp:514-534). Returns (lb, ub) numpy arrays."""
    x = np.asarray(x)
    y = np.asarray(y).ravel()
    nc = kernel.num_hyp(x.shape[1])
    lb = np.full(nc + 2, -np.inf)
    ub = np.full(nc + 2, 0.5 * np.log(0.5 * np.finfo(np.float64).max))
    cov_lb, cov_ub = kernel.hyp_range(x, y)
    lb[:nc], ub[:nc] = cov_lb, cov_ub
    with np.errstate(divide="ignore"):
        lb[nc] = np.log(noise_lb)
        # reference ties the noise ub to the sigma_f ub (GP.cpp:524-525);
        # out_scale_idx locates log sigma_f (kernels with trailing extra
        # hyps, e.g. RQ's log alpha, would otherwise pick the wrong slot)
        osc = nc + kernel.out_scale_idx if kernel.out_scale_idx < 0 \
            else kernel.out_scale_idx
        ub[nc] = max(np.log(10 * noise_lb) if noise_lb > 0 else -np.inf,
                     ub[osc])
    lb[nc + 1] = y.min()
    ub[nc + 1] = y.max()
    return lb - DBL_EPS, ub + DBL_EPS


# --------------------------------------------------------------------------
# Base model class
# --------------------------------------------------------------------------

class GPBase:
    """Common state + train pipeline shared by GP / FITC / VFE.

    Mirrors the reference's GP base class surface (GP.h:79-122).  Training is
    host-orchestrated (as in the reference) but every numeric stage — the NLL
    probe, the multi-start global search, the bounded L-BFGS loop with its
    ~max_eval objective evaluations, and the posterior cache — runs as a
    single jitted program on device.
    """

    _MAX_EVAL = 160  # GP.cpp:232; FITC=130, VFE=150 override

    def __init__(self, train_x, train_y, kernel="se_ard", dtype=None,
                 seed: int = DEFAULT_SEED, solver="chol"):
        x = np.asarray(train_x, dtype=np.float64)
        y = np.asarray(train_y, dtype=np.float64).ravel()
        if x.ndim != 2:
            raise ValueError("train_x must be (num_points, dim)")
        if x.shape[0] != y.shape[0]:
            raise ValueError("train_x and train_y must agree on num_points "
                             f"({x.shape[0]} vs {y.shape[0]})")
        self.kernel = get_kernel(kernel)
        from ..ops.solvers import get_solver
        self.solver = get_solver(solver)   # exact GP honors this; the
        # sparse models always use Cholesky + jitter doubling (their
        # TPU-native equivalent of the reference's QR fallback)
        self._dtype = jnp.dtype(dtype) if dtype is not None else default_dtype()
        self._x = jnp.asarray(x, self._dtype)
        self._y = jnp.asarray(y, self._dtype)
        self._set_standardization(y)
        self._dim = x.shape[1]
        self._num_cov = self.kernel.num_hyp(self._dim)
        self._num_hyp = self._num_cov + 2
        self._noise_lb = 1e-3        # GP.cpp:28
        self._noise_free = False
        self._fixhyps = False
        self._trained = False
        self._hyps = None
        self._key = jax.random.PRNGKey(seed)
        self._post = None            # model-specific posterior cache
        self._post_aux = None        # stream-regime scalars (logdet, nll)
        self._ms_fun = None          # cached multistart objective closure
        self._obj_fun = None         # cached (f,g) objective closure

    def _set_standardization(self, y_np):
        s = float(np.std(y_np, ddof=1)) if y_np.size > 1 else 0.0
        self._y_mu = float(np.mean(y_np))
        self._y_sigma = s if np.isfinite(s) and s > 0 else 1.0
        self._ys = jnp.asarray((np.asarray(y_np, np.float64) - self._y_mu)
                               / self._y_sigma, self._dtype)

    def _hyp_to_std(self, hyp):
        return hyp_to_std(self.kernel, self._num_cov, hyp, self._y_mu,
                          self._y_sigma)

    def _hyp_from_std(self, hyp):
        return hyp_from_std(self.kernel, self._num_cov, hyp, self._y_mu,
                            self._y_sigma)

    def _std_bounds(self):
        lb, ub = self.hyp_bounds()
        return self._hyp_to_std(lb), self._hyp_to_std(ub)

    # -- accessors mirroring GP.h:84-101 ------------------------------------
    @property
    def dim(self) -> int:
        return self._dim

    @property
    def num_hyp(self) -> int:
        return self._num_hyp

    @property
    def num_train(self) -> int:
        return int(self._x.shape[0])

    @property
    def trained(self) -> bool:
        return self._trained

    @property
    def noise_free(self) -> bool:
        return self._noise_free

    @property
    def train_in(self):
        return self._x

    @property
    def train_out(self):
        return self._y

    @property
    def dtype(self):
        return self._dtype

    def get_hyp(self):
        return np.asarray(self._hyps)

    def set_fixed(self, flag: bool):
        self._fixhyps = bool(flag)

    def _invalidate_closures(self):
        self._ms_fun = None
        self._obj_fun = None

    def set_noise_free(self, flag: bool):
        """GP.cpp:79-84."""
        self._noise_free = bool(flag)
        self._invalidate_closures()
        if self._noise_free:
            self._noise_lb = 0.0

    def set_noise_lower_bound(self, nlb: float):
        """GP.cpp:63-78."""
        if nlb < 0:
            raise ValueError("noise lower bound must be positive")
        if self._noise_free:
            return  # reference just warns and ignores
        if nlb == 0:
            nlb = DBL_EPS
        self._noise_lb = float(nlb)

    def add_data(self, x, y):
        """Append training points and invalidate training (GP.cpp:43-55).

        NOTE (static shapes): new sizes trigger recompilation of the jitted
        stages on the next train(); for BO loops that add one point per
        iteration, construct with padded buckets or re-use shapes.
        """
        x = jnp.asarray(np.asarray(x, np.float64), self._dtype)
        y = jnp.asarray(np.asarray(y, np.float64).ravel(), self._dtype)
        if x.ndim != 2 or x.shape[1] != self._dim:
            raise ValueError("added x must be (num_added, dim)")
        self._x = jnp.concatenate([self._x, x], axis=0)
        self._y = jnp.concatenate([self._y, y], axis=0)
        self._set_standardization(np.asarray(self._y, np.float64))
        self._trained = False
        self._invalidate_closures()

    def get_default_hyps(self) -> np.ndarray:
        return default_hyps(self.kernel, self._x, self._y, self._noise_lb,
                            self._noise_free)

    def hyp_bounds(self):
        return hyp_range(self.kernel, self._x, self._y, self._noise_lb)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- subclass hooks ------------------------------------------------------
    def _nll_value(self, hyp) -> jnp.ndarray:
        """Raw scalar NLL (may be NaN/inf) for a full hyp vector."""
        raise NotImplementedError

    def _objective(self, vec, lb, ub):
        """(f, g) over the optimization vector, INF-sanitized."""
        raise NotImplementedError

    def _update_posterior(self):
        """Recompute the posterior cache from self._hyps (the _setK analog).
        May modify self._hyps (noise inflation / jitter escalation)."""
        raise NotImplementedError

    def _nll_from_posterior(self):
        """Final NLL derived from the cached posterior, or None to make
        train() fall back to a fresh nll() evaluation.  Models whose cache
        holds an N^2 factor override this for the HBM-stream regime, where
        a second full build+factor NEXT TO the live cache OOMs the chip
        (measured at N=51200 f32 on 16 GB: train()'s closing
        nll(self._hyps) RESOURCE_EXHAUSTED after an otherwise complete
        fit)."""
        return None

    # -- shared pipeline (GP.cpp:183-272 / FITC.cpp:32-108 / VFE.cpp:31-108) -
    def nll(self, hyp=None) -> float:
        """Public NLL evaluation with INF semantics."""
        if hyp is None:
            hyp = self._hyps if self._hyps is not None else self.get_default_hyps()
        v = float(self._nll_value(jnp.asarray(np.asarray(hyp), self._dtype)))
        return v if np.isfinite(v) else INF

    def select_init_hyp(self, max_eval: int, def_hyp) -> np.ndarray:
        """MVMO global search (GP.cpp:463-485): adaptive mean-variance
        mapping with archive 25 and the reference's fs 0.5 -> 20 shaping
        schedule (optim.multistart.mvmo_search), with the sn2 > mean(sf2)
        rejection installed in the objective.

        At watchdog scale (the hosted-optimizer predicate) the SAME search
        runs host-driven — one generation per device execution — because
        the fully-jitted scan is one program of ~max_eval factorizations,
        the measured worker-crash shape (optim/lbfgsb.lbfgsb_hosted)."""
        from ..optim.multistart import mvmo_search, mvmo_search_hosted

        def_hyp = jnp.asarray(self._hyp_to_std(def_hyp), self._dtype)
        lb, ub = self._std_bounds()
        lb_v = jnp.asarray(to_opt_vec(jnp.asarray(lb, self._dtype), self._noise_free))
        ub_v = jnp.asarray(to_opt_vec(jnp.asarray(ub, self._dtype), self._noise_free))
        x0_v = to_opt_vec(def_hyp, self._noise_free)

        fun = self._multistart_objective()
        search = (mvmo_search_hosted if self._use_hosted_opt()
                  else mvmo_search)
        best_v, best_f = search(
            fun, self._next_key(), lb_v, ub_v, x0_v, num=int(max_eval),
            chunk=self._multistart_chunk(),
        )
        best = from_opt_vec(best_v, self._noise_free)
        return self._hyp_from_std(np.asarray(best))

    def _multistart_chunk(self) -> int:
        # Bound peak memory: each candidate factors an (n x n) matrix.
        n = self.num_train
        budget = 2 * 10**8 / max(n * n, 1)
        return max(1, min(32, int(budget)))

    def _multistart_objective(self) -> Callable:
        raise NotImplementedError

    def _use_hosted_opt(self) -> bool:
        """True when a monolithic multi-evaluation jitted program would
        breach the remote runtime's ~60-100 s execution watchdog, so every
        optimizer/search entry must run host-driven (one device execution
        per objective evaluation).  Overridden per model with a measured
        threshold (GP: the stream regime; sparse: N*M^2 work units)."""
        return False

    def _warm_start_hyps(self):
        """Optional model-specific recovery start tried before the noise
        rescue when the initial probe is INF (None = skip)."""
        return None

    def train(self, init_hyps=None) -> float:
        """MLE fit; returns the final NLL (GP::train contract)."""
        used_defaults = init_hyps is None
        if init_hyps is None:
            init_hyps = self.get_default_hyps()
        hyps = np.array(np.asarray(init_hyps), np.float64)
        if self._noise_free:
            hyps[-2] = -np.inf

        # MYDEBUG parity: the reference runs the analytic-vs-FD gradient
        # check at every train start under its debug build (GP.cpp:224-229,
        # FITC.cpp:66-73, VFE.cpp:65-72)
        from .. import config as _config
        if _config.DEBUG or os.environ.get("GP_TPU_DEBUG", "0") == "1":
            g, fd, rel = self.check_gradients(hyps)
            print(f"[GP_TPU_DEBUG] train-start gradient check: "
                  f"rel_err={rel:.3e}", file=sys.stderr)
            if not np.isfinite(rel) or rel > 1e-2:
                print(f"[GP_TPU_DEBUG]   analytic={g}\n"
                      f"[GP_TPU_DEBUG]   numeric ={fd}", file=sys.stderr)

        nlz = self.nll(hyps)
        if not np.isfinite(nlz) or used_defaults:
            # model-specific warm start (GP: the subset MLE at HBM scale),
            # consulted when the probe is INF — the noise-inflation rescue
            # below keeps the start's length scales but parks the noise at
            # the f32 conditioning cliff — AND when the caller entered
            # with plain defaults: the default start is a measured local
            # trap at large N (N=51200 round 3: optimizer stalls at
            # -0.26 nats/pt from defaults vs -0.76 from the subset start;
            # held-out RMSE 0.665 noise-basin cold in round 2 vs 0.105).
            # The better-probing start wins; an explicit user init is
            # never overridden while finite.
            warm = self._warm_start_hyps()
            if warm is not None:
                v = self.nll(warm)
                if np.isfinite(v) and (not np.isfinite(nlz) or v < nlz):
                    hyps, nlz = np.asarray(warm, np.float64), v
        if not np.isfinite(nlz) and not self._noise_free:
            # START-POINT noise rescue: inflate log_sn by log sqrt(10)
            # steps (the _setK recovery schedule, GP.cpp:431-440) before
            # discarding the start.  In f32 at large N a small-noise
            # start can be non-SPD purely numerically (the reference
            # never hits this — f64), and falling straight into the
            # random global search would throw away the start's length
            # scales.  The line search's INF-rejection keeps later
            # iterates feasible.
            trial = hyps.copy()
            for _ in range(16):
                trial[-2] = (np.log(DBL_EPS) if np.isinf(trial[-2])
                             else trial[-2] + 0.5 * np.log(10.0))
                v = self.nll(trial)
                if np.isfinite(v):
                    hyps, nlz = trial, v
                    break
        if not np.isfinite(nlz):
            hyps = self.select_init_hyp(self._num_hyp * 50, hyps)

        self._hyps = jnp.asarray(hyps, self._dtype)
        if self._fixhyps:
            self._update_posterior()
            self._trained = True
            v = self._nll_from_posterior()
            return v if v is not None else self.nll(self._hyps)

        # optimize in the standardized space (float32-conditioning; the
        # optimizer state stays in the model dtype — a float64-state /
        # float32-objective mix lets the line search accept steps at the
        # f32 noise floor, which poisons the curvature history)
        hyps_std = self._hyp_to_std(hyps)
        lb, ub = self._std_bounds()
        lb_v = np.asarray(to_opt_vec(jnp.asarray(lb), self._noise_free))
        ub_v = np.asarray(to_opt_vec(jnp.asarray(ub), self._noise_free))
        vec0 = np.clip(
            np.asarray(to_opt_vec(jnp.asarray(hyps_std), self._noise_free)),
            lb_v, ub_v)

        res = self._run_local_opt(
            jnp.asarray(vec0, self._dtype),
            jnp.asarray(lb_v, self._dtype),
            jnp.asarray(ub_v, self._dtype),
        )
        # diagnostics (explain_result): report f in ORIGINAL units
        # (NLL_orig = NLL_std + N log sigma)
        self.last_opt_result = res._replace(
            f=res.f + self.num_train * float(np.log(self._y_sigma)))
        self._hyps = jnp.asarray(self._hyp_from_std(
            np.asarray(from_opt_vec(res.x, self._noise_free), np.float64)),
            self._dtype)

        self._update_posterior()
        self._trained = True
        v = self._nll_from_posterior()
        return v if v is not None else self.nll(self._hyps)

    def _run_local_opt(self, vec0, lb_v, ub_v):
        raise NotImplementedError

    def _objective_closure(self) -> Callable:
        """fun(vec) -> (f, g) over the optimization vector (for multi-start)."""
        raise NotImplementedError

    def train_multistart(self, n_starts: int = 8, init_hyps=None) -> float:
        """Multi-start MLE: n_starts bounded L-BFGS runs — the default start
        plus uniform random ones — executed as ONE vmapped program (each
        optimizer iteration factors n_starts kernel matrices in a single
        batched MXU call).  Keeps the best finite optimum.

        This is the TPU-native upgrade over the reference's single local
        SLSQP run: GP marginal likelihoods are multi-modal (e.g. the
        noise-only attractor), and restarts are nearly free when batched.
        On a device mesh the restarts shard across chips
        (gp_tpu.parallel.pmultistart).

        At watchdog scale (the hosted-optimizer predicate) the starts run
        sequentially through the host-driven optimizer instead — the
        vmapped n_starts x max_evals monolith is the measured
        worker-crash shape, and one evaluation already fills the chip.
        """
        from ..optim.multistart import (multistart_lbfgsb,
                                        multistart_lbfgsb_hosted)

        if init_hyps is None:
            init_hyps = self.get_default_hyps()
        hyps = np.array(np.asarray(init_hyps), np.float64)
        if self._noise_free:
            hyps[-2] = -np.inf

        hyps_std = self._hyp_to_std(hyps)
        lb, ub = self._std_bounds()
        lb_v = jnp.asarray(to_opt_vec(jnp.asarray(lb, self._dtype), self._noise_free))
        ub_v = jnp.asarray(to_opt_vec(jnp.asarray(ub, self._dtype), self._noise_free))
        vec0 = jnp.clip(
            to_opt_vec(jnp.asarray(hyps_std, self._dtype), self._noise_free),
            lb_v, ub_v)

        fun = self._objective_closure()
        runner = (multistart_lbfgsb_hosted if self._use_hosted_opt()
                  else multistart_lbfgsb)
        res = runner(fun, self._next_key(), lb_v, ub_v, vec0,
                     n_starts=n_starts, max_evals=self._MAX_EVAL)
        self._hyps = jnp.asarray(self._hyp_from_std(
            np.asarray(from_opt_vec(res.x, self._noise_free), np.float64)),
            self._dtype)
        self._update_posterior()
        self._trained = True
        return self.nll(self._hyps)

    def check_gradients(self, hyp=None, eps: float = 1e-3):
        """Analytic-vs-finite-difference NLL gradient check
        (GP::_likelihood_gradient_checking, GP.cpp:486-507; run under
        MYDEBUG at train start in the reference).  Returns
        (analytic, numeric, rel_err) as numpy arrays / float."""
        import jax

        if hyp is None:
            hyp = self._hyps if self._hyps is not None else \
                self.get_default_hyps()
        hyp = np.asarray(hyp, np.float64)

        fun = self._objective_closure()
        v = jnp.asarray(to_opt_vec(jnp.asarray(self._hyp_to_std(hyp)),
                                   self._noise_free), self._dtype)
        _, g = fun(v)
        g = np.asarray(g, np.float64)

        fd = np.zeros_like(g)
        for i in range(g.shape[0]):
            e = np.zeros_like(g)
            e[i] = eps
            fp, _ = fun(jnp.asarray(v + e, self._dtype))
            fm, _ = fun(jnp.asarray(v - e, self._dtype))
            fd[i] = (float(fp) - float(fm)) / (2 * eps)
        denom = np.linalg.norm(fd) + 1e-300
        rel = float(np.linalg.norm(g - fd) / denom)
        return g, fd, rel

    # -- checkpoint / resume (new capability; reference persists nothing) ----
    def save(self, path: str) -> None:
        """Serialize model + posterior cache to an .npz checkpoint."""
        from ..utils.checkpoint import save_model
        save_model(self, path)

    @staticmethod
    def load(path: str):
        """Restore a model saved by `save` (no refactorization needed)."""
        from ..utils.checkpoint import load_model
        return load_model(path)

    # -- shared prediction surface (GP.h:104-119) ----------------------------
    # Subclasses implement the batch_* methods; the scalar wrappers
    # (GP.cpp:335-403) are shared.

    def _require_trained(self):
        if not self._trained:
            raise RuntimeError("model is not trained; call train() first")
        if (self._post is None
                and getattr(self, "_post_dist", None) is None
                and getattr(self, "_post_dist_pending", None) is not None):
            raise RuntimeError(
                "checkpoint carries a distributed posterior; call "
                "restore_distributed(mesh) before serving")

    def _as_batch(self, xs):
        xs = jnp.asarray(np.asarray(xs, np.float64), self._dtype)
        if xs.ndim == 1:
            xs = xs[None, :]
        if xs.shape[1] != self._dim:
            raise ValueError(f"test points must have dim {self._dim}")
        return xs

    def predict_y(self, xs) -> float:
        return float(self.batch_predict_y(xs)[0])

    def predict_s2(self, xs) -> float:
        return float(self.batch_predict_s2(xs)[0])

    def predict(self, xs):
        y, s2 = self.batch_predict(xs)
        return float(y[0]), float(s2[0])

    def predict_y_with_grad(self, xs):
        y, g = self.batch_predict_y_with_grad(xs)
        return float(y[0]), g[0]

    def predict_s2_with_grad(self, xs):
        s2, g = self.batch_predict_s2_with_grad(xs)
        return float(s2[0]), g[0]

    def predict_with_grad(self, xs):
        y, gy = self.predict_y_with_grad(xs)
        s2, gs2 = self.predict_s2_with_grad(xs)
        return y, s2, gy, gs2
