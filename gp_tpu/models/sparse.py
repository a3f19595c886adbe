"""Shared machinery for the sparse inducing-point models (FITC / VFE).

Reference: FITC.{h,cpp}, VFE.{h,cpp}.  Both models inherit the GP pipeline,
hold an inducing set U (defaulting to the full training set, FITC.cpp:12-13)
and a jitter that starts at (0.1 * noise_lb)^2 at train time (FITC.cpp:27-31)
and doubles on SPD failure in the posterior-cache step.

Neither model supports noise-free mode (FITC.cpp:36-40, VFE.cpp:35-39):
train() silently switches it off, as the reference does.
"""

from __future__ import annotations

import os
import warnings

import jax.numpy as jnp
import numpy as np

from .base import GPBase

# ---------------------------------------------------------------------------
# N*M HBM envelope (VERDICT r3 item 6)
#
# The sparse objectives materialize dense (N, M) panels: Kxu, the TRSM
# V = Luu^-1 Kux, the Gamma-weighted (Kxu^T * inv_gamma) operand, and —
# under value_and_grad — a reverse-pass cotangent for each.  Counting the
# forward panels (3) + their cotangents (3) + XLA scratch for the two
# (M,N)@(N,M) GEMM operands gives ~8 live (N, M) buffers at peak; the
# (N,) and (M, M) terms are negligible next to them.  At the proven
# scale (N=102400, M=512, f64: 8*N*M*8 = 3.4 GB) this fits one v5e's
# 16 GB HBM with room; the guard makes the NEXT jump (N=1M, M=512 ->
# 33 GB estimated peak) fail loud at the wrapper instead of OOMing
# mid-fit.  Budget default: 12 GiB usable of one v5e's 16 GB HBM,
# overridable via GP_TPU_HBM_BYTES (e.g. for CPU-f64 runs with big RAM).
# Remedies on trip: shard rows over a mesh (train_distributed divides
# the panel N by the device count) or reduce M.
# ---------------------------------------------------------------------------

SPARSE_PANEL_FACTOR = 8


def hbm_budget_bytes() -> int:
    return int(os.environ.get("GP_TPU_HBM_BYTES", 12 * 2 ** 30))


def check_nm_envelope(n: int, m: int, itemsize: int, n_dev: int = 1) -> None:
    """Refuse sparse-model work whose estimated peak (N, M)-panel
    footprint exceeds the per-device HBM budget (fail loud, not
    OOM-mid-fit — the N*M analog of pchol.check_shard_addressable)."""
    peak = SPARSE_PANEL_FACTOR * n * m * itemsize // max(n_dev, 1)
    budget = hbm_budget_bytes()
    if peak > budget:
        max_n = budget * max(n_dev, 1) // (SPARSE_PANEL_FACTOR * m * itemsize)
        raise ValueError(
            f"sparse-model (N, M) working set estimate "
            f"{peak / 2**30:.1f} GiB/device (N={n}, M={m}, "
            f"itemsize={itemsize}, {n_dev} device(s), "
            f"~{SPARSE_PANEL_FACTOR} live panels) exceeds the "
            f"{budget / 2**30:.1f} GiB HBM budget; shard rows over more "
            f"devices (train_distributed), reduce M, or raise "
            f"GP_TPU_HBM_BYTES (max N at this M and device count: "
            f"{max_n})")


class SparseGPBase(GPBase):
    """Sparse models default to float64 COMPUTE on every backend.

    The FITC Gamma term divides the Nystrom residual sf2 - diag(Kxu Kuu^-1
    Kux) by sn2: for inducing points at/near data points the residual is an
    exact cancellation, and in float32 its rounding noise (~1e-5 relative)
    swamps small noise variances — the objective and gradient turn to
    garbage and the optimizer stalls (measured).  The sparse objectives are
    only O(N M^2), so float64 — ~150 ms/eval at N=8000, M=512 even on TPU's
    emulated f64 — is affordable; the exact GP keeps float32 + blocked-MXU
    Cholesky where f64 would be ruinous.  Pass dtype="float32" explicitly
    to override (safe when sn2/var(y) >> 1e-5).
    """

    def __init__(self, train_x, train_y, kernel="se_ard", dtype=None, seed=0,
                 solver="chol"):
        if dtype is None:
            from ..config import x64_enabled
            dtype = "float64" if x64_enabled() else None
        super().__init__(train_x, train_y, kernel=kernel, dtype=dtype,
                         seed=seed, solver=solver)
        self._u = self._x            # inducing default: full training set
        self._jitter_u = (0.1 * self._noise_lb) ** 2

    @property
    def num_inducing(self) -> int:
        return int(self._u.shape[0])

    @property
    def inducing(self):
        return self._u

    def set_inducing(self, u):
        """FITC::set_inducing (FITC.cpp:22-26)."""
        u = jnp.asarray(np.asarray(u, np.float64), self._dtype)
        if u.ndim != 2 or u.shape[1] != self._dim:
            raise ValueError(f"inducing points must be (M, {self._dim})")
        self._u = u
        self._trained = False
        self._invalidate_closures()

    @property
    def _jitter_std(self):
        """Jitter in the standardized-y space: Kuu scales by 1/sigma^2."""
        return self._jitter_u / (self._y_sigma ** 2)

    def _reset_jitter(self):
        """FITC::_init (FITC.cpp:27-31): jitter re-derived at train start."""
        self._jitter_u = (0.1 * self._noise_lb) ** 2

    def _use_hosted_opt(self) -> bool:
        """Route the fit through the host-driven optimizer when the
        monolithic jitted 130/150-eval program would breach the remote
        runtime's ~60-100 s execution watchdog (the same wall the exact
        model hits at stream-scale N; measured here: the N=102400 M=512
        FITC fit CRASHED the TPU worker mid-train).  One f64 sparse eval
        is ~150 ms at N*M^2 = 2.1e9 (N=8000, M=512), so past ~2^32 work
        units the 130-eval program exceeds ~40 s and the fit must run
        one device program per evaluation instead."""
        return self.num_train * self.num_inducing ** 2 > 2 ** 32

    def _run_local_opt_guarded(self, fit_fn, vec0, lb_v, ub_v):
        if self._use_hosted_opt():
            from ..optim.lbfgsb import lbfgsb_hosted
            return lbfgsb_hosted(self._objective_closure(), vec0, lb_v,
                                 ub_v, max_evals=self._MAX_EVAL)
        return fit_fn()

    def _check_envelope(self, n_dev: int = 1) -> None:
        check_nm_envelope(self.num_train, self.num_inducing,
                          jnp.dtype(self._dtype).itemsize, n_dev)

    def train(self, init_hyps=None) -> float:
        if self._noise_free:
            warnings.warn(f"{type(self).__name__} can't be noise free; "
                          "disabling noise-free mode (reference behavior)")
            self._noise_free = False  # FITC.cpp:36-40: flag off, noise_lb kept
        self._check_envelope()
        self._reset_jitter()
        self._invalidate_closures()  # cached closures capture the jitter
        return super().train(init_hyps)

    def train_distributed(self, mesh, init_hyps=None) -> float:
        """MLE fit with training rows sharded over `mesh` axis "rows"
        (parallel/psparse.py): per-chip (n_loc, M) panels + psum reductions.
        The posterior cache comes back replicated (M-sized), so every
        predict API works unchanged afterwards."""
        import warnings as _w

        from ..parallel import psparse
        from .base import to_opt_vec

        if self._noise_free:
            _w.warn(f"{type(self).__name__} can't be noise free; "
                    "disabling noise-free mode (reference behavior)")
            self._noise_free = False
        self._check_envelope(n_dev=mesh.shape["rows"])
        self._reset_jitter()
        self._invalidate_closures()

        if init_hyps is None:
            init_hyps = self.get_default_hyps()
        hyps = np.array(np.asarray(init_hyps), np.float64)

        hyps_std = self._hyp_to_std(hyps)
        lb, ub = self._std_bounds()
        lb_v = jnp.asarray(to_opt_vec(jnp.asarray(lb, self._dtype), False))
        ub_v = jnp.asarray(to_opt_vec(jnp.asarray(ub, self._dtype), False))
        vec0 = jnp.clip(jnp.asarray(hyps_std, self._dtype), lb_v, ub_v)

        model = type(self).__name__.lower()
        res = psparse.pfit_sparse(
            model, self.kernel, False, self._x, self._ys, self._u,
            jnp.asarray(self._jitter_std, self._dtype), vec0, lb_v, ub_v,
            mesh, max_evals=self._MAX_EVAL)
        # optimizer diagnostics in ORIGINAL units (mirror GPBase.train /
        # GP.train_distributed: NLL_orig = NLL_std + N log sigma_y)
        self.last_opt_result = res._replace(
            f=res.f + self.num_train * float(np.log(self._y_sigma)))
        self._hyps = jnp.asarray(self._hyp_from_std(np.asarray(res.x)),
                                 self._dtype)

        Luu, LA, alpha, jitter, ok = psparse.pset_k_sparse(
            model, self.kernel, self._hyps, self._x, self._y, self._u,
            jnp.asarray(self._jitter_u, self._dtype), mesh)
        if not bool(np.asarray(ok)):
            raise RuntimeError(
                "sparse distributed posterior factorization failed after "
                "jitter escalation (psparse.pset_k_sparse exhausted "
                "max_tries); refusing to cache a NaN posterior")
        self._jitter_u = float(jitter)
        self._post = (Luu, LA, alpha)
        self._trained = True
        return float(psparse.pnll_sparse(
            model, self.kernel, self._hyps, self._x, self._y, self._u,
            jnp.asarray(self._jitter_u, self._dtype), mesh))

    def train_multistart(self, n_starts: int = 8, init_hyps=None) -> float:
        if self._noise_free:
            warnings.warn(f"{type(self).__name__} can't be noise free; "
                          "disabling noise-free mode (reference behavior)")
            self._noise_free = False
        self._check_envelope()
        self._reset_jitter()
        self._invalidate_closures()
        return super().train_multistart(n_starts=n_starts, init_hyps=init_hyps)
