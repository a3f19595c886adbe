"""Exact Gaussian-process regression (reference: GP.{h,cpp}).

Functional core + a thin class wrapper.  Differences from the reference are
all TPU-idiomatic re-designs, not behavior changes:

  * NLL = 0.5(r^T alpha + log|K| + N log 2pi) on one Cholesky
    (GP.cpp:120-176); the 50-line analytic gradient block (GP.cpp:151-171)
    is jax.value_and_grad.
  * SPD checking is "Cholesky produced finite diagonal" + the reference's
    noise-inflation rescue loop (GP.cpp:423-461) as lax.while_loop —
    replacing the O(N^3) eigendecomposition check (SURVEY.md section 3.5).
  * NLOPT SLSQP -> bounded L-BFGS (optim.lbfgsb), MVMO -> vectorized random
    search (optim.multistart).
  * Prediction input-gradients (GP.cpp:284-296) via jax.grad w.r.t. the test
    point, vmapped over the batch — which also fixes the reference's
    batch-with-gradients latent bug (SURVEY.md section 2.4-2.6 quirk note).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from ..config import INF
from ..ops.kernels import KernelSpec, get_k_noise
from ..ops.solvers import CHOL, SolverSpec
from ..optim.lbfgsb import lbfgsb_impl
from .base import (GPBase, debug_decomp_enabled, debug_print_nll_decomp,
                   from_opt_vec, hyp_mean, hyp_sn2,
                   sanitize_value_and_grad, to_opt_vec)


# Row count from which the memory-streamed objective / posterior paths
# take over from the K^-1-materializing ones (the latter OOM a 16 GB chip
# around here; see nll_vg_streamed / set_k_streamed).
_STREAM_MIN_N = 32768

# Per-device work units (N^3 / P) above which train_distributed drives the
# optimizer from the host (pgp.pfit_hosted) instead of the monolithic
# jitted pfit — ~0.5 s/eval, where a 160-eval single execution approaches
# the remote runtime's ~60-100 s watchdog.
_DIST_HOSTED_WORK = 8192 ** 3


def _dense_solver_bytes(n: int, dtype) -> int:
    """Estimated live HBM of the dense non-chol (QR) objective at N=n:
    the K build (two transient N^2 buffers) plus Q and R — ~4 N^2 words.
    Gates the stream-scale guard so big-RAM backends (CPU f64 hosts) can
    opt back in via GP_TPU_HBM_BYTES (models/sparse.hbm_budget_bytes)."""
    return 4 * n * n * jnp.dtype(dtype).itemsize


# --------------------------------------------------------------------------
# Pure functions
# --------------------------------------------------------------------------

def nll_raw(kernel: KernelSpec, hyp, x, y, solver: SolverSpec = CHOL):
    """Negative log marginal likelihood; NaN/inf propagate (sanitize outside).

    GP::_calcNegLogProb (GP.cpp:120-148).  `solver` is the pluggable
    MatrixSolver strategy (ops/solvers.py): CHOL fails (-> INF) on
    indefinite K, QR computes log|det| like the reference's QR path.
    """
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    mean = hyp_mean(hyp)
    n = x.shape[0]
    r = y - mean
    if solver.name != "chol" and n >= _STREAM_MIN_N:
        # trace-time guard: the dense get_k_noise build below holds two
        # N^2 buffers — the measured-OOM shape on one chip at stream
        # scale.  Only the chol strategy has a streamed/slabbed build
        # (MatrixSolver.cpp:31-53 QR parity holds below this threshold).
        # Gated on the estimated footprint vs the HBM/RAM budget so
        # backends where the dense build fits (CPU f64, big-RAM hosts)
        # can opt back in with GP_TPU_HBM_BYTES.
        from .sparse import hbm_budget_bytes
        if _dense_solver_bytes(n, x.dtype) > hbm_budget_bytes():
            raise NotImplementedError(
                f"solver '{solver.name}' is unsupported at N={n} >= "
                f"{_STREAM_MIN_N} (estimated dense footprint "
                f"{_dense_solver_bytes(n, x.dtype)} B exceeds the "
                f"{hbm_budget_bytes()} B budget); use the 'chol' solver, "
                f"whose build streams/slabs at this scale, or raise "
                f"GP_TPU_HBM_BYTES on a backend where the dense build fits")
    if solver.name == "chol" and n >= _STREAM_MIN_N:
        # HBM-bound N: build + factor at ~1x N^2 peak (streamed/slabbed);
        # the dense K build below holds two N^2 buffers — measured OOM
        from ..ops.chol import chol_logdet, chol_solve
        L = _factor_k_noise(kernel, chyp, x, sn2, tile=2048)
        alpha = chol_solve(L, r)
        data_fit = 0.5 * jnp.dot(r, alpha)
        half_logdet = 0.5 * chol_logdet(L)
        norm_const = 0.5 * n * jnp.log(2 * jnp.pi)
        if debug_decomp_enabled():
            debug_print_nll_decomp("nll", nlz=data_fit + half_logdet
                                   + norm_const, data_fit=data_fit,
                                   half_logdet=half_logdet,
                                   norm_const=norm_const)
        return data_fit + half_logdet + norm_const
    K = get_k_noise(kernel)(chyp, sn2, x, n)  # fused single-pass build
    f = solver.factor(K)
    alpha = solver.solve(f, r)
    data_fit = 0.5 * jnp.dot(r, alpha)
    half_logdet = 0.5 * solver.logdet(f)
    norm_const = 0.5 * n * jnp.log(2 * jnp.pi)
    if debug_decomp_enabled():
        # per-eval decomposition (MYDEBUG parity: GP.cpp:144-146)
        debug_print_nll_decomp("nll", nlz=data_fit + half_logdet
                               + norm_const, data_fit=data_fit,
                               half_logdet=half_logdet,
                               norm_const=norm_const)
    return data_fit + half_logdet + norm_const


@partial(jax.jit, static_argnames=("kernel", "solver"))
def nll(kernel: KernelSpec, hyp, x, y, solver: SolverSpec = CHOL):
    v = nll_raw(kernel, hyp, x, y, solver)
    return jnp.where(jnp.isfinite(v), v, INF)


def nll_vg_raw(kernel: KernelSpec, hyp, x, y):
    """NLL + analytic hyperparameter gradient via the explicit inverse
    (GP::_calcNegLogProb with gradients, GP.cpp:120-176):

        Q = K^-1 - alpha alpha^T
        g_cov_i = 0.5 sum(Q o dK/dtheta_i)   (one vjp of the K builder)
        g_noise = sn2 tr(Q);  g_mean = -sum(alpha)

    The reference computes `inverse()` per evaluation (GP.cpp:154); here
    K^-1 comes from the GEMM-rich blocked tri-inversion
    (ops/blocked.spd_inv_from_chol), which on TPU beats reverse-mode AD
    through the factorization (AD backward measured at 2.7x the forward).
    NaN/inf propagate (caller sanitizes).  Cholesky-only.
    """
    from ..ops.blocked import spd_inv_from_chol
    from ..ops.chol import chol_logdet, cholesky

    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    mean = hyp_mean(hyp)
    n = x.shape[0]

    from ..ops import chol as chol_mod
    blk = chol_mod._block_for(n)
    # the kernel-and-noise build is ONE fused pass (KernelSpec.k_noise):
    # any separate diagonal op on the built K costs a full N^2 pass on the
    # opaque custom-call output (see pallas_kernels._se_tile_kernel_diag)
    build = lambda c, s2: get_k_noise(kernel)(c, s2, x, n)
    if chol_mod._use_blocked(n) and n % blk:
        if kernel.far_pad_ok:
            # capacity path: decoy rows whose covariances underflow to
            # exact zero (exponential-decay families: SE + Matern —
            # KernelSpec.far_pad_ok) — every op runs at the panel
            # multiple with no pad/slice/layout conversions (measured
            # ~4 ms/eval at N=8000)
            return _nll_vg_far_padded(kernel, hyp, x, y, blk)
        # non-SE kernels: pad ONCE to the panel multiple and keep the
        # factor padded through logdet (pad diag = 1 contributes 0) and
        # the lauum inverse (pad block of K^-1 is I) — letting cholesky
        # and spd_inv each pad adds a full-matrix pad + slice-back pair
        # (~1.6 ms at N=8000 f32, v5e)
        from ..ops.blocked import blocked_cholesky
        K, k_vjp = jax.vjp(build, chyp, sn2)
        p = blk - n % blk
        Kp = jnp.zeros((n + p, n + p), K.dtype).at[:n, :n].set(K)
        Kp = Kp.at[jnp.arange(n, n + p), jnp.arange(n, n + p)].set(1.0)
        L, Td = blocked_cholesky(Kp, block=blk, zero_upper=False,
                                 return_diag_inv=True)
        Kinv = spd_inv_from_chol(L, block=blk, diag_inv=Td)[:n, :n]
    elif chol_mod._use_blocked(n):
        # aligned blocked path: reuse the factorization's own diagonal
        # inverses for T = L^-1 (skips the InvertDiagBlocks re-inversion)
        from ..ops.blocked import blocked_cholesky
        K, k_vjp = jax.vjp(build, chyp, sn2)
        L, Td = blocked_cholesky(K, block=blk, zero_upper=False,
                                 return_diag_inv=True)
        Kinv = spd_inv_from_chol(L, block=blk, diag_inv=Td)
    else:
        K, k_vjp = jax.vjp(build, chyp, sn2)
        # zero_upper=False: everything downstream (tri_inv strips, logdet
        # diagonal) reads only the lower triangle
        L = cholesky(K, zero_upper=False)
        Kinv = spd_inv_from_chol(L)
    r = y - mean
    # alpha from the (already needed) explicit inverse: one O(N^2) matvec
    # replaces the two blocked triangular sweeps of chol_solve
    alpha = Kinv @ r
    nll = (0.5 * jnp.dot(r, alpha) + 0.5 * chol_logdet(L)
           + 0.5 * n * jnp.log(2 * jnp.pi))
    if debug_decomp_enabled():
        debug_print_nll_decomp("nll_vg", nlz=nll,
                               data_fit=0.5 * jnp.dot(r, alpha),
                               half_logdet=0.5 * chol_logdet(L),
                               norm_const=0.5 * n * jnp.log(2 * jnp.pi))
    if kernel.k_noise_vjp_q is not None:
        # structured contraction: no N^2 Q buffer (see KernelSpec field)
        g_cov_t, g_sn2 = kernel.k_noise_vjp_q(chyp, sn2, x, n, K, Kinv,
                                              alpha)
    else:
        Q = Kinv - alpha[:, None] * alpha[None, :]
        g_cov_t, g_sn2 = k_vjp(Q)
    g_cov = 0.5 * g_cov_t
    g_sn = sn2 * g_sn2        # = sn2 (tr(Kinv) - a^T a), via the vjp
    g_mean = -jnp.sum(alpha)
    grad = jnp.concatenate(
        [g_cov, jnp.stack([g_sn, g_mean]).astype(g_cov.dtype)])
    return nll, grad


def _nll_vg_far_padded(kernel: KernelSpec, hyp, x, y, blk: int):
    """nll_vg_raw at the next panel-multiple capacity via FAR DECOY rows.

    When N is not a multiple of the panel width, every blocked op pays a
    pad + slice-back + layout-conversion set (~4 ms/eval at N=8000 f32 on
    v5e).  Instead, append n_pad decoy inputs placed so far from the data
    (and from each other) that every SE cross-covariance UNDERFLOWS TO
    EXACTLY ZERO in the compute dtype: the padded system is exactly
    block-diagonal [K, sf2*I], and the whole pipeline (fused K build,
    blocked Cholesky, tri_inv, lauum inverse, VJP contraction) runs
    pad-free at the aligned capacity.  The padded objective differs from
    the true NLL only by the analytic decoy terms, corrected exactly:

        logdet(K~) = logdet(K) + n_pad*log(sf2)      -> subtract
        tr(K~^-1)  = tr(K^-1)  + n_pad/sf2           -> subtract in g_sn
        decoy-diagonal cotangent (dk(p,p)/dlog_sf = 2 sf2) -> zeroed by an
        O(n_pad) scatter on Q before the kernel VJP (which also kills the
        catastrophic a^2*rowsum cancellation at decoy magnitudes)

    Decoy geometry: decoy i sits on axis (i mod d) at big_j*(1 + i//d)
    with big_j = 1e4*(2*max|x_j| + 1) — >= ~140x the largest in-bounds
    length scale (cov_hyp_range caps l at ~70*span, CovSEard.cpp:41-71),
    so the scaled squared distance is >= ~2e4 (f32 exp underflows below
    -103) and <= ~1e20 (no overflow).  The decoy diagonal k(p,p) is set
    to sf2 by an O(n_cap) scatter — the kernel's quadratic-expansion
    sqdist is noisy at decoy magnitudes, so the build's own diagonal
    cannot be trusted there.  SE-family kernels only (exponential decay;
    RQ decays polynomially and does not underflow).
    """
    from ..ops.blocked import blocked_cholesky, spd_inv_from_chol
    from ..ops.chol import chol_logdet

    n, d = x.shape
    nc = kernel.num_hyp(d)
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    mean = hyp_mean(hyp)
    log_sf2 = 2.0 * chyp[nc - 1]
    sf2 = jnp.exp(log_sf2)
    n_pad = blk - n % blk
    n_cap = n + n_pad

    big = 1e4 * (2.0 * jnp.max(jnp.abs(x), axis=0) + 1.0)       # (d,)
    i = jnp.arange(n_pad)
    pads = jnp.zeros((n_pad, d), x.dtype).at[i, i % d].set(
        big[i % d] * (1.0 + (i // d).astype(x.dtype)))
    x_cap = jnp.concatenate([x, pads], axis=0)

    # single-pass build: the noise diagonal (and the exact decoy diag sf2)
    # is written inside the kernel tiles — a post-hoc diagonal scatter on
    # the opaque custom-call output costs a full N^2 kCustom pass plus
    # layout repairs (measured 2.3 ms at this N, ~9% of the objective)
    ids = jnp.arange(n_cap)
    real = ids < n
    build = lambda c, s2: get_k_noise(kernel)(c, s2, x_cap, n)
    K, k_vjp = jax.vjp(build, chyp, sn2)

    L, Td = blocked_cholesky(K, block=blk, zero_upper=False,
                             return_diag_inv=True)
    Kinv = spd_inv_from_chol(L, block=blk, diag_inv=Td)
    r = jnp.where(real, jnp.concatenate([y, jnp.zeros(n_pad, y.dtype)])
                  - mean, 0.0)
    alpha = Kinv @ r
    nll = (0.5 * jnp.dot(r, alpha)
           + 0.5 * (chol_logdet(L) - n_pad * log_sf2)
           + 0.5 * n * jnp.log(2 * jnp.pi))

    if kernel.k_noise_vjp_q is not None:
        # structured contraction: no N^2 Q buffer, decoy-diagonal zeroing
        # handled by exact-zero bookkeeping (see KernelSpec field).
        # K staying live for this read costs one defensive full-matrix
        # copy before the in-place factorization (0.8 ms at N=8192 f32);
        # a second build for the backward gets CSE'd back into one call
        # (measured: identical trace), so the copy is the honest price.
        g_cov_t, g_sn2 = kernel.k_noise_vjp_q(chyp, sn2, x_cap, n, K,
                                              Kinv, alpha)
    else:
        # pad-diag zeroing folded into the Q fusion (a scatter would copy
        # the whole N^2 buffer) — also the k_noise cotangent contract
        pad_diag = (ids[:, None] == ids[None, :]) & (ids[:, None] >= n)
        Q = jnp.where(pad_diag, 0.0,
                      Kinv - alpha[:, None] * alpha[None, :])
        g_cov_t, g_sn2 = k_vjp(Q)
    g_cov = 0.5 * g_cov_t
    # d sn2/d log_sn = 2 sn2, and the 0.5 of the Q contraction:
    # g_sn = sn2 * sum_real(Q_ii) — identical to the explicit
    # sn2 (tr(Kinv) - n_pad/sf2 - a^T a) this replaces (decoy alpha = 0)
    g_sn = sn2 * g_sn2
    g_mean = -jnp.sum(alpha)
    grad = jnp.concatenate(
        [g_cov, jnp.stack([g_sn, g_mean]).astype(g_cov.dtype)])
    return nll, grad


def _build_k_noise_tiled(kernel: KernelSpec, chyp, x, sn2, tile: int):
    """K = k(X, X) + sn2 I built row-panel by row-panel into ONE carry.

    `kernel.k(chyp, x, x) + sn2 I` as separate ops peaks at two live N^2
    buffers (the kernel output — plus a layout copy when it is a Pallas
    call — and the noise-add fusion's output): 19.6 GB at N=51200 f32,
    measured OOM on the 16 GB v5e.  Streaming (tile, N) panels through a
    lax.scan carry keeps the build at one N^2 buffer + O(tile N) temps,
    with the diagonal noise fused into each panel via an iota mask."""
    n = x.shape[0]
    if n % tile or n <= tile:
        from ..ops.blocked import add_diag
        return add_diag(kernel.k(chyp, x, x), sn2)

    col = jnp.arange(n)

    # Python-unrolled (NOT lax.scan): a scan pins the carry to the default
    # row-major layout while the downstream Cholesky's custom-calls demand
    # column-major, so XLA inserts a full N^2 layout copy of the scan
    # output (second 9.77 GB buffer at N=51200 — measured OOM).  With the
    # loop unrolled, layout assignment propagates the consumer's layout
    # through the whole DUS chain and the build stays one buffer.
    K = jnp.zeros((n, n), x.dtype)
    for j in range(0, n, tile):
        x_I = jax.lax.dynamic_slice(x, (j, 0), (tile, x.shape[1]))
        rows = kernel.k(chyp, x_I, x)                     # (tile, n)
        ii = j + jnp.arange(tile)
        rows = rows + sn2 * (col[None, :] == ii[:, None]).astype(rows.dtype)
        K = jax.lax.dynamic_update_slice(K, rows, (j, 0))
    return K


def _factor_k_noise(kernel: KernelSpec, chyp, x, sn2, tile: int):
    """Build K + sn2 I and Cholesky-factor it at ~1x N^2 peak memory.

    Past the int32 single-buffer limit (N > 32768: see ops/slabbed.py —
    bigger in-place buffers silently corrupt on XLA:TPU) K lives as a
    tuple of column slabs and factors slab-in-place; downstream
    chol_solve / chol_logdet / chol_ok dispatch on the tuple type.
    """
    from ..ops.chol import cholesky
    from ..ops.slabbed import build_k_noise_slabs, use_slabs

    n = x.shape[0]
    if use_slabs(n):
        block = 2048 if n >= 2048 else 64
        slabs = build_k_noise_slabs(kernel, chyp, x, sn2, block=block)
        return cholesky(slabs)
    return cholesky(_build_k_noise_tiled(kernel, chyp, x, sn2, tile))


def _k_dot_streamed(kernel: KernelSpec, chyp, x, sn2, B, tile: int = 2048):
    """(K + sn2 I) @ B without materializing K: one kernel-build sweep,
    row-tile by row-tile (O(N^2 d) build + O(N^2 k) GEMM, O(tile*N) temps).
    """
    n, d = x.shape
    if n % tile or n <= tile:
        from ..ops.blocked import add_diag
        return add_diag(kernel.k(chyp, x, x), sn2) @ B
    outs = []
    for j in range(0, n, tile):
        x_I = jax.lax.dynamic_slice(x, (j, 0), (tile, d))
        rows = kernel.k(chyp, x_I, x)                    # (tile, n)
        outs.append(rows @ B + sn2 * jax.lax.dynamic_slice(
            B, (j, 0), (tile, B.shape[1])))
    return jnp.concatenate(outs, axis=0)


@partial(jax.jit, static_argnames=("kernel", "tile", "probes"))
def nll_refined(kernel: KernelSpec, hyp, x, y, tile: int = 2048,
                probes: int = 16, seed: int = 0):
    """High-accuracy NLL from the f32 MXU factor (mixed-precision rescue).

    A plain f32 evaluation at N~50k carries ~1e-3 relative NLL error
    (measured 47.5 nats vs the f64 oracle at N=51200): the factorization's
    rounding biases both the data fit and the log-determinant.  This
    keeps the O(N^3) on the f32 MXU and repairs both terms with O(N^2)
    work:

      * data fit: one step of iterative refinement on alpha —
        alpha += K^-1 (r - K alpha) — squares the solve's backward error;
        the final quadratic form accumulates in f64 (O(N)).
      * logdet: K = L L^T (I + E) with E = L^-1 K L^-T - I the f32
        factorization error, so logdet(K) = 2 sum log diag L + tr(E) +
        O(||E||^2).  tr(E) via Hutchinson probes: z^T E z = w^T K w - n
        with w = L^-T z, Rademacher z (z^T z = n exactly).  E is tiny, so
        the estimator's intrinsic variance is negligible; `probes` copies
        average down the f32 quadratic-form noise.

    One streamed kernel-build sweep serves the refinement residual AND
    every probe (the O(N^2 d) build is the cost; extra GEMM columns are
    nearly free).  Measured at N=51200: 47.5 -> <~1 nat vs the f64 oracle.
    """
    n, d = x.shape
    if n % tile:
        for t in (2048, 1024, 512, 256, 128, 64):
            if t < tile and n % t == 0:
                tile = t
                break
    nc = kernel.num_hyp(d)
    chyp = hyp[:nc]
    L = _factor_k_noise(kernel, chyp, x, hyp_sn2(hyp), tile)
    _, _, nll = _refined_terms(kernel, hyp, x, y, L, None, tile, probes,
                               seed)
    return nll


def _refined_terms(kernel, hyp, x, y, L, alpha0, tile, probes, seed):
    """(alpha_refined, logdet_f64, nll_refined_f64) from an f32 factor.

    One iterative-refinement step on alpha plus the Hutchinson logdet
    correction, sharing a single streamed kernel-build sweep (see
    nll_refined's docstring for the math and the measured accuracies)."""
    from ..ops.chol import chol_logdet, chol_solve

    n = x.shape[0]
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    mean = hyp_mean(hyp)
    r = y - mean

    if alpha0 is None:
        alpha0 = chol_solve(L, r)

    z = (jax.random.bernoulli(jax.random.PRNGKey(seed), 0.5, (n, probes))
         .astype(x.dtype) * 2.0 - 1.0)
    from ..ops.chol import _is_slabs
    if _is_slabs(L):
        from ..ops.slabbed import slabbed_solve_lower_t
        W = slabbed_solve_lower_t(L, z)
    else:
        from ..ops.blocked import blocked_solve_lower_t
        W = blocked_solve_lower_t(L, z)

    B = jnp.concatenate([alpha0[:, None], W], axis=1)    # (n, 1 + probes)
    V = _k_dot_streamed(kernel, chyp, x, sn2, B, tile)
    resid = r - V[:, 0]
    alpha = alpha0 + chol_solve(L, resid)
    # per-probe w^T K w - z^T z; Rademacher z^T z = n exactly.  f64
    # accumulation: the probe values are ~n with an O(eps n) signal, so
    # f32 summation noise would eat most of the correction
    tr_e = jnp.mean(jnp.einsum("nk,nk->k", W.astype(jnp.float64),
                               V[:, 1:].astype(jnp.float64))) - n
    data_fit = jnp.dot(r.astype(jnp.float64), alpha.astype(jnp.float64))
    logdet = (chol_logdet(L).astype(jnp.float64)
              + tr_e.astype(jnp.float64))
    nll = (0.5 * data_fit + 0.5 * logdet
           + 0.5 * n * jnp.log(2 * jnp.pi)).astype(jnp.float64)
    return alpha, logdet, nll


def nll_vg_streamed(kernel: KernelSpec, hyp, x, y, tile: int = 4096):
    """Memory-streamed analytic NLL+gradient for single-chip N beyond the
    K^-1-materializing path (nll_vg_raw needs ~4 N^2 buffers; this needs
    ~2: K/L plus one (N, tile) work panel).

    Per column tile I of K^-1, the cotangent rows
    Q_I = Kinv_I^T - alpha_I alpha^T are contracted IMMEDIATELY against a
    per-tile rebuild of the kernel rows k(x_I, x) via vjp — recomputing
    kernel tiles costs O(N^2 d) flops total, nothing at the O(N^3) scale.
    This is the out-of-core analog of GP.cpp:151-163's Q-contraction for
    the regime where the full-gradient working set exceeds HBM (BASELINE
    N=50k config: K alone is 10 GB f32 on a 16 GB v5e).

    K^-1 columns come from T = L^-1 (inverted ONCE, slab-in-place, n^3/3)
    as Kinv_I = T^T @ T[:, I] — one plain GEMM per tile (n^2 b), total
    1.67 n^3 FLOPs vs 2.33 n^3 for the two full triangular-solve sweeps
    per tile this replaces, and GEMMs schedule on the MXU far better than
    the sequential blocked TRSMs.  tr(K^-1) = ||T||_F^2 falls out free.
    The TRSM form survives as the fallback when no tile divides n.
    """
    from ..ops.chol import chol_logdet, chol_solve

    n, d = x.shape
    # snap the tile to a divisor of n: the divisible case runs ONE compiled
    # scan body (one set of (tile, n) temps live), while the unrolled
    # fallback lets the scheduler overlap iterations and keep several such
    # panels live at once — measured 20.1 GB (OOM) inside the full fit
    # program at N=51200 with the non-dividing default tile
    if n > tile and n % tile:
        for t in (2048, 1024, 512, 256, 128, 64):
            if t < tile and n % t == 0:
                tile = t
                break
    nc = kernel.num_hyp(d)
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    mean = hyp_mean(hyp)

    L = _factor_k_noise(kernel, chyp, x, sn2, tile)
    r = y - mean
    alpha = chol_solve(L, r)
    nll = (0.5 * jnp.dot(r, alpha) + 0.5 * chol_logdet(L)
           + 0.5 * n * jnp.log(2 * jnp.pi))
    if debug_decomp_enabled():
        debug_print_nll_decomp("nll_vg_streamed", nlz=nll,
                               data_fit=0.5 * jnp.dot(r, alpha),
                               half_logdet=0.5 * chol_logdet(L),
                               norm_const=0.5 * n * jnp.log(2 * jnp.pi))

    row = jnp.arange(n)

    def grad_tile(KinvI, j, b):
        """g_cov contribution of K^-1 columns [j, j+b) (KinvI: (n, b))."""
        x_I = jax.lax.dynamic_slice(x, (j, 0), (b, x.shape[1]))
        a_I = jax.lax.dynamic_slice(alpha, (j,), (b,))
        Q_I = KinvI.T - a_I[:, None] * alpha[None, :]
        _, k_vjp = jax.vjp(lambda c: kernel.k(c, x_I, x), chyp)
        return 0.5 * k_vjp(Q_I)[0]

    def tile_terms(j, b):
        """(g_cov, tr) via triangular solves — the non-dividing-n fallback.

        Identity columns j..j+b as a fused iota mask (jnp.roll of an
        (n, tile) eye concatenates a (2n, tile) temp — 800 MB at N=51200).
        """
        E = (row[:, None] == (j + jnp.arange(b))[None, :]).astype(x.dtype)
        KinvI = chol_solve(L, E)                   # (n, b): columns of K^-1
        tr = jnp.sum(jax.lax.dynamic_slice(KinvI, (j, 0), (b, b))
                     * jnp.eye(b, dtype=x.dtype))
        return grad_tile(KinvI, j, b), tr

    if n % tile == 0 and n > tile:
        from ..ops.slabbed import (slabbed_frobenius_sq, slabbed_t_matmul,
                                   slabbed_tri_inv)
        g_cov = jnp.zeros((nc,), x.dtype)
        if isinstance(L, (tuple, list)):
            # tiles must not cross slab edges: widths are multiples of the
            # 2048 build block, so any power-of-two tile <= 2048 divides
            # them; only a 4096 tile over a non-multiple width needs a cut
            while any(s.shape[1] % tile for s in L):
                tile //= 2
            T = slabbed_tri_inv(L)
            n_pad = T[0].shape[0]
            tr_Kinv = slabbed_frobenius_sq(T) - (n_pad - n)
            # outer loop UNROLLED over slabs (static slab selection), inner
            # lax.scan over the real-column tiles inside each slab (slab
            # edges are block multiples, so tiles never cross one)
            t0 = 0
            for s in T:
                w = s.shape[1]
                ncols = min(w, n - t0)             # real columns only
                if ncols <= 0:
                    break

                def body(g, off, s=s, t0=t0):
                    Tc = jax.lax.dynamic_slice(s, (0, off), (s.shape[0],
                                                             tile))
                    KinvI = slabbed_t_matmul(T, Tc)[:n]
                    return g + grad_tile(KinvI, t0 + off, tile), None

                g_cov, _ = jax.lax.scan(body, g_cov,
                                        jnp.arange(0, ncols, tile))
                t0 += w
        else:
            from ..ops.blocked import tri_inv
            T = tri_inv(L)
            tr_Kinv = jnp.sum(T * T)

            def body(g, j):
                Tc = jax.lax.dynamic_slice(T, (0, j), (n, tile))
                return g + grad_tile(T.T @ Tc, j, tile), None

            g_cov, _ = jax.lax.scan(body, g_cov, jnp.arange(0, n, tile))
    else:
        g_cov = jnp.zeros((nc,), x.dtype)
        tr_Kinv = jnp.zeros((), x.dtype)
        for j in range(0, n, tile):
            g, tr = tile_terms(j, min(tile, n - j))
            g_cov, tr_Kinv = g_cov + g, tr_Kinv + tr
    g_sn = sn2 * (tr_Kinv - jnp.dot(alpha, alpha))
    g_mean = -jnp.sum(alpha)
    grad = jnp.concatenate(
        [g_cov, jnp.stack([g_sn, g_mean]).astype(g_cov.dtype)])
    return nll, grad


def objective_vg(kernel: KernelSpec, noise_free: bool, vec, x, y,
                 solver: SolverSpec = CHOL):
    """(value, grad) over the optimization vector, INF-sanitized.

    The Cholesky solver uses the analytic gradient (nll_vg_raw); QR falls
    back to reverse-mode AD of nll_raw (the reference's QR drivers get the
    same analytic formulas, but Q = K^-1 - aa^T via QR is not cheaper than
    AD here and QR is the rarely-used strategy).
    """
    if solver.name == "chol":
        hyp = from_opt_vec(vec, noise_free)
        # beyond ~32k rows the K^-1-materializing path needs ~4 N^2
        # buffers (16 GB at N=32768 f32); stream tiles instead
        if x.shape[0] >= _STREAM_MIN_N:
            f, g_hyp = nll_vg_streamed(kernel, hyp, x, y)
        else:
            f, g_hyp = nll_vg_raw(kernel, hyp, x, y)
        g = to_opt_vec(g_hyp, noise_free)
        return sanitize_value_and_grad(f, g)
    if x.shape[0] >= _STREAM_MIN_N:
        # same trace-time guard as nll_raw (memory-gated): AD of the
        # dense QR build is the measured-OOM shape at stream scale
        from .sparse import hbm_budget_bytes
        if _dense_solver_bytes(x.shape[0], x.dtype) > hbm_budget_bytes():
            raise NotImplementedError(
                f"solver '{solver.name}' is unsupported at N={x.shape[0]} "
                f">= {_STREAM_MIN_N} (estimated dense footprint exceeds "
                f"the HBM budget); use the 'chol' solver (streamed "
                f"gradient) or raise GP_TPU_HBM_BYTES on a backend where "
                f"the dense build fits")
    f, g = jax.value_and_grad(
        lambda v: nll_raw(kernel, from_opt_vec(v, noise_free), x, y, solver)
    )(vec)
    return sanitize_value_and_grad(f, g)


def multistart_objective(kernel: KernelSpec, noise_free: bool, vec, x, y,
                         solver: SolverSpec = CHOL):
    """NLL with the sn2 > mean(sf2) rejection (GP.cpp:470-471)."""
    hyp = from_opt_vec(vec, noise_free)
    nc = kernel.num_hyp(x.shape[1])
    sf2_mean = jnp.mean(kernel.diag_k(hyp[:nc], x))
    v = nll_raw(kernel, hyp, x, y, solver)
    ok = jnp.isfinite(v) & (hyp_sn2(hyp) <= sf2_mean)
    return jnp.where(ok, v, INF)


@partial(jax.jit,
         static_argnames=("kernel", "noise_free", "max_evals", "solver"))
def fit(kernel: KernelSpec, noise_free: bool, x, y, vec0, lb, ub,
        max_evals: int = 160, solver: SolverSpec = CHOL):
    """The full bounded local MLE optimization as one jitted program.

    Dtype contract: optimizer state runs in the DATA dtype.  A float64
    vec0 over float32 data is cast down — mixing f64 curvature state with
    an f32 objective makes the line search accept steps at the f32 noise
    floor and poisons the L-BFGS history (measured stall; see DESIGN.md)."""
    fun = lambda v: objective_vg(kernel, noise_free, v, x, y, solver)
    vec0, lb, ub = (a.astype(x.dtype) for a in (vec0, lb, ub))
    return lbfgsb_impl(fun, vec0, lb, ub, max_evals=max_evals)


@partial(jax.jit, static_argnames=("kernel", "solver", "max_tries"))
def set_k(kernel: KernelSpec, hyp, x, y, solver: SolverSpec = CHOL,
          max_tries: int = 64):
    """Posterior cache (GP::_setK, GP.cpp:423-444): factor K, inflating the
    noise until the solver accepts it (log_sn += log sqrt(10), restarting at
    log eps from -inf — GP.cpp:431-440), then cache invKys.

    Returns (hyp', factors, invKys, ok) — hyp' may carry inflated noise, as
    the reference mutates _hyps.  ok=False means max_tries exhausted without
    an SPD factorization (the reference's _setK loops FOREVER until success
    and can never serve a failed factor, so callers must refuse to cache
    the NaN posterior — GPBase raises).
    """
    from ..ops.blocked import add_diag

    nc = kernel.num_hyp(x.shape[1])
    Kcov = kernel.k(hyp[:nc], x, x)
    eps = jnp.asarray(jnp.finfo(x.dtype).eps, x.dtype)
    log_sn0 = jnp.asarray(hyp[-2], x.dtype)

    def factor(ls):
        return solver.factor(add_diag(Kcov, jnp.exp(2.0 * ls)))

    def cond(state):
        f, ls, tries = state
        return jnp.logical_and(~solver.ok(f), tries < max_tries)

    def body(state):
        f, ls, tries = state
        ls = jnp.where(jnp.isinf(ls), jnp.log(eps), ls + 0.5 * jnp.log(10.0))
        return factor(ls), ls, tries + 1

    f, log_sn, _ = jax.lax.while_loop(
        cond, body, (factor(log_sn0), log_sn0, jnp.zeros((), jnp.int32)))
    hyp = hyp.at[-2].set(log_sn)
    invKys = solver.solve(f, y - hyp_mean(hyp))
    return hyp, f, invKys, solver.ok(f)


@partial(jax.jit, static_argnames=("kernel", "tile", "probes"))
def _posterior_attempt_streamed(kernel: KernelSpec, hyp, x, y,
                                tile: int = 2048, probes: int = 16,
                                seed: int = 0):
    """One stream-regime posterior attempt with the factor as a PROGRAM
    TEMP: build + factor + alpha + refined NLL in a single jitted program
    whose only outputs are (ok, invKys, logdet_f64, nll_refined_f64).

    Why the factor is never a program output at this scale (all measured
    at N=51200 f32 on the 16 GB v5e, round 3):

    * returning default-width (8192) slabs OOMs — XLA materializes the
      outputs next to the build's in-place chain (~2x 10.5 GB);
    * narrowing to width-4096 slabs fits but the factorization SILENTLY
      CORRUPTS (NaN diagonal from row ~1024 at ANY noise up to 115x the
      conditioning floor — a real SPD failure there is impossible), the
      third size/shape-dependent in-place defect of this runtime after
      the 2^31 single-buffer wall and the donation corruption
      (ops/slabbed.py docstring);
    * the objective-identical shape — default-width slabs as temps, small
      outputs — is verified clean at conditioning ratios 12 and 115 and
      across 160-eval fits.

    The refined alpha doubles as invKys (one iterative-refinement step,
    squared backward error), and the refined NLL is computed here so
    train() never needs the factor again.
    """
    if x.shape[0] % tile:
        for t in (2048, 1024, 512, 256, 128, 64):
            if t < tile and x.shape[0] % t == 0:
                tile = t
                break
    from ..ops.chol import chol_ok

    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    L = _factor_k_noise(kernel, chyp, x, hyp_sn2(hyp), tile)
    ok = chol_ok(L)
    alpha, logdet, nll_ref = _refined_terms(kernel, hyp, x, y, L, None,
                                            tile, probes, seed)
    return ok, alpha, logdet, nll_ref


def set_k_streamed(kernel: KernelSpec, hyp, x, y, tile: int = 2048,
                   max_tries: int = 32):
    """set_k semantics (GP::_setK, GP.cpp:423-444) for HBM-bound N.

    Each attempt is one factor-as-temp program (_posterior_attempt_streamed)
    re-entered with a different noise operand; the factor itself is NEVER
    cached (see that docstring).  Returns (hyp', aux, invKys) with
    aux = {"logdet": float, "nll_refined": float}.

    Rescue schedule: the reference inflates log_sn by log sqrt(10) steps
    (GP.cpp:431-440) — correct for genuine model-level non-SPD-ness, but
    brutal at HBM scale where the common failure is the f32 CONDITIONING
    cliff at sn2 ~ N eps sf2: a fitted noise one rounding flip below the
    cliff would get x3.16'd repeatedly, measurably destroying a -39k-NLL
    fit into a +226k noise-only model (round-3 post-mortem).  So the
    first retries ADD the conditioning floor: sn2 + 2^k * N eps sf2_mean,
    k = 0.. — reaching SPD within a few doublings while perturbing the
    model by no more than ~2x the smallest viable jitter; the reference's
    multiplicative ladder remains as the final fallback for true
    non-SPD-ness (NaN hyps, degenerate kernels).
    """
    import math

    n = x.shape[0]
    nc = kernel.num_hyp(x.shape[1])
    hyp = jnp.asarray(hyp, x.dtype)
    chyp = hyp[:nc]
    log_sn0 = float(hyp[-2])
    eps = float(jnp.finfo(x.dtype).eps)
    sf2_mean = float(jnp.mean(kernel.diag_k(chyp, x)))
    floor = n * eps * sf2_mean

    sn2_0 = math.exp(2.0 * log_sn0) if math.isfinite(log_sn0) else 0.0
    candidates = [sn2_0]
    candidates += [sn2_0 + floor * 2.0 ** k for k in range(8)]
    sn2_mult = max(sn2_0 + floor * 2.0 ** 7, eps ** 2)
    candidates += [sn2_mult * 10.0 ** (0.5 * k)
                   for k in range(1, max_tries - 8)]

    out = None
    for tries, sn2 in enumerate(candidates):
        log_sn = 0.5 * math.log(sn2) if sn2 > 0 else -INF
        h = hyp.at[-2].set(jnp.asarray(log_sn, hyp.dtype))
        ok, alpha, logdet, nll_ref = _posterior_attempt_streamed(
            kernel, h, x, y, tile)
        if bool(ok):
            out = (h, alpha, logdet, nll_ref)
            break
    if out is None:
        # exhausted: the reference's _setK loops until the factorization
        # succeeds and can never serve a failed factor (GP.cpp:423-444) —
        # fail loud rather than cache a NaN posterior (mirrors the
        # distributed analogs, GP.train_distributed / psparse)
        raise RuntimeError(
            f"set_k_streamed: posterior factorization failed after "
            f"{len(candidates)} rescue attempts (conditioning-floor "
            f"schedule then the x-sqrt(10) ladder up to "
            f"log_sn={0.5 * math.log(candidates[-1]):.2f}); refusing to "
            f"cache a NaN posterior")
    if tries:
        # noise adjustment is a MODEL CHANGE (GP.cpp:431-440 mutates
        # _hyps) — always say it happened and by how much
        print(f"[gp_tpu] set_k_streamed: noise raised from "
              f"log_sn={log_sn0:.4f} to {float(out[0][-2]):.4f} "
              f"({tries} rescue attempt(s), conditioning floor "
              f"{floor:.3e}) before the factorization succeeded",
              file=sys.stderr, flush=True)
    h, alpha, logdet, nll_ref = out
    aux = {"logdet": float(logdet), "nll_refined": float(nll_ref)}
    return h, aux, alpha


@partial(jax.jit, static_argnames=("kernel", "solver"))
def predict(kernel: KernelSpec, hyp, x, f, invKys, xs,
            solver: SolverSpec = CHOL):
    """Batched posterior mean + variance (GP::_predict, GP.cpp:273-283).

    y*  = mean + k* invKys
    s2* = max(sf2 - sum(k* o K^-1 k*), 0) + sn2
    """
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    kt = kernel.k(chyp, xs, x)                    # (T, N)
    mu = hyp_mean(hyp) + kt @ invKys
    kks = solver.solve(f, kt.T)                   # (N, T)
    sf2 = kernel.diag_k(chyp, xs)
    s2 = jnp.maximum(sf2 - jnp.sum(kt * kks.T, axis=1), 0.0) + hyp_sn2(hyp)
    return mu, s2


@partial(jax.jit, static_argnames=("kernel",))
def predict_y(kernel: KernelSpec, hyp, x, invKys, xs):
    """O(N)-per-point mean-only path (GP::_predict_y, GP.cpp:298-314)."""
    nc = kernel.num_hyp(x.shape[1])
    kt = kernel.k(hyp[:nc], xs, x)
    return hyp_mean(hyp) + kt @ invKys


@partial(jax.jit, static_argnames=("kernel", "solver"))
def predict_s2(kernel: KernelSpec, hyp, x, f, xs, solver: SolverSpec = CHOL):
    """Variance-only path (GP::_predict_s2, GP.cpp:315-334)."""
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    kt = kernel.k(chyp, xs, x)
    kks = solver.solve(f, kt.T)
    sf2 = kernel.diag_k(chyp, xs)
    return jnp.maximum(sf2 - jnp.sum(kt * kks.T, axis=1), 0.0) + hyp_sn2(hyp)


def _predict_y_single(kernel, hyp, x, invKys, xi):
    nc = kernel.num_hyp(x.shape[1])
    kt = kernel.k(hyp[:nc], xi[None, :], x)[0]
    return hyp_mean(hyp) + jnp.dot(kt, invKys)


def _predict_s2_single(kernel, hyp, x, f, xi, solver=CHOL):
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    kt = kernel.k(chyp, xi[None, :], x)[0]
    kks = solver.solve(f, kt)
    sf2 = kernel.diag_k(chyp, xi[None, :])[0]
    quad = jnp.dot(kt, kks)
    raw = sf2 - quad + hyp_sn2(hyp)
    clamped = jnp.maximum(sf2 - quad, 0.0) + hyp_sn2(hyp)
    # Value uses the clamp (GP.cpp:283); the gradient ignores it, exactly as
    # the reference's analytic gs2 does (GP.cpp:294).
    return raw + jax.lax.stop_gradient(clamped - raw)


@partial(jax.jit, static_argnames=("kernel",))
def predict_y_with_grad(kernel: KernelSpec, hyp, x, invKys, xs):
    """(y, dy/dx*) batched over test points — the BO acquisition path
    (GP.cpp:289-293) via jax.grad instead of hand-written dk_dx1."""
    f = lambda xi: _predict_y_single(kernel, hyp, x, invKys, xi)
    return jax.vmap(jax.value_and_grad(f))(xs)


@partial(jax.jit, static_argnames=("kernel", "solver"))
def predict_s2_with_grad(kernel: KernelSpec, hyp, x, f, xs,
                         solver: SolverSpec = CHOL):
    g = lambda xi: _predict_s2_single(kernel, hyp, x, f, xi, solver)
    return jax.vmap(jax.value_and_grad(g))(xs)


# --------------------------------------------------------------------------
# Stream-regime (factor-as-temp) prediction programs
# --------------------------------------------------------------------------
#
# At HBM scale the posterior factor is never cached (see
# _posterior_attempt_streamed's docstring: slab factors as program OUTPUTS
# either OOM or silently corrupt on this runtime), so variance predictions
# re-factor K inside their own program — the factor lives and dies as a
# temp, exactly the verified-clean objective shape.  Mean-only predictions
# need only the cached invKys and stay O(NT).


@partial(jax.jit, static_argnames=("kernel", "tile"))
def predict_streamed(kernel: KernelSpec, hyp, x, invKys, xs,
                     tile: int = 2048):
    """(mu, s2) with an in-program factorization (GP.cpp:273-283 math)."""
    if x.shape[0] % tile:
        for t in (2048, 1024, 512, 256, 128, 64):
            if t < tile and x.shape[0] % t == 0:
                tile = t
                break
    from ..ops.chol import chol_solve

    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    L = _factor_k_noise(kernel, chyp, x, hyp_sn2(hyp), tile)
    kt = kernel.k(chyp, xs, x)                    # (T, N)
    mu = hyp_mean(hyp) + kt @ invKys
    kks = chol_solve(L, kt.T)                     # (N, T)
    sf2 = kernel.diag_k(chyp, xs)
    s2 = jnp.maximum(sf2 - jnp.sum(kt * kks.T, axis=1), 0.0) + hyp_sn2(hyp)
    return mu, s2


@partial(jax.jit, static_argnames=("kernel", "tile"))
def predict_s2_with_grad_streamed(kernel: KernelSpec, hyp, x, xs,
                                  tile: int = 2048):
    """(s2, ds2/dx*) with an in-program factorization.

    The solve K^{-1} k* is hoisted OUT of the per-point grad (one program-
    level chol_solve for all test points); per point, only the O(N d)
    kernel-row vjp runs — gs2 = diag_dk - 2 dk . (K^{-1} k*), the clamp
    excluded from the gradient exactly as GP.cpp:294."""
    if x.shape[0] % tile:
        for t in (2048, 1024, 512, 256, 128, 64):
            if t < tile and x.shape[0] % t == 0:
                tile = t
                break
    from ..ops.chol import chol_solve

    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    L = _factor_k_noise(kernel, chyp, x, sn2, tile)
    kt = kernel.k(chyp, xs, x)                    # (T, N)
    kks = chol_solve(L, kt.T)                     # (N, T)
    sf2 = kernel.diag_k(chyp, xs)
    quad = jnp.sum(kt * kks.T, axis=1)
    s2 = jnp.maximum(sf2 - quad, 0.0) + sn2

    def gs2_one(xi, kks_t):
        # diag_dk term: zero for stationary kernels but kept for parity
        # with _predict_s2_single (kernel-generic)
        ddiag = jax.grad(lambda z: kernel.diag_k(chyp, z[None, :])[0])(xi)
        _, vjp = jax.vjp(lambda z: kernel.k(chyp, z[None, :], x)[0], xi)
        return ddiag + vjp(-2.0 * kks_t)[0]

    gs2 = jax.vmap(gs2_one)(xs, kks.T)
    return s2, gs2


# --------------------------------------------------------------------------
# Class wrapper
# --------------------------------------------------------------------------

class GP(GPBase):
    """Exact GP with the reference's public API surface (GP.h:79-122).

    `solver` selects the MatrixSolver strategy ("chol" | "qr"), mirroring
    GP::MatrixDecomp (GP.h:22-26).
    """

    _MAX_EVAL = 160

    # posterior cache: (*solver_factors, invKys)

    def subset_init_hyps(self, m: int = 8192, seed: int = 0):
        """MLE hyps from a random m-point subset fit — the large-N warm
        start.

        At HBM-scale N the default-hyp probe is INF (f32 non-SPD at the
        tiny default noise), so a cold train() enters through the random
        global search (GP.cpp:196-198 semantics) and the 160-eval budget
        can stall in the noise-dominated basin (measured at N=51200:
        final NLL +1.04 nats/pt cold vs -0.2 expected).  An O(m^3) subset
        MLE lands in the data-fit basin in seconds on the chip; pass the
        result to train():  `gp.train(gp.subset_init_hyps())`.  No
        reference analog — the serial reference cannot afford restarts at
        large N at all.
        """
        n = self._x.shape[0]
        if n <= m:
            return self.get_default_hyps()
        idx = np.random.default_rng(seed).choice(n, m, replace=False)
        sub = GP(np.asarray(self._x)[idx], np.asarray(self._y)[idx],
                 kernel=self.kernel, solver=self.solver)
        sub.set_noise_lower_bound(self._noise_lb)
        if self._noise_free:
            sub.set_noise_free(True)
        sub.train()
        hyp = np.array(np.asarray(sub.get_hyp()), np.float64)
        # clamp the start noise: a subset MLE can overfit noise down to
        # the noise_lb clip (sn2 ~ 1e-6 measured on 0.1-noise synthetic
        # data at m=8192), and that overconfident model is catastrophic
        # at full N — measured at N=51200: NLL +185677 at the raw subset
        # hyps (f64 oracle agrees, +185677 vs f32 +184671: the value is
        # real, not a precision artifact) vs -27616 at the same length
        # scales with clamped noise.  Starting 4+ orders of magnitude of
        # sn2 away also burns the 160-eval budget before the basin is
        # reached (measured: stalls at the +53k noise basin).  The floor
        # sn2 >= 2 N eps sf2 doubles as the model-dtype conditioning
        # bound, keeping the f32 factorization's relative error O(0.01).
        if not self._noise_free:
            log_sf = float(hyp[self._num_cov - 1])
            eps = float(jnp.finfo(self._dtype).eps)
            floor = log_sf + 0.5 * float(np.log(2.0 * n * eps))
            hyp[-2] = max(float(hyp[-2]), floor)
        return hyp

    def _warm_start_hyps(self):
        """Stream-regime INF-start recovery: the subset MLE, BEFORE the
        noise-inflation rescue (train pipeline, models/base.py).

        At HBM-scale N the alternatives are both measurably bad
        (N=51200, round 3): the noise rescue keeps the default length
        scales but parks the noise at the f32 conditioning cliff, and
        the reference's random global search costs a full O(N^3)
        factorization per probe (~6 s each; the num_hyp*50 budget alone
        is ~an hour) — the 160-eval fit from either start stalls in the
        noise basin (held-out RMSE 0.665) where the O(m^3) subset start
        reaches the data-fit basin (RMSE 0.105).  MVMO remains the
        fallback if even this start probes INF."""
        if not self._in_stream_regime():
            return None
        m = min(8192, self.num_train // 2)
        if m < 8:
            return None               # nothing meaningful to sub-fit
        hyp = self.subset_init_hyps(m=m)
        print(f"[gp_tpu] train: HBM-scale start recovery — subset-MLE "
              f"warm start (m={m}) probes against the given start; "
              f"subset log_sn={float(hyp[-2]):.4f}",
              file=sys.stderr, flush=True)
        return hyp

    def _nll_value(self, hyp):
        return nll(self.kernel, hyp, self._x, self._y, self.solver)

    def _multistart_objective(self):
        fun = self._ms_fun
        if fun is None:
            kernel, noise_free = self.kernel, self._noise_free
            x, y, solver = self._x, self._ys, self.solver
            fun = lambda v: multistart_objective(kernel, noise_free, v, x, y,
                                                 solver)
            self._ms_fun = fun
        return fun

    def _objective_closure(self):
        fun = self._obj_fun
        if fun is None:
            kernel, noise_free = self.kernel, self._noise_free
            x, y, solver = self._x, self._ys, self.solver
            fun = lambda v: objective_vg(kernel, noise_free, v, x, y, solver)
            self._obj_fun = fun
        return fun

    def _run_local_opt(self, vec0, lb_v, ub_v):
        n = self._x.shape[0]
        if self.solver.name == "chol" and n >= _STREAM_MIN_N:
            # a monolithic 160-eval jitted fit is one multi-ten-minute
            # device execution at this N; the remote TPU runtime kills any
            # single execution past ~60-100 s (bisected: 8 chained
            # N=51200 evals at ~51 s run, 16 at ~102 s crash the worker),
            # and the while_loop form of the optimizer executes ~2.6x
            # slower per eval than straight-line code, so even a 5-eval
            # lbfgsb_chunked chunk breaches the watchdog here.  Drive the
            # optimizer from the host instead: one device program per
            # NLL+gradient evaluation (6.4 s at N=51200) can never hit it.
            from ..optim.lbfgsb import lbfgsb_hosted
            dt = self._x.dtype
            return lbfgsb_hosted(
                self._objective_closure(), jnp.asarray(vec0, dt),
                jnp.asarray(lb_v, dt), jnp.asarray(ub_v, dt),
                max_evals=self._MAX_EVAL)
        return fit(self.kernel, self._noise_free, self._x, self._ys,
                   vec0, lb_v, ub_v, max_evals=self._MAX_EVAL,
                   solver=self.solver)

    def _in_stream_regime(self) -> bool:
        return (self.solver.name == "chol"
                and self._x.shape[0] >= _STREAM_MIN_N)

    def _use_hosted_opt(self) -> bool:
        # stream-regime N: one NLL+gradient is ~6 s at N=51200, so ANY
        # multi-evaluation monolith (vmapped multistart, the MVMO scan)
        # is the measured worker-crash shape — run everything host-driven
        return self._in_stream_regime()

    def _update_posterior(self):
        if self._in_stream_regime():
            # factor-as-temp posterior: the cache is invKys + scalars
            # (logdet, refined NLL); the N^2 factor is never materialized
            # as a program output (see _posterior_attempt_streamed)
            hyp, aux, invKys = set_k_streamed(self.kernel, self._hyps,
                                              self._x, self._y)
            self._post = (invKys,)
            self._post_aux = aux
        else:
            hyp, f, invKys, ok = set_k(self.kernel, self._hyps, self._x,
                                       self._y, self.solver)
            if not bool(ok):
                # reference parity: _setK loops until the factorization
                # succeeds (GP.cpp:423-444) — it can never serve a failed
                # factor, so neither may we (matches train_distributed)
                raise RuntimeError(
                    "posterior factorization failed after noise inflation "
                    "(set_k exhausted max_tries); refusing to cache a NaN "
                    "posterior")
            self._post = (*f, invKys)
            self._post_aux = None
        self._hyps = hyp
        self._post_dist = None       # single-device posterior supersedes

    def _nll_from_posterior(self):
        """HBM-stream regime: train()'s final NLL comes straight from the
        posterior-cache program — _posterior_attempt_streamed computed the
        REFINED NLL (mixed-precision repair of the ~1 mnat/pt f32
        factorization rounding, measured 8.9e-4 rel at N=51200 raw) while
        it still held the factor as a temp.  No second build+factor ever
        runs next to the cache (a fresh nll() program there was a
        measured RESOURCE_EXHAUSTED at N=51200 f32 on 16 GB).  Falls back
        to the raw data-fit + cached logdet if the refined value is
        non-finite."""
        if not (self._in_stream_regime() and self._post is not None
                and self._post_aux is not None):
            return None
        v = self._post_aux.get("nll_refined")
        if v is not None and np.isfinite(v):
            return float(v)
        invKys = self._post[-1]
        r = self._y - jnp.asarray(hyp_mean(self._hyps), self._y.dtype)
        n = self._x.shape[0]
        v = float(0.5 * jnp.dot(r, invKys)
                  + 0.5 * self._post_aux["logdet"]
                  + 0.5 * n * jnp.log(2 * jnp.pi))
        return v if np.isfinite(v) else INF

    def _factors(self):
        assert not self._in_stream_regime(), (
            "stream-regime posteriors cache no factor; predictions go "
            "through the factor-as-temp programs")
        return tuple(self._post[:-1])

    # -- distributed training / serving (parallel/pgp.py) -------------------
    @staticmethod
    def _is_grid_mesh(mesh) -> bool:
        return {"rowg", "colg"} <= set(mesh.axis_names)

    def train_distributed(self, mesh, block: int | None = None,
                          init_hyps=None) -> float:
        """MLE fit with the N x N kernel matrix block-cyclic over mesh
        axis "rows": distributed blocked Cholesky + analytic psum gradient
        (parallel/pgp.py), optimized in the standardized space like
        train().  The posterior cache stays SHARDED (each chip holds its
        row blocks of L), and the predict APIs serve from it.

        A 2-D ("rowg", "colg") = (hosts, chips/host) mesh keeps the
        ENTIRE pipeline on the DCN-lean grid layout (parallel/pchol2d):
        fit (pfit2d_hosted), posterior cache incl. every noise-inflation
        rescue attempt (pset_k2d), serving (ppredict2d — the predict
        APIs route on the cached mesh's axis names), and the returned
        final NLL (pnll2d).  ~6x less host-crossing traffic per O(N^3)
        evaluation than the 1-D layout (BASELINE.md round-4 comm model);
        no 1-D fallback anywhere on the grid path."""
        from ..parallel import pgp
        from .base import to_opt_vec

        grid = self._is_grid_mesh(mesh)

        used_defaults = init_hyps is None
        if init_hyps is None:
            init_hyps = self.get_default_hyps()
        hyps = np.array(np.asarray(init_hyps), np.float64)
        if self._noise_free:
            hyps[-2] = -np.inf

        from ..parallel.pchol import auto_block
        n_dev = int(np.asarray(mesh.devices).size)
        if block is None:
            block = auto_block(self.num_train, n_dev)
        # watchdog routing (mirrors the single-chip stream regime): a
        # monolithic 160-eval jitted program past ~8192^3 per-device
        # work units (~0.5 s/eval) risks the remote runtime's ~60-100 s
        # single-execution kill; drive the optimizer from the host with
        # one distributed program per evaluation instead
        # multi-process meshes route through the multihost conversion
        # layer (host-local -> global replicated inputs); the shard_map
        # programs themselves are identical — this makes the MODEL-level
        # API pod-complete, not just the functional layer
        from ..parallel import multihost
        mp = multihost.is_multiprocess()

        def _dist_nll(h):
            h = jnp.asarray(np.asarray(h), self._dtype)
            if grid:
                from ..parallel import pchol2d
                fn = multihost.pnll_vg2d if mp else pchol2d.pnll_vg2d
            else:
                fn = multihost.pnll_vg if mp else pgp.pnll_vg
            f, _ = fn(self.kernel, h, self._x, self._y, mesh, block=block)
            return float(f)

        if used_defaults and self.num_train >= _STREAM_MIN_N:
            # HBM-scale default-init trap (measured, round 3: a 160-eval
            # fit from defaults stalls in the noise basin at N=51200 —
            # RMSE 0.665 vs 0.105 from the O(m^3) subset start).  The
            # single-chip train() probes a subset-MLE warm start; the
            # distributed fit gets the same treatment, with the probe as
            # TWO distributed evaluations (seconds at pod scale).
            warm = self.subset_init_hyps(m=min(8192, self.num_train // 2))
            f_def, f_warm = _dist_nll(hyps), _dist_nll(warm)
            if np.isfinite(f_warm) and (not np.isfinite(f_def)
                                        or f_warm < f_def):
                print(f"[gp_tpu] train_distributed: subset-MLE warm start "
                      f"wins the probe ({f_warm:.4g} < {f_def:.4g})",
                      file=sys.stderr, flush=True)
                hyps = np.array(np.asarray(warm), np.float64)

        hyps_std = self._hyp_to_std(hyps)
        lb, ub = self._std_bounds()
        lb_v = np.asarray(to_opt_vec(jnp.asarray(lb), self._noise_free))
        ub_v = np.asarray(to_opt_vec(jnp.asarray(ub), self._noise_free))
        vec0 = np.clip(
            np.asarray(to_opt_vec(jnp.asarray(hyps_std), self._noise_free)),
            lb_v, ub_v)

        n = self.num_train
        if grid:
            from ..parallel import pchol2d
            fit2d = multihost.pfit2d if mp else pchol2d.pfit2d_hosted
            res = fit2d(
                self.kernel, self._noise_free, self._x, self._ys,
                jnp.asarray(vec0, self._dtype),
                jnp.asarray(lb_v, self._dtype),
                jnp.asarray(ub_v, self._dtype),
                mesh, block=block, max_evals=self._MAX_EVAL)
        else:
            hosted = n ** 3 / mesh.shape["rows"] > _DIST_HOSTED_WORK
            if mp:
                # pod default: hosted (per-eval programs; the monolithic
                # form is the watchdog-crash shape at scale)
                fit_fn = (multihost.pfit_hosted if hosted
                          else multihost.pfit)
            else:
                fit_fn = pgp.pfit_hosted if hosted else pgp.pfit
            res = fit_fn(self.kernel, self._noise_free, self._x, self._ys,
                         jnp.asarray(vec0, self._dtype),
                         jnp.asarray(lb_v, self._dtype),
                         jnp.asarray(ub_v, self._dtype),
                         mesh, block=block, max_evals=self._MAX_EVAL)
        self.last_opt_result = res._replace(
            f=res.f + self.num_train * float(np.log(self._y_sigma)))
        self._hyps = jnp.asarray(self._hyp_from_std(
            np.asarray(from_opt_vec(res.x, self._noise_free), np.float64)),
            self._dtype)

        if grid:
            from ..parallel import pchol2d
            set_k2d = multihost.pset_k2d if mp else pchol2d.pset_k2d
            hyp, L, invKys, ok = set_k2d(
                self.kernel, self._hyps, self._x, self._y, mesh,
                block=block)
        else:
            set_k = multihost.pset_k if mp else pgp.pset_k
            hyp, L, invKys, ok = set_k(self.kernel, self._hyps,
                                       self._x, self._y, mesh,
                                       block=block)
        if not ok:
            raise RuntimeError(
                "distributed posterior factorization failed after noise "
                "inflation (pset_k exhausted max_tries); refusing to "
                "cache a NaN posterior")
        self._hyps = hyp
        self._post = None
        self._post_dist = (mesh, block, L, invKys)
        self._trained = True
        if grid:
            from ..parallel import pchol2d
            if mp:
                f, _ = multihost.pnll_vg2d(self.kernel, self._hyps,
                                           self._x, self._y, mesh,
                                           block=block)
                return float(f)
            return float(pchol2d.pnll2d(self.kernel, self._hyps, self._x,
                                        self._y, mesh, block=block))
        if mp:
            f, _ = multihost.pnll_vg(self.kernel, self._hyps, self._x,
                                     self._y, mesh, block=block)
            return float(f)
        f, _ = pgp.pnll_vg(self.kernel, self._hyps, self._x, self._y, mesh,
                           block=block)
        return float(f)

    def restore_distributed(self, mesh, block=None):
        """Re-attach a deserialized distributed posterior (utils/checkpoint
        stores the gathered block-cyclic L + invKys with layout metadata).

        1-D checkpoints need a mesh with the same "rows"-axis device
        count; 2-D grid checkpoints need a ("rowg", "colg") mesh with the
        same (Pr, Pc) grid shape.  shard_map re-shards the blocks on
        first use."""
        from ..parallel.pchol2d import AXC, AXR
        from ..parallel.pgp import AXIS

        pending = getattr(self, "_post_dist_pending", None)
        if pending is None:
            raise ValueError("no pending distributed posterior to restore")
        layout, blk, L_np, invKys_np = pending
        if isinstance(layout, tuple):                    # 2-D grid (Pr, Pc)
            pr, pc = layout
            if not self._is_grid_mesh(mesh):
                raise ValueError(
                    f"checkpointed posterior is blocked for a "
                    f"({pr}, {pc}) ('rowg', 'colg') grid; mesh axes are "
                    f"{mesh.axis_names}")
            if (mesh.shape[AXR], mesh.shape[AXC]) != (pr, pc):
                raise ValueError(
                    f"checkpointed posterior is blocked for a ({pr}, {pc}) "
                    f"grid; mesh is ({mesh.shape[AXR]}, {mesh.shape[AXC]})")
        else:                                            # 1-D n_dev
            n_dev = layout
            if self._is_grid_mesh(mesh) or mesh.shape[AXIS] != n_dev:
                raise ValueError(
                    f"checkpointed posterior is blocked for {n_dev} devices "
                    f"on axis '{AXIS}'; mesh has axes {mesh.axis_names} "
                    f"shape {dict(mesh.shape)}")
        self._post_dist = (mesh, blk if block is None else block,
                           jnp.asarray(L_np, self._dtype),
                           jnp.asarray(invKys_np, self._dtype))
        self._post_dist_pending = None
        self._post = None
        self._trained = True

    # -- prediction API (GP.h:104-119) --------------------------------------


    def batch_predict(self, xs):
        self._require_trained()
        if getattr(self, "_post_dist", None) is not None:
            from ..parallel import multihost
            mesh, block, L, invKys = self._post_dist
            mp = multihost.is_multiprocess()
            if self._is_grid_mesh(mesh):
                from ..parallel import pchol2d
                ppred_fn = (multihost.ppredict2d if mp
                            else pchol2d.ppredict2d)
            else:
                from ..parallel import pgp
                # NOTE: must not shadow the module-level `predict` used
                # by the dense path below
                ppred_fn = multihost.ppredict if mp else pgp.ppredict
            mu, s2 = ppred_fn(self.kernel, self._hyps, self._x, L,
                              invKys, self._as_batch(xs), mesh,
                              block=block)
            return np.asarray(mu), np.asarray(s2)
        if self._in_stream_regime():
            mu, s2 = predict_streamed(self.kernel, self._hyps, self._x,
                                      self._post[-1], self._as_batch(xs))
            return np.asarray(mu), np.asarray(s2)
        mu, s2 = predict(self.kernel, self._hyps, self._x, self._factors(),
                         self._post[-1], self._as_batch(xs), self.solver)
        return np.asarray(mu), np.asarray(s2)

    def batch_predict_y(self, xs):
        self._require_trained()
        if getattr(self, "_post_dist", None) is not None:
            return np.asarray(predict_y(
                self.kernel, self._hyps, self._x, self._post_dist[3],
                self._as_batch(xs)))
        return np.asarray(predict_y(self.kernel, self._hyps, self._x,
                                    self._post[-1], self._as_batch(xs)))

    def batch_predict_s2(self, xs):
        self._require_trained()
        if getattr(self, "_post_dist", None) is not None:
            return self.batch_predict(xs)[1]
        if self._in_stream_regime():
            return self.batch_predict(xs)[1]
        return np.asarray(predict_s2(self.kernel, self._hyps, self._x,
                                     self._factors(), self._as_batch(xs),
                                     self.solver))

    def _ppredict_with_grad_dist(self, xs):
        from ..parallel import multihost
        mesh, block, L, invKys = self._post_dist
        mp = multihost.is_multiprocess()
        if self._is_grid_mesh(mesh):
            from ..parallel import pchol2d
            fn = (multihost.ppredict2d_with_grad if mp
                  else pchol2d.ppredict2d_with_grad)
        else:
            from ..parallel import pgp
            fn = (multihost.ppredict_with_grad if mp
                  else pgp.ppredict_with_grad)
        return fn(self.kernel, self._hyps, self._x, L, invKys,
                  self._as_batch(xs), mesh, block=block)

    def batch_predict_y_with_grad(self, xs):
        self._require_trained()
        if getattr(self, "_post_dist", None) is not None:
            y, gy, _, _ = self._ppredict_with_grad_dist(xs)
            return np.asarray(y), np.asarray(gy)
        y, gy = predict_y_with_grad(self.kernel, self._hyps, self._x,
                                    self._post[-1], self._as_batch(xs))
        return np.asarray(y), np.asarray(gy)

    def batch_predict_s2_with_grad(self, xs):
        self._require_trained()
        if getattr(self, "_post_dist", None) is not None:
            _, _, s2, gs2 = self._ppredict_with_grad_dist(xs)
            return np.asarray(s2), np.asarray(gs2)
        if self._in_stream_regime():
            s2, gs2 = predict_s2_with_grad_streamed(
                self.kernel, self._hyps, self._x, self._as_batch(xs))
            return np.asarray(s2), np.asarray(gs2)
        s2, gs2 = predict_s2_with_grad(self.kernel, self._hyps, self._x,
                                       self._factors(), self._as_batch(xs),
                                       self.solver)
        return np.asarray(s2), np.asarray(gs2)



# --------------------------------------------------------------------------
# Masked-capacity variants (bucketed add_data: BO loops without recompiles)
# --------------------------------------------------------------------------
#
# The reference's add_data (GP.cpp:43-55) appends columns and refits — cheap
# there because nothing is compiled.  Under jit, growing N recompiles every
# stage, which would make a one-point-per-iteration Bayesian-optimization
# loop pay seconds of compile per step.  These variants take the number of
# REAL points as a TRACED scalar over a fixed-capacity padded buffer:
# padded rows/cols are masked to the identity (K_pad = blockdiag(K, I),
# r_pad = 0 — same scheme as parallel/pgp.py), so adding a point re-runs
# the SAME compiled program.

def _masked_k(kernel: KernelSpec, chyp, x_pad, n_real):
    """K0 over the padded buffer with identity pad rows/cols."""
    K0 = kernel.k(chyp, x_pad, x_pad)
    ids = jnp.arange(x_pad.shape[0])
    pad = (ids[:, None] >= n_real) | (ids[None, :] >= n_real)
    eye = (ids[:, None] == ids[None, :]).astype(K0.dtype)
    return jnp.where(pad, eye, K0)


def nll_raw_masked(kernel: KernelSpec, hyp, x_pad, y_pad, n_real,
                   solver: SolverSpec = CHOL):
    """NLL over the first n_real rows of a fixed-capacity buffer."""
    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    ids = jnp.arange(x_pad.shape[0])
    real = ids < n_real
    K = _masked_k(kernel, chyp, x_pad, n_real) + jnp.where(
        real, sn2, 0.0) * jnp.eye(x_pad.shape[0], dtype=x_pad.dtype)
    f = solver.factor(K)
    r = jnp.where(real, y_pad - hyp_mean(hyp), 0.0)
    alpha = solver.solve(f, r)
    return (0.5 * jnp.dot(r, alpha) + 0.5 * solver.logdet(f)
            + 0.5 * n_real * jnp.log(2 * jnp.pi))


def nll_vg_raw_masked(kernel: KernelSpec, hyp, x_pad, y_pad, n_real):
    """Masked-capacity analog of nll_vg_raw (analytic gradient via the
    explicit inverse).  Padded rows/cols are identity constants in the
    builder (zero cotangent under vjp); their K^-1 block is also the
    identity, so tr(Q) subtracts the pad count."""
    from ..ops.blocked import spd_inv_from_chol
    from ..ops.chol import chol_logdet, chol_solve, cholesky

    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    n_cap = x_pad.shape[0]
    ids = jnp.arange(n_cap)
    real = ids < n_real

    build = lambda c: _masked_k(kernel, c, x_pad, n_real)
    K0, k_vjp = jax.vjp(build, chyp)
    K = K0 + jnp.where(real, sn2, 0.0) * jnp.eye(n_cap, dtype=x_pad.dtype)
    L = cholesky(K)
    r = jnp.where(real, y_pad - hyp_mean(hyp), 0.0)
    alpha = chol_solve(L, r)
    nll = (0.5 * jnp.dot(r, alpha) + 0.5 * chol_logdet(L)
           + 0.5 * n_real * jnp.log(2 * jnp.pi))

    Kinv = spd_inv_from_chol(L)
    Q = Kinv - alpha[:, None] * alpha[None, :]
    g_cov = 0.5 * k_vjp(Q)[0]
    # pad diagonal of K^-1 is exactly 1 per pad row; subtract it from tr
    tr_real = jnp.trace(Kinv) - (n_cap - n_real) - jnp.dot(alpha, alpha)
    g_sn = sn2 * tr_real
    g_mean = -jnp.sum(alpha)
    grad = jnp.concatenate(
        [g_cov, jnp.stack([g_sn, g_mean]).astype(g_cov.dtype)])
    return nll, grad


def objective_vg_masked(kernel, noise_free, vec, x_pad, y_pad, n_real,
                        solver: SolverSpec = CHOL):
    if solver.name == "chol":
        hyp = from_opt_vec(vec, noise_free)
        f, g_hyp = nll_vg_raw_masked(kernel, hyp, x_pad, y_pad, n_real)
        return sanitize_value_and_grad(f, to_opt_vec(g_hyp, noise_free))
    f, g = jax.value_and_grad(
        lambda v: nll_raw_masked(kernel, from_opt_vec(v, noise_free), x_pad,
                                 y_pad, n_real, solver))(vec)
    return sanitize_value_and_grad(f, g)


@partial(jax.jit,
         static_argnames=("kernel", "noise_free", "max_evals", "solver"))
def fit_masked(kernel, noise_free, x_pad, y_pad, n_real, vec0, lb, ub,
               max_evals: int = 160, solver: SolverSpec = CHOL):
    fun = lambda v: objective_vg_masked(kernel, noise_free, v, x_pad, y_pad,
                                        n_real, solver)
    # dtype contract as fit(): optimizer state in the data dtype
    vec0, lb, ub = (a.astype(x_pad.dtype) for a in (vec0, lb, ub))
    return lbfgsb_impl(fun, vec0, lb, ub, max_evals=max_evals)


@partial(jax.jit, static_argnames=("kernel", "solver", "max_tries"))
def set_k_masked(kernel: KernelSpec, hyp, x_pad, y_pad, n_real,
                 solver: SolverSpec = CHOL, max_tries: int = 64):
    """Posterior cache over the padded buffer (noise-inflation rescue)."""
    nc = kernel.num_hyp(x_pad.shape[1])
    Kcov = _masked_k(kernel, hyp[:nc], x_pad, n_real)
    ids = jnp.arange(x_pad.shape[0])
    real = ids < n_real
    diag = jnp.where(real, 1.0, 0.0) * jnp.eye(x_pad.shape[0],
                                               dtype=x_pad.dtype)
    eps = jnp.asarray(jnp.finfo(x_pad.dtype).eps, x_pad.dtype)
    log_sn0 = jnp.asarray(hyp[-2], x_pad.dtype)

    def factor(ls):
        return solver.factor(Kcov + jnp.exp(2.0 * ls) * diag)

    def cond(state):
        f, ls, tries = state
        return jnp.logical_and(~solver.ok(f), tries < max_tries)

    def body(state):
        f, ls, tries = state
        ls = jnp.where(jnp.isinf(ls), jnp.log(eps), ls + 0.5 * jnp.log(10.0))
        return factor(ls), ls, tries + 1

    f, log_sn, _ = jax.lax.while_loop(
        cond, body, (factor(log_sn0), log_sn0, jnp.zeros((), jnp.int32)))
    hyp = hyp.at[-2].set(log_sn)
    r = jnp.where(real, y_pad - hyp_mean(hyp), 0.0)
    return hyp, f, solver.solve(f, r), solver.ok(f)


@partial(jax.jit, static_argnames=("kernel", "solver"))
def predict_masked(kernel: KernelSpec, hyp, x_pad, f, invKys, n_real, xs,
                   solver: SolverSpec = CHOL):
    """Batched posterior over the padded buffer (pad columns contribute 0)."""
    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    real = (jnp.arange(x_pad.shape[0]) < n_real)[None, :]
    kt = jnp.where(real, kernel.k(chyp, xs, x_pad), 0.0)     # (T, cap)
    mu = hyp_mean(hyp) + kt @ invKys
    kks = solver.solve(f, kt.T)
    sf2 = kernel.diag_k(chyp, xs)
    s2 = jnp.maximum(sf2 - jnp.sum(kt * kks.T, axis=1), 0.0) + hyp_sn2(hyp)
    return mu, s2


@partial(jax.jit, static_argnames=("kernel",))
def append_posterior_masked(kernel: KernelSpec, hyp, x_pad, y_pad, n_old,
                            L, x_new, y_new):
    """O(cap^2) posterior append: one new point enters the Cholesky factor.

    With the masked-capacity layout the factor is blockdiag(L_real, I), so
    appending a point at index n_old only writes one new row:

        l      = L_real^{-1} k(X, x_new)
        L[n,n] = sqrt(k(x,x) + sn2 - |l|^2)

    followed by the O(cap^2) triangular re-solve for invKys — versus the
    O(cap^3) refactorization of set_k_masked.  The reference pays the full
    refit on every BO step (GP.cpp:43-55 + train); this is the serving
    fast path when hyperparameters are kept fixed.

    Returns (x_pad', y_pad', L', invKys', ok) — ok=False when the appended
    pivot is not positive (caller falls back to set_k_masked).
    """
    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    cap = x_pad.shape[0]

    x_pad = jax.lax.dynamic_update_slice(x_pad, x_new[None, :], (n_old, 0))
    y_pad = jax.lax.dynamic_update_slice(
        y_pad, jnp.reshape(y_new, (1,)), (n_old,))

    ids = jnp.arange(cap)
    below = (ids < n_old).astype(x_pad.dtype)
    kvec = kernel.k(chyp, x_new[None, :], x_pad)[0] * below    # (cap,)
    l = solve_triangular(L, kvec, lower=True)                  # pads -> 0
    knn = kernel.diag_k(chyp, x_new[None, :])[0] + sn2
    piv2 = knn - jnp.dot(l, l)
    ok = piv2 > 0
    newrow = l.at[n_old].set(jnp.sqrt(jnp.maximum(piv2, 0.0)))
    L = jax.lax.dynamic_update_slice(L, newrow[None, :], (n_old, 0))

    r = jnp.where(ids < n_old + 1, y_pad - hyp_mean(hyp), 0.0)
    z = solve_triangular(L, r, lower=True)
    invKys = solve_triangular(L, z, lower=True, trans=1)
    return x_pad, y_pad, L, invKys, ok
