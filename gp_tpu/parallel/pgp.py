"""Distributed exact-GP: sharded NLL + analytic gradient, fit, posterior.

Scales the exact-GP pipeline (models/exact.py) past single-chip HBM by
block-cyclic row-sharding the N x N kernel matrix over mesh axis "rows"
(layout + factorization: parallel/pchol.py).  Everything runs as per-device
code inside shard_map; ICI collectives (psum / all_gather) carry the panel
broadcasts and reductions.

The NLL gradient is ANALYTIC (reference GP.cpp:151-171):

    Q      = K^{-1} - alpha alpha^T
    g_covK = 0.5 * sum(Q o dK/dtheta)     -- via jax.vjp of the LOCAL
                                             K-row-block builder (kernel-
                                             generic; no collectives inside
                                             the vjp, so it is shard-safe)
    g_sn   = sn2 * tr(Q)                  -- log-sigma_n parameterization
    g_mean = -sum(alpha)

rather than autodiff through the unrolled distributed Cholesky, which would
checkpoint O(nb) N x B panels per step.  K^{-1} is STREAMED: W = L^{-1}
rows via the distributed TRSM, then each local row block of K^{-1} comes
from one sliced SYRK + psum_scatter (pchol.pkinv_rowblock_local) and is
contracted immediately — ~2 N^2/P live buffers per device where the
reference's explicit MatrixSolver::inverse analog would hold ~4.

Padding: N is padded to a multiple of n_dev*block with identity rows/cols
(K_pad = blockdiag(K, I), r_pad = [r; 0]) — log|K_pad| = log|K| and
alpha_pad = [alpha; 0], so NLL terms are unchanged and padded entries are
constants in the builder (zero cotangent in the vjp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import INF
from ..models.base import from_opt_vec, hyp_mean, hyp_sn2, sanitize_value_and_grad
from ..ops.kernels import KernelSpec
from ..optim.lbfgsb import LBFGSBResult, lbfgsb_impl
from . import pchol

shard_map = jax.shard_map

AXIS = "rows"


# --------------------------------------------------------------------------
# In-shard_map pieces
# --------------------------------------------------------------------------

def _build_k0_local(kernel: KernelSpec, chyp, x_pad, n_real: int,
                    n_dev: int, block: int):
    """This device's row blocks of K0_pad (no noise): (nbl, B, N_pad).

    Padded rows/cols are masked to the identity, so they are constants with
    respect to chyp (zero cotangent under vjp).
    """
    g = pchol._local_blocks(x_pad.shape[0] // (block * n_dev), n_dev, AXIS)
    row_ids = g[:, None] * block + jnp.arange(block)[None, :]     # (nbl, B)
    x_rows = x_pad[row_ids.reshape(-1)]                           # (nbl*B, d)
    k = kernel.k(chyp, x_rows, x_pad).reshape(
        g.shape[0], block, x_pad.shape[0])
    col_ids = jnp.arange(x_pad.shape[0])
    pad = (row_ids[:, :, None] >= n_real) | (col_ids[None, None, :] >= n_real)
    eye = (row_ids[:, :, None] == col_ids[None, None, :]).astype(k.dtype)
    return jnp.where(pad, eye, k), row_ids


def _add_diag_local(K_loc, row_ids, n_real: int, val):
    """Add `val` to the real diagonal entries of local row blocks."""
    col_ids = jnp.arange(K_loc.shape[-1])
    on_diag = (row_ids[:, :, None] == col_ids[None, None, :]) & (
        row_ids[:, :, None] < n_real)
    return K_loc + jnp.where(on_diag, val, 0.0)


def pnll_vg_local(kernel: KernelSpec, hyp, x_pad, y_pad, n_real: int,
                  n_dev: int, block: int):
    """(NLL, dNLL/dhyp) on this device's shard; both psum-replicated.

    NaN/inf propagate (caller sanitizes) — GP.cpp:120-176 semantics.
    """
    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    mean = hyp_mean(hyp)

    K0_loc, row_ids = _build_k0_local(kernel, chyp, x_pad, n_real,
                                      n_dev, block)
    K_loc = _add_diag_local(K0_loc, row_ids, n_real, sn2)
    L_loc = pchol.pchol_local(K_loc, n_dev, AXIS)

    real = (row_ids < n_real).astype(x_pad.dtype)                  # (nbl, B)
    r_full = jnp.where(jnp.arange(x_pad.shape[0]) < n_real,
                       y_pad - mean, 0.0)
    r_loc = r_full[row_ids][..., None]                             # (nbl, B, 1)

    a_loc = pchol.pchol_solve_local(L_loc, r_loc, n_dev, AXIS)     # alpha rows
    data_fit = 0.5 * jax.lax.psum(jnp.sum(r_loc * a_loc), AXIS)
    logdet = pchol.plogdet_local(L_loc, n_dev, AXIS)
    nll = data_fit + 0.5 * logdet + 0.5 * n_real * jnp.log(2 * jnp.pi)

    # ---- analytic gradient, streamed (GP.cpp:151-171 semantics) -----------
    # K^{-1} is NEVER materialized: W = L^{-1} (rows, sharded) is the only
    # N^2/P gradient buffer next to L_loc, and each local row block's
    # Q_g = K^{-1}[g-rows] - alpha_g alpha^T is produced by one sliced
    # SYRK + psum_scatter (pchol.pkinv_rowblock_local) and contracted
    # IMMEDIATELY against a per-block kernel-row rebuild via vjp —
    # the shard_map analog of exact.nll_vg_streamed.  Live working set
    # ~2 N^2/P buffers (vs ~4 with pinv_from_chol_local); per-tile vjp
    # rebuild costs O(N^2 d / P) total, nothing at the O(N^3/P) scale.
    N_pad = x_pad.shape[0]
    nbl = N_pad // (block * n_dev)

    # W = L^{-1} rows: the identity-RHS TRSM specialized to W's
    # lower-triangular structure — ~N^3/6P FLOPs and half the broadcast
    # bytes of the generic ptrsm path (pchol.pinv_rows_local)
    W = pchol.pinv_rows_local(L_loc, n_dev, AXIS)

    # replicated full alpha from the sharded rows
    a_gath = jax.lax.all_gather(a_loc[..., 0], AXIS)               # (P,nbl,B)
    a_full = a_gath.transpose(1, 0, 2).reshape(-1)                 # natural
    col_real = jnp.arange(N_pad) < n_real

    g_cov = jnp.zeros((chyp.shape[0],), hyp.dtype)
    tr_loc = jnp.zeros((), hyp.dtype)
    for l in range(nbl):                                 # static unroll
        Kinv_g = pchol.pkinv_rowblock_local(W, l, n_dev, AXIS)     # (B, N)
        rid = row_ids[l]                                           # (B,)
        a_g = a_loc[l, :, 0]
        Q_g = Kinv_g - a_g[:, None] * a_full[None, :]
        # padded rows/cols are constants of the builder: zero cotangent
        Q_g = jnp.where((rid[:, None] < n_real) & col_real[None, :],
                        Q_g, 0.0)
        x_g = x_pad[rid]                                           # (B, d)
        _, vjp = jax.vjp(lambda c: kernel.k(c, x_g, x_pad), chyp)
        g_cov = g_cov + 0.5 * vjp(Q_g)[0]
        diag_g = jnp.take_along_axis(Kinv_g, rid[:, None], axis=1)[:, 0]
        tr_loc = tr_loc + jnp.sum(
            real[l] * (diag_g - a_g ** 2))
    g_cov = jax.lax.psum(g_cov, AXIS)
    tr_Q = jax.lax.psum(tr_loc, AXIS)
    g_sn = sn2 * tr_Q
    g_mean = -jax.lax.psum(jnp.sum(a_loc), AXIS)

    grad = jnp.concatenate([g_cov, jnp.array([g_sn, g_mean], hyp.dtype)])
    return nll, grad


# --------------------------------------------------------------------------
# Jitted module-level wrappers
# --------------------------------------------------------------------------

def _pad_xy(x, y, n_dev: int, block: int):
    n = x.shape[0]
    pad = pchol.pad_amount(n, n_dev, block)
    # single choke point for the int32-addressing wall: every distributed
    # entry (pnll_vg/pfit/pset_k/pfit_multistart, multihost.*) pads here
    pchol.check_shard_addressable(n + pad, n_dev)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
    return x, y, n


def _rep(mesh):
    return NamedSharding(mesh, P())


@partial(jax.jit, static_argnames=("kernel", "n_real", "n_dev", "block", "mesh"))
def _pnll_program(kernel, hyp, x_pad, y_pad, n_real, n_dev, block, mesh):
    body = lambda h, x, y: pnll_vg_local(kernel, h, x, y, n_real,
                                         n_dev, block)
    return shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                     out_specs=(P(), P()), check_vma=False)(hyp, x_pad, y_pad)


def pnll_vg(kernel: KernelSpec, hyp, x, y, mesh: Mesh, block: int | None = None):
    """Distributed (NLL, grad) over the full hyp vector; INF-sanitized.

    block=None picks pchol.auto_block (bounded panel count at any N)."""
    n_dev = mesh.shape[AXIS]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], n_dev)
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), n_dev, block)
    f, g = _pnll_program(kernel, jnp.asarray(hyp, x_pad.dtype), x_pad, y_pad,
                         n, n_dev, block, mesh)
    return sanitize_value_and_grad(f, g)


@partial(jax.jit,
         static_argnames=("kernel", "noise_free", "n_real", "n_dev", "block",
                          "max_evals", "mesh"))
def _pfit_program(kernel, noise_free, vec0, lb, ub, x_pad, y_pad, n_real,
                  n_dev, block, max_evals, mesh):
    def body(vec0, lb, ub, x, y):
        def fun(v):
            hyp = from_opt_vec(v, noise_free)
            f, g = pnll_vg_local(kernel, hyp, x, y, n_real, n_dev, block)
            gv = jnp.concatenate([g[:-2], g[-1:]]) if noise_free else g
            return sanitize_value_and_grad(f, gv)
        res = lbfgsb_impl(fun, vec0, lb, ub, max_evals=max_evals)
        return res.x, res.f, res.g, res.evals, res.converged

    out = shard_map(body, mesh=mesh, in_specs=(P(),) * 5,
                    out_specs=(P(),) * 5, check_vma=False)(
        vec0, lb, ub, x_pad, y_pad)
    return out


def pfit(kernel: KernelSpec, noise_free: bool, x, y, vec0, lb, ub,
         mesh: Mesh, block: int | None = None, max_evals: int = 160) -> LBFGSBResult:
    """Distributed bounded MLE fit: the whole L-BFGS-B loop runs on-device;
    each objective evaluation factors the block-cyclic sharded K (pchol) and
    assembles the analytic gradient with psums — GP::train at pod scale.

    Float32 note: pass STANDARDIZED targets ((y - mean)/std with
    correspondingly shifted hyp bounds — see models/base.py) or use
    GP.train_distributed, which does it for you; raw large-scale y puts
    the f32 objective on a rounding plateau (DESIGN.md precision policy).
    """
    n_dev = mesh.shape[AXIS]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], n_dev)
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), n_dev, block)
    dt = x_pad.dtype
    out = _pfit_program(kernel, noise_free, jnp.asarray(vec0, dt),
                        jnp.asarray(lb, dt), jnp.asarray(ub, dt),
                        x_pad, y_pad, n, n_dev, block, max_evals, mesh)
    return LBFGSBResult(*out)


def pfit_hosted(kernel: KernelSpec, noise_free: bool, x, y, vec0, lb, ub,
                mesh: Mesh, block: int | None = None,
                max_evals: int = 160) -> LBFGSBResult:
    """pfit with the L-BFGS-B loop on the HOST: each objective evaluation
    is ONE distributed device program (pnll_vg).

    Two reasons to prefer this over the monolithic jitted pfit:
    * runtimes with a single-execution watchdog (this image's remote
      tunnel kills executions past ~60-100 s — a 160-eval program at
      2.6 s/eval on one chip at N=32768 is far past it);
    * pod-scale fits where per-evaluation host control (logging,
      checkpointing the incumbent, early stopping) is worth the ~30 ms
      dispatch per step against multi-second evaluations.
    GP.train_distributed routes here automatically when the estimated
    monolithic program would breach the watchdog.
    """
    from ..optim.lbfgsb import lbfgsb_hosted

    n_dev = mesh.shape[AXIS]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], n_dev)
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), n_dev, block)
    dt = x_pad.dtype

    def fun(v):
        hyp = from_opt_vec(v, noise_free)
        f, g = _pnll_program(kernel, hyp, x_pad, y_pad, n, n_dev, block,
                             mesh)
        gv = jnp.concatenate([g[:-2], g[-1:]]) if noise_free else g
        return sanitize_value_and_grad(f, gv)

    return lbfgsb_hosted(fun, jnp.asarray(vec0, dt), jnp.asarray(lb, dt),
                         jnp.asarray(ub, dt), max_evals=max_evals)


@partial(jax.jit, static_argnames=("kernel", "n_real", "n_dev", "block", "mesh"))
def _pfactor_program(kernel, hyp, x_pad, y_pad, n_real, n_dev, block, mesh):
    """Factor K(hyp) distributed; return (L_loc sharded, ok, invKys)."""
    def body(hyp, x, y):
        nc = kernel.num_hyp(x.shape[1])
        K0, row_ids = _build_k0_local(kernel, hyp[:nc], x, n_real,
                                      n_dev, block)
        K = _add_diag_local(K0, row_ids, n_real, hyp_sn2(hyp))
        L = pchol.pchol_local(K, n_dev, AXIS)
        d = jax.vmap(lambda Lr, ri: Lr[jnp.arange(Lr.shape[0]), ri])(
            L, row_ids)
        ok = jax.lax.psum(jnp.sum(jnp.where(
            jnp.isfinite(d) & (d > 0), 0, 1)), AXIS) == 0
        r_full = jnp.where(jnp.arange(x.shape[0]) < n_real,
                           y - hyp_mean(hyp), 0.0)
        a = pchol.pchol_solve_local(L, r_full[row_ids][..., None],
                                    n_dev, AXIS)
        a_gath = jax.lax.all_gather(a[..., 0], AXIS)
        invKys = a_gath.transpose(1, 0, 2).reshape(-1)
        return L[:, None], ok, invKys

    return shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                     out_specs=(P(None, AXIS), P(), P()),
                     check_vma=False)(hyp, x_pad, y_pad)


def pset_k(kernel: KernelSpec, hyp, x, y, mesh: Mesh, block: int | None = None,
           max_tries: int = 32):
    """Distributed posterior cache with the reference's noise-inflation
    rescue (GP::_setK, GP.cpp:423-444): while the sharded Cholesky fails,
    log sigma_n += log sqrt(10) (restarting at log eps from -inf).

    Returns (hyp', L_sharded (nbl, P, B, N_pad), invKys (N,) replicated,
    ok).  `ok` is False only when every one of max_tries inflation rounds
    still produced a failed factorization — in that case L/invKys contain
    NaN and MUST NOT be cached as a serving posterior.
    """
    n_dev = mesh.shape[AXIS]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], n_dev)
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), n_dev, block)
    hyp = jnp.asarray(hyp, x_pad.dtype)
    eps = float(jnp.finfo(x_pad.dtype).eps)

    log_sn = float(hyp[-2])
    ok = False
    for _ in range(max_tries):
        L, ok, invKys = _pfactor_program(
            kernel, hyp.at[-2].set(log_sn), x_pad, y_pad, n, n_dev, block,
            mesh)
        if bool(ok):
            break
        log_sn = (np.log(eps) if np.isinf(log_sn)
                  else log_sn + 0.5 * np.log(10.0))
    hyp = hyp.at[-2].set(log_sn)
    return hyp, L, invKys[:n], bool(ok)


@partial(jax.jit, static_argnames=("n_dev", "block", "mesh"))
def _pquad_program(kt_pad, L, n_dev, block, mesh):
    """sum(k* o K^{-1} k*) per test point via the distributed solve.

    kt_pad: (N_pad, T) cross-covariance columns, padded rows zeroed."""
    def body(L, ktb):
        L, ktb = L.squeeze(1), ktb.squeeze(1)
        kks = pchol.pchol_solve_local(L, ktb, n_dev, AXIS)
        return jax.lax.psum(jnp.einsum("lbt,lbt->t", ktb, kks), AXIS)

    ktb = pchol.blocked_layout(kt_pad, n_dev, block)
    return shard_map(body, mesh=mesh,
                     in_specs=(P(None, AXIS), P(None, AXIS)),
                     out_specs=P(), check_vma=False)(L, ktb)


@partial(jax.jit,
         static_argnames=("kernel", "n_real", "n_dev", "block", "mesh"))
def _ppredict_program(kernel, hyp, x_pad, L, invKys, xs, n_real, n_dev,
                      block, mesh):
    """Fully-jitted distributed predict (multi-host safe: every op on the
    global arrays happens inside this one program)."""
    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    kt = kernel.k(chyp, xs, x_pad[:n_real])               # (T, N)
    mu = hyp_mean(hyp) + kt @ invKys
    kt_pad = jnp.zeros((x_pad.shape[0], xs.shape[0]), x_pad.dtype
                       ).at[:n_real, :].set(kt.T)
    quad = _pquad_program.__wrapped__(kt_pad, L, n_dev, block, mesh)
    s2 = jnp.maximum(kernel.diag_k(chyp, xs) - quad, 0.0) + hyp_sn2(hyp)
    return mu, s2


def ppredict(kernel: KernelSpec, hyp, x, L, invKys, xs, mesh: Mesh,
             block: int | None = None):
    """Distributed batch posterior (GP::_predict semantics, GP.cpp:273-297):
    mean via the cached invKys (O(NT)), variance via the sharded solve.

    `block` defaults to the factor's own blocking (L is (nbl, P, B, N_pad))."""
    n_dev = mesh.shape[AXIS]
    if block is None:
        block = L.shape[2]
    x = jnp.asarray(x)
    xs = jnp.asarray(xs, x.dtype)
    x_pad, _, n = _pad_xy(x, jnp.zeros((x.shape[0],), x.dtype), n_dev, block)
    hyp = jnp.asarray(hyp, x.dtype)
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]

    # one (T, N) cross-covariance build serves both mean and variance
    kt = kernel.k(chyp, xs, x)                            # (T, N)
    mu = hyp_mean(hyp) + kt @ invKys
    kt_pad = jnp.zeros((x_pad.shape[0], xs.shape[0]), x.dtype
                       ).at[:n, :].set(kt.T)
    quad = _pquad_program(kt_pad, L, n_dev, block, mesh)
    s2 = jnp.maximum(kernel.diag_k(chyp, xs) - quad, 0.0) + hyp_sn2(hyp)
    return mu, s2


@partial(jax.jit,
         static_argnames=("kernel", "noise_free", "n_real", "n_dev_rows",
                          "n_starts", "block", "max_evals", "mesh"))
def _pfit_multistart_program(kernel, noise_free, vec0s, lb, ub, x_pad, y_pad,
                             n_real, n_dev_rows, n_starts, block, max_evals,
                             mesh):
    def body(vecs, lb, ub, x, y):
        # vecs: (1, nh) — this device's start along the "starts" axis
        def fun(v):
            hyp = from_opt_vec(v, noise_free)
            f, g = pnll_vg_local(kernel, hyp, x, y, n_real, n_dev_rows,
                                 block)
            gv = jnp.concatenate([g[:-2], g[-1:]]) if noise_free else g
            return sanitize_value_and_grad(f, gv)

        res = lbfgsb_impl(fun, vecs[0], lb, ub, max_evals=max_evals)
        f = jnp.where(jnp.isfinite(res.f), res.f, INF)
        # best across the restart population
        fs = jax.lax.all_gather(f, "starts")                 # (S,)
        xs = jax.lax.all_gather(res.x, "starts")             # (S, nh)
        best = jnp.argmin(fs)
        return xs[best], fs[best]

    return shard_map(
        body, mesh=mesh,
        in_specs=(P("starts", None), P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False)(vec0s, lb, ub, x_pad, y_pad)


def pfit_multistart(kernel: KernelSpec, noise_free: bool, x, y, vec0s, lb,
                    ub, mesh: Mesh, block: int | None = None, max_evals: int = 160):
    """Two-axis distributed multi-start MLE over a ("starts", "rows") mesh.

    The restart population shards over "starts" (each submesh runs its own
    full L-BFGS-B); within each restart the N x N kernel matrix is
    block-cyclic over "rows" with the distributed Cholesky + analytic psum
    gradient.  This composes the reference's MVMO-restart axis with the
    O(N^3) factorization axis — the GP analog of dp x tp sharding.

    vec0s: (n_starts, num_opt_vars) start points, n_starts == mesh "starts"
    size.  Returns (best_vec, best_f) replicated.
    """
    n_rows = mesh.shape[AXIS]
    n_starts = mesh.shape["starts"]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], n_rows)
    vec0s = jnp.asarray(vec0s)
    assert vec0s.shape[0] == n_starts, (
        f"need one start per 'starts' submesh ({n_starts}), got "
        f"{vec0s.shape[0]}")
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), n_rows, block)
    dt = x_pad.dtype
    return _pfit_multistart_program(
        kernel, noise_free, jnp.asarray(vec0s, dt), jnp.asarray(lb, dt),
        jnp.asarray(ub, dt), x_pad, y_pad, n, n_rows, n_starts, block,
        max_evals, mesh)


@partial(jax.jit, static_argnames=("n_dev", "block", "mesh"))
def _psolve_columns(kt_pad, L, n_dev, block, mesh):
    """K^{-1} kt for T columns via the distributed solve; result gathered
    to natural row order (replicated) for host-side gradient assembly."""
    def body(L, ktb):
        L, ktb = L.squeeze(1), ktb.squeeze(1)
        kks = pchol.pchol_solve_local(L, ktb, n_dev, AXIS)   # (nbl, B, T)
        full = jax.lax.all_gather(kks, AXIS)                  # (P, nbl, B, T)
        return full.transpose(1, 0, 2, 3).reshape(kt_pad.shape)

    ktb = pchol.blocked_layout(kt_pad, n_dev, block)
    return shard_map(body, mesh=mesh,
                     in_specs=(P(None, AXIS), P(None, AXIS)),
                     out_specs=P(), check_vma=False)(L, ktb)


def ppredict_with_grad(kernel: KernelSpec, hyp, x, L, invKys, xs, mesh: Mesh,
                       block: int | None = None):
    """(y, gy, s2, gs2) off the SHARDED posterior — the BO acquisition path
    (GP.cpp:284-296 semantics: gy = dk*/dx . invKys, gs2 = -2 dk*/dx .
    (K^{-1} k*), the variance clamp excluded from the gradient)."""
    n_dev = mesh.shape[AXIS]
    if block is None:
        block = L.shape[2]
    x = jnp.asarray(x)
    xs = jnp.asarray(xs, x.dtype)
    x_pad, _, n = _pad_xy(x, jnp.zeros((x.shape[0],), x.dtype), n_dev, block)
    hyp = jnp.asarray(hyp, x.dtype)
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]

    kt = kernel.k(chyp, xs, x)                           # (T, N)
    kt_pad = jnp.zeros((x_pad.shape[0], xs.shape[0]), x.dtype
                       ).at[:n, :].set(kt.T)
    kks = _psolve_columns(kt_pad, L, n_dev, block, mesh)[:n]   # (N, T)

    yfun = lambda xi: hyp_mean(hyp) + jnp.dot(
        kernel.k(chyp, xi[None, :], x)[0], invKys)
    y, gy = jax.vmap(jax.value_and_grad(yfun))(xs)

    sf2 = kernel.diag_k(chyp, xs)
    s2 = jnp.maximum(sf2 - jnp.einsum("tn,nt->t", kt, kks), 0.0) \
        + hyp_sn2(hyp)

    def gs2_one(xi, kks_t):
        _, vjp = jax.vjp(lambda z: kernel.k(chyp, z[None, :], x)[0], xi)
        return vjp(-2.0 * kks_t)[0]

    gs2 = jax.vmap(gs2_one)(xs, kks.T)
    return y, gy, s2, gs2
