"""Distributed FITC / VFE: training data sharded over the mesh.

The sparse objectives are sums over the N training rows of O(M)/O(M^2)
row-local quantities plus replicated M x M algebra (models/fitc.py,
models/vfe.py) — the ideal data-parallel shape: shard x/y rows over mesh
axis "rows", build each device's (n_loc, M) cross-covariance panel locally,
and combine with psum.  ICI traffic per NLL evaluation is a handful of
M x M / M-vector reductions — independent of N.

Gradients come from jax.grad straight through the shard_map (psum and the
replicated Cholesky factors are linear/differentiable), so the same
L-BFGS-B pipeline as the single-device models applies, at N limited only by
aggregate pod HBM (BASELINE.json config: FITC at N=100k+).

Padding: N is padded to a multiple of the mesh size with masked rows
(Kxu = 0, r = 0, Gamma = 1), which contribute exactly zero to every sum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.base import from_opt_vec, hyp_mean, hyp_sn2, sanitize_value_and_grad
from ..ops.chol import chol_logdet, chol_solve, cholesky, solve_lower
from ..ops.kernels import KernelSpec
from ..optim.lbfgsb import LBFGSBResult, lbfgsb_impl

AXIS = "rows"

shard_map = jax.shard_map


def _pad_rows(x, y, n_dev: int):
    n = x.shape[0]
    pad = (-n) % n_dev
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
    mask = (jnp.arange(x.shape[0]) < n).astype(x.dtype)
    return x, y, mask, n


def _fitc_nll_local(kernel: KernelSpec, hyp, x_loc, y_loc, mask_loc, u,
                    jitter, n_real: int):
    """FITC NLL (FITC.cpp:201-228) with row-local work sharded."""
    m = u.shape[0]
    nc = kernel.num_hyp(x_loc.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    r = (y_loc - hyp_mean(hyp)) * mask_loc

    Kuu = kernel.k(chyp, u, u) + jitter * jnp.eye(m, dtype=x_loc.dtype)
    Luu = cholesky(Kuu)                                   # replicated
    Kxu = kernel.k(chyp, x_loc, u) * mask_loc[:, None]    # (n_loc, M)

    V = solve_lower(Luu, Kxu.T)                           # (M, n_loc)
    qdiag = jnp.sum(V * V, axis=0)
    sf2 = kernel.diag_k(chyp, x_loc)
    gamma = jnp.where(mask_loc > 0,
                      1.0 + jnp.maximum(sf2 - qdiag, 0.0) / sn2, 1.0)
    inv_gamma = 1.0 / gamma

    B = jax.lax.psum((Kxu.T * inv_gamma) @ Kxu, AXIS)     # (M, M)
    A = sn2 * Kuu + B
    LA = cholesky(A)

    t1 = jax.lax.psum(Kxu.T @ (inv_gamma * r), AXIS)      # (M,)
    Ainv_t1 = chol_solve(LA, t1)
    fit = jax.lax.psum(
        jnp.dot(inv_gamma * r, r - Kxu @ Ainv_t1), AXIS) / sn2
    log_gamma = jax.lax.psum(jnp.sum(jnp.log(gamma)), AXIS)
    complexity = (chol_logdet(LA) - chol_logdet(Luu) + log_gamma
                  + (n_real - m) * jnp.log(sn2))
    return 0.5 * (fit + complexity + n_real * jnp.log(2 * jnp.pi))


def _vfe_nll_local(kernel: KernelSpec, hyp, x_loc, y_loc, mask_loc, u,
                   jitter, n_real: int):
    """VFE NLL (VFE.cpp:161-189) with row-local work sharded."""
    m = u.shape[0]
    nc = kernel.num_hyp(x_loc.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)
    r = (y_loc - hyp_mean(hyp)) * mask_loc

    Kuu = kernel.k(chyp, u, u) + jitter * jnp.eye(m, dtype=x_loc.dtype)
    Luu = cholesky(Kuu)
    Kxu = kernel.k(chyp, x_loc, u) * mask_loc[:, None]

    Kuxxu = jax.lax.psum(Kxu.T @ Kxu, AXIS)
    A = sn2 * Kuu + Kuxxu
    LA = cholesky(A)

    Kxr = jax.lax.psum(Kxu.T @ r, AXIS)
    AinvKxr = chol_solve(LA, Kxr)
    data_fit = 0.5 * jax.lax.psum(
        jnp.dot(r, r - Kxu @ AinvKxr), AXIS) / sn2
    complexity = 0.5 * (chol_logdet(LA) - chol_logdet(Luu)
                        + (n_real - m) * jnp.log(sn2))
    V = solve_lower(Luu, Kxu.T)
    sf2_sum = jax.lax.psum(jnp.sum(kernel.diag_k(chyp, x_loc) * mask_loc),
                           AXIS)
    vv = jax.lax.psum(jnp.sum(V * V), AXIS)
    trace_term = 0.5 * jnp.maximum(sf2_sum - vv, 0.0) / sn2
    return (0.5 * n_real * jnp.log(2 * jnp.pi) + complexity + data_fit
            + trace_term)


_LOCALS = {"fitc": _fitc_nll_local, "vfe": _vfe_nll_local}


@partial(jax.jit,
         static_argnames=("kernel", "model", "n_real", "mesh"))
def _pnll_program(kernel, model, hyp, xb, yb, maskb, u, jitter, n_real,
                  mesh):
    local = _LOCALS[model]
    body = lambda h, x, y, mk, uu, jt: local(kernel, h, x, y, mk, uu, jt,
                                             n_real)
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=P(), check_vma=False)(hyp, xb, yb, maskb, u, jitter)


def pnll_sparse(model: str, kernel: KernelSpec, hyp, x, y, u, jitter,
                mesh: Mesh):
    """Distributed FITC/VFE NLL (scalar, replicated)."""
    n_dev = mesh.shape[AXIS]
    xb, yb, maskb, n = _pad_rows(jnp.asarray(x), jnp.asarray(y), n_dev)
    return _pnll_program(kernel, model, jnp.asarray(hyp, xb.dtype), xb, yb,
                         maskb, jnp.asarray(u, xb.dtype),
                         jnp.asarray(jitter, xb.dtype), n, mesh)


@partial(jax.jit,
         static_argnames=("kernel", "model", "noise_free", "n_real",
                          "max_evals", "mesh"))
def _pfit_program(kernel, model, noise_free, vec0, lb, ub, xb, yb, maskb, u,
                  jitter, n_real, max_evals, mesh):
    local = _LOCALS[model]

    def fun(v):
        def scalar(vv):
            hyp = from_opt_vec(vv, noise_free)
            body = lambda h, x, y, mk, uu, jt: local(
                kernel, h, x, y, mk, uu, jt, n_real)
            return shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(), P()),
                out_specs=P(), check_vma=False)(hyp, xb, yb, maskb, u,
                                                jitter)
        f, g = jax.value_and_grad(scalar)(v)
        return sanitize_value_and_grad(f, g)

    res = lbfgsb_impl(fun, vec0, lb, ub, max_evals=max_evals)
    return res.x, res.f, res.g, res.evals, res.converged


def pfit_sparse(model: str, kernel: KernelSpec, noise_free: bool, x, y, u,
                jitter, vec0, lb, ub, mesh: Mesh,
                max_evals: int = 130) -> LBFGSBResult:
    """Distributed bounded MLE fit for FITC ('fitc') or VFE ('vfe')."""
    n_dev = mesh.shape[AXIS]
    xb, yb, maskb, n = _pad_rows(jnp.asarray(x), jnp.asarray(y), n_dev)
    dt = xb.dtype
    out = _pfit_program(kernel, model, noise_free, jnp.asarray(vec0, dt),
                        jnp.asarray(lb, dt), jnp.asarray(ub, dt), xb, yb,
                        maskb, jnp.asarray(u, dt), jnp.asarray(jitter, dt),
                        n, max_evals, mesh)
    return LBFGSBResult(*out)


@partial(jax.jit, static_argnames=("kernel", "model", "n_real", "mesh",
                                   "max_tries"))
def _pset_k_program(kernel, model, hyp, xb, yb, maskb, u, jitter0, n_real,
                    mesh, max_tries=64):
    """Distributed posterior cache: jitter-doubling loop (FITC.cpp:165-200 /
    VFE.cpp:132-160) with the O(N M) panels sharded; the returned
    (Luu, LA, alpha) are replicated M-sized arrays, so the SINGLE-DEVICE
    predict functions (models/fitc.py, models/vfe.py) serve them as-is."""
    from ..ops.chol import chol_ok

    def body_fn(h, x_loc, y_loc, mk, uu, jit0):
        m = uu.shape[0]
        nc = kernel.num_hyp(x_loc.shape[1])
        chyp = h[:nc]
        sn2 = hyp_sn2(h)
        r = (y_loc - hyp_mean(h)) * mk
        eye = jnp.eye(m, dtype=x_loc.dtype)
        Kuu0 = kernel.k(chyp, uu, uu)
        Kxu = kernel.k(chyp, x_loc, uu) * mk[:, None]
        sf2 = kernel.diag_k(chyp, x_loc)
        Kuxxu = jax.lax.psum(Kxu.T @ Kxu, AXIS)

        if model == "fitc":
            def attempt(jitter, a_jitter):
                Luu = cholesky(Kuu0 + jitter * eye)
                V = solve_lower(Luu, Kxu.T)
                qdiag = jnp.sum(V * V, axis=0)
                ig = jnp.where(
                    mk > 0,
                    1.0 / (1.0 + jnp.maximum(sf2 - qdiag, 0.0) / sn2), 1.0)
                A = sn2 * Kuu0 + jax.lax.psum((Kxu.T * ig) @ Kxu, AXIS)
                LA = cholesky(A + a_jitter * eye)
                return Luu, LA, ig
        else:
            def attempt(added, _unused):
                Kuu = Kuu0 + added * eye
                A = Kuu + Kuxxu / sn2
                return cholesky(Kuu), cholesky(A), jnp.ones_like(mk)

        def cond(st):
            Luu, LA, _, _, tries = st
            return jnp.logical_and(~(chol_ok(Luu) & chol_ok(LA)),
                                   tries < max_tries)

        if model == "fitc":
            def step(st):
                _, _, _, jitter, tries = st
                jitter = jitter * 2.0
                Luu, LA, ig = attempt(jitter, jitter)
                return Luu, LA, ig, jitter, tries + 1
            init = (*attempt(jit0, jnp.zeros((), x_loc.dtype)), jit0,
                    jnp.zeros((), jnp.int32))
        else:
            def step(st):
                _, _, _, carry, tries = st
                added, jitter = carry
                added = added + jitter
                Luu, LA, ig = attempt(added, None)
                return Luu, LA, ig, (added, jitter * 2.0), tries + 1
            zero = jnp.zeros((), x_loc.dtype)
            init = (*attempt(zero, None), (zero, jit0),
                    jnp.zeros((), jnp.int32))

        Luu, LA, ig, carry, _ = jax.lax.while_loop(cond, step, init)
        if model == "fitc":
            alpha = chol_solve(LA, jax.lax.psum(Kxu.T @ (ig * r), AXIS))
            jit_out = carry
        else:
            alpha = chol_solve(LA, jax.lax.psum(Kxu.T @ r, AXIS)) / sn2
            jit_out = carry[0]
        return Luu, LA, alpha, jit_out, chol_ok(Luu) & chol_ok(LA)

    return shard_map(
        body_fn, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False)(
        hyp, xb, yb, maskb, u, jitter0)


def pset_k_sparse(model: str, kernel: KernelSpec, hyp, x, y, u, jitter0,
                  mesh: Mesh):
    """Distributed _setK for FITC/VFE; returns (Luu, LA, alpha, jitter, ok)
    compatible with the single-device predict functions."""
    n_dev = mesh.shape[AXIS]
    xb, yb, maskb, n = _pad_rows(jnp.asarray(x), jnp.asarray(y), n_dev)
    return _pset_k_program(kernel, model, jnp.asarray(hyp, xb.dtype), xb,
                           yb, maskb, jnp.asarray(u, xb.dtype),
                           jnp.asarray(jitter0, xb.dtype), n, mesh)
