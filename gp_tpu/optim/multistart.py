"""Global hyperparameter search: vectorized multi-start.

TPU-native replacement for the MVMO derivative-free global optimizer the
reference vendors as a submodule (GP.cpp:463-485, select_init_hyp): uniform
random candidates in the bound box are scored with a vmapped NLL, evaluated
in chunks (each candidate costs an O(N^3) factorization — chunking bounds
peak memory), and the best finite candidate wins; if everything is infinite
the caller's default hyps are returned (GP.cpp:484).

A sharded variant that spreads candidates across a device mesh lives in
gp_tpu.parallel.pmultistart.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import INF


def sample_box(key, lb, ub, num, dtype=None):
    """Uniform candidates in [lb, ub]; infinite bounds are clamped to a
    finite window so sampling stays well-defined (MVMO assumes finite boxes).
    """
    lb = jnp.asarray(lb, dtype)
    ub = jnp.asarray(ub, dtype)
    span = 80.0
    lb_f = jnp.where(jnp.isfinite(lb), lb, jnp.where(jnp.isfinite(ub), ub - span, -span))
    ub_f = jnp.where(jnp.isfinite(ub), ub, lb_f + span)
    u = jax.random.uniform(key, (num, lb.shape[0]), lb_f.dtype)
    return lb_f + u * (ub_f - lb_f)


@partial(jax.jit, static_argnames=("fun", "num", "chunk"))
def random_search(
    fun: Callable,
    key,
    lb,
    ub,
    x_default,
    num: int = 1000,
    chunk: int = 8,
):
    """Best of `num` random candidates plus the default point.

    fun: x -> scalar objective (must return +inf for rejected/non-SPD
    candidates, reproducing the reference's INF semantics including the
    sn2 > mean(sf2) rejection installed by the models, GP.cpp:470-471).

    Returns (best_x, best_f) with best_x = x_default when nothing is finite.
    """
    x_default = jnp.asarray(x_default)
    cands = sample_box(key, lb, ub, num, x_default.dtype)

    pad = (-num) % chunk
    if pad:
        cands = jnp.concatenate([cands, jnp.tile(cands[:1], (pad, 1))], axis=0)
    batches = cands.reshape(-1, chunk, cands.shape[-1])

    vals = jax.lax.map(jax.vmap(fun), batches).reshape(-1)
    if pad:
        vals = vals.at[num:].set(INF)

    best_idx = jnp.argmin(vals)
    best_f = vals[best_idx]
    best_x = cands[best_idx]
    use_default = ~jnp.isfinite(best_f)
    return jnp.where(use_default, x_default, best_x), best_f


def _mvmo_box(lb, ub):
    """Finite sampling box (infinite bounds clamped to an 80-wide window)."""
    span = 80.0
    lb_f = jnp.where(jnp.isfinite(lb), lb,
                     jnp.where(jnp.isfinite(ub), ub - span, -span))
    ub_f = jnp.where(jnp.isfinite(ub), ub, lb_f + span)
    return lb_f, ub_f - lb_f


def _mvmo_gen(fun, lb_f, width, n_gen, chunk, archive, fs_init, fs_final,
              dt, nv):
    """One MVMO generation as a scan-compatible step function — shared by
    the fully-jitted driver (mvmo_search: one lax.scan) and the hosted
    driver (mvmo_search_hosted: one jitted execution per generation)."""

    def denorm(z):
        return lb_f + z * width

    def gen(state, inp):
        za, fa = state
        t, key = inp
        # geometric fs ramp over the budget
        frac = t.astype(dt) / jnp.asarray(max(n_gen - 1, 1), dt)
        fs = fs_init * (fs_final / fs_init) ** frac

        order = jnp.argsort(fa)
        za_s, fa_s = za[order], fa[order]
        finite = jnp.isfinite(fa_s)[:, None]
        wsum = jnp.maximum(jnp.sum(finite), 1)
        xbar = jnp.sum(jnp.where(finite, za_s, 0.0), axis=0) / wsum
        var = (jnp.sum(jnp.where(finite, (za_s - xbar) ** 2, 0.0), axis=0)
               / wsum)
        s = fs * jnp.maximum(-jnp.log(jnp.maximum(var, 1e-12)), 1.0)

        ku, km, key = jax.random.split(key, 3)
        u = jax.random.uniform(ku, (chunk, nv), dt)
        h = (xbar[None, :] * (1.0 - jnp.exp(-u * s[None, :]))
             + (1.0 - xbar[None, :]) * jnp.exp(-(1.0 - u) * s[None, :]))
        # mutate a random subset of variables; inherit the best elsewhere
        sel = jax.random.bernoulli(km, 0.5, (chunk, nv))
        child = jnp.where(sel, h, za_s[0][None, :])
        child = jnp.clip(child, 0.0, 1.0)

        fc = jax.vmap(lambda z: fun(denorm(z)))(child)
        fc = jnp.where(jnp.isfinite(fc), fc, INF)

        # merge children into the archive (keep best `archive`)
        z_all = jnp.concatenate([za_s, child], axis=0)
        f_all = jnp.concatenate([fa_s, fc], axis=0)
        keep = jnp.argsort(f_all)[:archive]
        return (z_all[keep], f_all[keep]), None

    return gen


@partial(jax.jit, static_argnames=("fun", "num", "chunk", "archive"))
def mvmo_search(
    fun: Callable,
    key,
    lb,
    ub,
    x_default,
    num: int = 1000,
    chunk: int = 8,
    archive: int = 25,
    fs_init: float = 0.5,
    fs_final: float = 20.0,
):
    """Adaptive global search with MVMO semantics (Mean-Variance Mapping
    Optimization) — the evolutionary optimizer the reference configures
    for select_init_hyp (GP.cpp:478-484: fs_init=0.5, fs_final=20,
    archive_size=25; implementation vendored as an EMPTY submodule, so
    only the API + configuration are knowable — SURVEY.md 2.9).

    Faithful mechanics, vectorized per generation of `chunk` children:
      * an elite archive of the `archive` best (x, f) pairs in [0,1]^d
        normalized space;
      * children inherit the archive BEST on a random subset of variables
        and draw the rest through the MVMO h-mapping
        h(u) = xbar (1 - e^{-u s}) + (1 - xbar) e^{-(1-u) s},
        centered on the archive MEAN xbar with shaping factor
        s = fs * (-log var) from the archive VARIANCE — low variance in a
        variable concentrates sampling near its mean;
      * fs ramps geometrically fs_init -> fs_final over the eval budget
        (exploration -> exploitation).

    Same objective contract as random_search (INF for rejected points);
    returns (best_x, best_f), best_x = x_default when nothing is finite.
    """
    x_default = jnp.asarray(x_default)
    dt = x_default.dtype
    nv = x_default.shape[0]
    lb = jnp.asarray(lb, dt)
    ub = jnp.asarray(ub, dt)
    lb_f, width = _mvmo_box(lb, ub)

    def denorm(z):
        return lb_f + z * width

    n_gen = max(num // chunk, 1)

    # seed archive: the default point + uniform randoms
    key, k0 = jax.random.split(key)
    z0 = jnp.clip((x_default - lb_f) / width, 0.0, 1.0)
    za = jnp.concatenate(
        [z0[None, :],
         jax.random.uniform(k0, (archive - 1, nv), dt)], axis=0)
    fa = jax.lax.map(lambda z: fun(denorm(z)), za)
    fa = jnp.where(jnp.isfinite(fa), fa, INF)

    gen = _mvmo_gen(fun, lb_f, width, n_gen, chunk, archive,
                    fs_init, fs_final, dt, nv)

    keys = jax.random.split(key, n_gen)
    (za, fa), _ = jax.lax.scan(gen, (za, fa),
                               (jnp.arange(n_gen), keys))
    best = jnp.argmin(fa)
    best_f = fa[best]
    best_x = denorm(za[best])
    use_default = ~jnp.isfinite(best_f)
    return jnp.where(use_default, x_default, best_x), best_f


def mvmo_search_hosted(
    fun: Callable,
    key,
    lb,
    ub,
    x_default,
    num: int = 1000,
    chunk: int = 8,
    archive: int = 25,
    fs_init: float = 0.5,
    fs_final: float = 20.0,
):
    """mvmo_search driven from the host: identical mechanics and key
    stream (the generation step is the SAME _mvmo_gen the jitted scan
    runs), but no single device execution covers more than one generation
    (`chunk` objective evaluations) and the archive seeding runs one
    candidate per execution.

    Why this exists: the remote TPU runtime kills any single execution
    past its ~60-100 s watchdog (bisected at N=51200, see
    optim/lbfgsb.lbfgsb_hosted).  The fully-jitted mvmo_search is one
    program of ~num objective evaluations — at stream-scale N (~6 s per
    factorization) that is exactly the measured worker-crash shape.
    GPBase.select_init_hyp routes here when the model's hosted-optimizer
    predicate is true (models/base.py).
    """
    x_default = jnp.asarray(x_default)
    dt = x_default.dtype
    nv = x_default.shape[0]
    lb = jnp.asarray(lb, dt)
    ub = jnp.asarray(ub, dt)
    lb_f, width = _mvmo_box(lb, ub)

    n_gen = max(num // chunk, 1)

    # seed archive — same key stream as mvmo_search, one eval per execution
    key, k0 = jax.random.split(key)
    z0 = jnp.clip((x_default - lb_f) / width, 0.0, 1.0)
    za = jnp.concatenate(
        [z0[None, :],
         jax.random.uniform(k0, (archive - 1, nv), dt)], axis=0)
    fun_j = jax.jit(fun)
    fa = jnp.stack([fun_j(lb_f + za[i] * width) for i in range(archive)])
    fa = jnp.where(jnp.isfinite(fa), fa, INF)

    gen = _mvmo_gen(fun, lb_f, width, n_gen, chunk, archive,
                    fs_init, fs_final, dt, nv)
    gen_j = jax.jit(lambda st, t, k: gen(st, (t, k))[0])

    keys = jax.random.split(key, n_gen)
    state = (za, fa)
    for t in range(n_gen):
        state = gen_j(state, jnp.asarray(t, jnp.int32), keys[t])
    za, fa = state
    best = jnp.argmin(fa)
    best_f = fa[best]
    best_x = lb_f + za[best] * width
    use_default = ~jnp.isfinite(best_f)
    return jnp.where(use_default, x_default, best_x), best_f



class MultistartResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    all_f: jnp.ndarray
    all_x: jnp.ndarray


@partial(jax.jit, static_argnames=("fun", "n_starts", "max_evals"))
def multistart_lbfgsb(fun, key, lb, ub, x0, n_starts: int = 8,
                      max_evals: int = 160):
    """vmapped multi-start local optimization: n_starts L-BFGS-B runs from
    x0 plus random points, all in one batched computation (each iteration
    factors n_starts kernel matrices in parallel on the MXU).

    This composes the MVMO-global + NLOPT-local pipeline into a single
    vectorized program — the idiomatic TPU shape for hyperparameter fitting.
    """
    from .lbfgsb import lbfgsb_impl  # local import to avoid cycle

    starts = sample_box(key, lb, ub, n_starts - 1, x0.dtype)
    starts = jnp.concatenate([x0[None, :], starts], axis=0)
    run = lambda x: lbfgsb_impl(fun, x, lb, ub, max_evals=max_evals)
    res = jax.vmap(run)(starts)
    f = jnp.where(jnp.isfinite(res.f), res.f, INF)
    best = jnp.argmin(f)
    return MultistartResult(res.x[best], res.f[best], res.f, res.x)

def multistart_lbfgsb_hosted(fun, key, lb, ub, x0, n_starts: int = 8,
                             max_evals: int = 160):
    """multistart_lbfgsb driven from the host: the SAME start set (x0 +
    sample_box randoms from the same key), but each start runs through
    lbfgsb_hosted — one device execution per objective evaluation — so no
    single execution can breach the remote runtime's ~60-100 s watchdog
    (the vmapped n_starts x max_evals monolith is the measured
    worker-crash shape at stream-scale N).  Sequential over starts: the
    batched-MXU win of the vmapped form is irrelevant when one evaluation
    already fills the chip.
    """
    from .lbfgsb import lbfgsb_hosted  # local import to avoid cycle

    starts = sample_box(key, lb, ub, n_starts - 1, x0.dtype)
    starts = jnp.concatenate([x0[None, :], starts], axis=0)
    results = [lbfgsb_hosted(fun, starts[i], lb, ub, max_evals=max_evals)
               for i in range(n_starts)]
    all_f = jnp.stack([jnp.where(jnp.isfinite(r.f), r.f, INF)
                       for r in results])
    all_x = jnp.stack([jnp.asarray(r.x) for r in results])
    best = int(jnp.argmin(all_f))
    return MultistartResult(all_x[best], results[best].f, all_f, all_x)
