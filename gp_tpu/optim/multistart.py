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
