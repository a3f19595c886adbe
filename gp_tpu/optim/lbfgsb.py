"""Box-bounded L-BFGS in pure JAX.

TPU-native replacement for the reference's NLOPT LD_SLSQP local optimizer
(GP.cpp:231-259, FITC.cpp:74-101, VFE.cpp:73-101): bounded quasi-Newton
minimization with a hard evaluation budget (the reference uses
max_eval = 160/130/150).

Design: limited-memory BFGS two-loop recursion + gradient projection onto the
box + backtracking Armijo line search along the projected path.  The whole
solve is one lax.while_loop, so it jits, vmaps (multi-start restarts across
a batch axis) and shard_maps (restarts across chips).

Objective contract (matches GP.cpp:147-171 semantics): fun(x) returns
(f, g); non-finite f or g must already be sanitized by the caller to
(+inf, anything) — infinite f simply fails the Armijo test and the search
backtracks, which reproduces the reference's INF-objective rejection.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LBFGSBState(NamedTuple):
    x: jnp.ndarray          # (n,) current iterate
    f: jnp.ndarray          # () current objective
    g: jnp.ndarray          # (n,) current gradient
    S: jnp.ndarray          # (m, n) step history (circular)
    Y: jnp.ndarray          # (m, n) gradient-difference history
    rho: jnp.ndarray        # (m,) 1 / (s.y)
    head: jnp.ndarray       # () int32 next write slot
    n_hist: jnp.ndarray     # () int32 number of valid entries
    evals: jnp.ndarray      # () int32 objective evaluations so far
    done: jnp.ndarray       # () bool


class LBFGSBResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    evals: jnp.ndarray
    converged: jnp.ndarray


def _two_loop(state: LBFGSBState) -> jnp.ndarray:
    """Compute d = -H g from the (masked) circular history."""
    m = state.S.shape[0]
    q = state.g

    def newest_to_oldest(i, carry):
        q, alphas = carry
        idx = jnp.mod(state.head - 1 - i, m)
        valid = i < state.n_hist
        a = state.rho[idx] * jnp.dot(state.S[idx], q)
        a = jnp.where(valid, a, 0.0)
        q = q - a * state.Y[idx]
        return q, alphas.at[i].set(a)

    alphas = jnp.zeros((m,), state.g.dtype)
    q, alphas = jax.lax.fori_loop(0, m, newest_to_oldest, (q, alphas))

    # Initial Hessian scaling from the newest pair (standard gamma).
    newest = jnp.mod(state.head - 1, m)
    sy = jnp.dot(state.S[newest], state.Y[newest])
    yy = jnp.dot(state.Y[newest], state.Y[newest])
    gamma = jnp.where(
        (state.n_hist > 0) & (sy > 0) & (yy > 0), sy / yy, 1.0
    )
    r = gamma * q

    def oldest_to_newest(i, r):
        j = state.n_hist - 1 - i  # reverse order of the first loop's i
        idx = jnp.mod(state.head - 1 - j, m)
        valid = (j >= 0) & (j < state.n_hist)
        b = state.rho[idx] * jnp.dot(state.Y[idx], r)
        corr = state.S[idx] * (alphas[j] - b)
        return r + jnp.where(valid, corr, 0.0)

    r = jax.lax.fori_loop(0, m, oldest_to_newest, r)
    return -r


def _lbfgsb_init(fun: Callable, x0, lb, ub, history: int) -> LBFGSBState:
    """Initial optimizer state (one objective evaluation)."""
    dtype = x0.dtype
    n = x0.shape[0]
    m = history
    x0 = jnp.clip(x0, jnp.asarray(lb, dtype), jnp.asarray(ub, dtype))
    f0, g0 = fun(x0)
    return LBFGSBState(
        x=x0, f=f0, g=g0,
        S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype),
        head=jnp.zeros((), jnp.int32), n_hist=jnp.zeros((), jnp.int32),
        evals=jnp.ones((), jnp.int32),
        done=~jnp.isfinite(f0),
    )


def _lbfgsb_run(
    fun: Callable,
    init: LBFGSBState,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
    stop_evals,
    tol: float = 1e-8,
    max_backtracks: int = 25,
    armijo_c1: float = 1e-4,
) -> LBFGSBState:
    """Iterate from `init` until done or `evals >= stop_evals` (traceable;
    stop_evals may be a traced scalar so chunked drivers re-enter one
    compiled program with different budgets)."""
    dtype = init.x.dtype
    m = init.S.shape[0]
    lb = jnp.asarray(lb, dtype)
    ub = jnp.asarray(ub, dtype)

    def proj_grad_norm(x, g):
        return jnp.max(jnp.abs(jnp.clip(x - g, lb, ub) - x))

    def cond(st: LBFGSBState):
        return jnp.logical_and(~st.done, st.evals < stop_evals)

    def body(st: LBFGSBState):
        d = _two_loop(st)
        # Fall back to steepest descent when the direction isn't a descent
        # direction (stale/degenerate history).
        descent = jnp.dot(st.g, d) < 0
        d = jnp.where(descent, d, -st.g)

        # Backtracking Armijo along the projected path.
        def ls_cond(c):
            t, xt, ft, gt, k, accepted = c
            return jnp.logical_and(~accepted, k < max_backtracks)

        def ls_body(c):
            t, _, _, _, k, _ = c
            xt = jnp.clip(st.x + t * d, lb, ub)
            ft, gt = fun(xt)
            dx = xt - st.x
            accepted = ft <= st.f + armijo_c1 * jnp.dot(st.g, dx)
            # A zero projected step can never be accepted; bail via k.
            nonzero = jnp.any(dx != 0)
            accepted = jnp.logical_and(accepted, nonzero)
            return t * 0.5, xt, ft, gt, k + 1, accepted

        t0 = jnp.ones((), dtype)
        c0 = (t0, st.x, st.f, st.g, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
        _, xt, ft, gt, n_ls, accepted = jax.lax.while_loop(ls_cond, ls_body, c0)

        evals = st.evals + n_ls

        def on_accept(st):
            s = xt - st.x
            yv = gt - st.g
            sy = jnp.dot(s, yv)
            good = sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(yv)
            S = jnp.where(good, st.S.at[st.head].set(s), st.S)
            Y = jnp.where(good, st.Y.at[st.head].set(yv), st.Y)
            rho = jnp.where(good, st.rho.at[st.head].set(1.0 / sy), st.rho)
            head = jnp.where(good, jnp.mod(st.head + 1, m), st.head)
            n_hist = jnp.where(good, jnp.minimum(st.n_hist + 1, m), st.n_hist)
            converged = proj_grad_norm(xt, gt) < tol
            return LBFGSBState(xt, ft, gt, S, Y, rho, head, n_hist, evals, converged)

        def on_fail(st):
            # No acceptable step: terminate (NLOPT would report ROUNDOFF/XTOL).
            return st._replace(evals=evals, done=jnp.ones((), bool))

        return jax.lax.cond(accepted, on_accept, on_fail, st)

    return jax.lax.while_loop(cond, body, init)


def lbfgsb_impl(
    fun: Callable,
    x0: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
    max_evals: int = 160,
    tol: float = 1e-8,
    history: int = 10,
    max_backtracks: int = 25,
    armijo_c1: float = 1e-4,
) -> LBFGSBResult:
    """Minimize fun over the box [lb, ub] starting from x0.

    fun: x -> (f, g).  max_evals is the reference's NLOPT set_maxeval budget.

    Pure traceable implementation — call inside your own jit (the models do),
    or use the pre-jitted `lbfgsb` wrapper below.
    """
    init = _lbfgsb_init(fun, x0, lb, ub, history)
    final = _lbfgsb_run(fun, init, lb, ub, max_evals, tol=tol,
                        max_backtracks=max_backtracks, armijo_c1=armijo_c1)
    converged = jnp.isfinite(final.f)
    return LBFGSBResult(final.x, final.f, final.g, final.evals, converged)


def lbfgsb_chunked(
    fun: Callable,
    x0: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
    max_evals: int = 160,
    chunk: int = 16,
    tol: float = 1e-8,
    history: int = 10,
    max_backtracks: int = 25,
    armijo_c1: float = 1e-4,
    verbose: bool | None = None,
) -> LBFGSBResult:
    """lbfgsb_impl with a host-driven chunk loop: identical state and math,
    but each XLA execution covers at most ~`chunk` objective evaluations.

    For HBM-scale N a fully-jitted 160-eval fit is one multi-ten-minute
    device execution; the remote TPU runtime on this image has crashed its
    worker mid-way through such programs (measured at N=51200).  Re-entering
    ONE compiled while_loop program with a traced `stop_evals` budget keeps
    per-execution time bounded (chunk * seconds-per-eval) at zero numerical
    difference — the carried LBFGSBState is bitwise the same pytree the
    monolithic loop would have at that evaluation count.
    """
    if verbose is None:
        import os
        verbose = bool(os.environ.get("GP_TPU_VERBOSE_OPT"))
    dtype = x0.dtype
    lb = jnp.asarray(lb, dtype)
    ub = jnp.asarray(ub, dtype)

    init_j = jax.jit(lambda v: _lbfgsb_init(fun, v, lb, ub, history))
    run_j = jax.jit(lambda st, stop: _lbfgsb_run(
        fun, st, lb, ub, stop, tol=tol, max_backtracks=max_backtracks,
        armijo_c1=armijo_c1))

    st = init_j(x0)
    while (not bool(st.done)) and int(st.evals) < max_evals:
        stop = min(int(st.evals) + chunk, max_evals)
        st = run_j(st, jnp.asarray(stop, jnp.int32))
        if verbose:
            print(f"  lbfgsb_chunked: evals={int(st.evals)} "
                  f"f={float(st.f):.6f}", flush=True)
    converged = jnp.isfinite(st.f)
    return LBFGSBResult(st.x, st.f, st.g, st.evals, converged)


def lbfgsb_hosted(
    fun: Callable,
    x0: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
    max_evals: int = 160,
    tol: float = 1e-8,
    history: int = 10,
    max_backtracks: int = 25,
    armijo_c1: float = 1e-4,
    verbose: bool | None = None,
    jit_fun: bool = True,
) -> LBFGSBResult:
    """Host-driven variant of lbfgsb_impl: the two-loop recursion, the
    projection and the Armijo line search run on the host (numpy, in the
    model dtype), and each device execution is exactly ONE objective
    evaluation.

    Why this exists: the remote TPU runtime on this image kills any single
    XLA execution past its ~60-100 s watchdog (bisected at N=51200), and the
    device-side while_loop form of the optimizer executes ~2.6x slower per
    evaluation than a straight-line program — so even a 5-evaluation chunk of
    `lbfgsb_chunked` breaches the watchdog at HBM-scale N, crashing the
    worker mid-line-search.  Here the longest device program is a single
    NLL+gradient evaluation (6.4 s at N=51200), which can never hit the
    watchdog; per-call dispatch (~28 ms) is noise against multi-second evals.

    State stays in the model dtype (numpy f32 math mirrors the on-device f32
    math) — NOT host f64 — because an f64-state/f32-objective mix lets the
    line search accept steps at the f32 noise floor and poisons the curvature
    history (measured stall; see models/base.train).
    """
    import os

    import numpy as np

    if verbose is None:
        verbose = bool(os.environ.get("GP_TPU_VERBOSE_OPT"))
    dtype = x0.dtype
    # jit_fun=False: `fun` already dispatches a jitted program and needs
    # host-side work per call (e.g. the multi-host wrappers replicate the
    # trial point to the global mesh before each collective evaluation —
    # parallel/multihost.pfit2d); wrapping it again would trace that
    # host logic
    fun_j = jax.jit(fun) if jit_fun else fun

    def feval(x_np):
        f, g = fun_j(jnp.asarray(x_np, dtype))
        return np.asarray(f), np.asarray(g)

    npdt = np.dtype(dtype.name if hasattr(dtype, "name") else dtype)
    one = npdt.type(1.0)
    lb_n = np.asarray(lb, npdt)
    ub_n = np.asarray(ub, npdt)
    x = np.clip(np.asarray(x0, npdt), lb_n, ub_n)
    f, g = feval(x)
    evals = 1
    S: list = []   # oldest -> newest
    Y: list = []
    RHO: list = []
    done = not bool(np.isfinite(f))

    while not done and evals < max_evals:
        # two-loop recursion (identical to _two_loop, list-form history)
        q = g.copy()
        alphas_newest_first = []
        for s, yv, rho in zip(reversed(S), reversed(Y), reversed(RHO)):
            a = rho * np.dot(s, q)
            q = q - a * yv
            alphas_newest_first.append(a)
        if S:
            sy0 = np.dot(S[-1], Y[-1])
            yy0 = np.dot(Y[-1], Y[-1])
            gamma = sy0 / yy0 if (sy0 > 0 and yy0 > 0) else one
        else:
            gamma = one
        r = (gamma * q).astype(npdt)
        for (s, yv, rho), a in zip(zip(S, Y, RHO),
                                   reversed(alphas_newest_first)):
            b = rho * np.dot(yv, r)
            r = r + s * (a - b)
        d = -r
        if not np.dot(g, d) < 0:
            d = -g

        # backtracking Armijo along the projected path
        t = one
        accepted = False
        xt = x
        ft, gt = f, g
        for _ in range(max_backtracks):
            xt = np.clip(x + t * d, lb_n, ub_n)
            ft, gt = feval(xt)
            evals += 1
            dx = xt - x
            if np.any(dx != 0) and ft <= f + armijo_c1 * np.dot(g, dx):
                accepted = True
                break
            t = t * npdt.type(0.5)
        if not accepted:
            break  # no acceptable step: STOPPED (xtol/roundoff)

        s = xt - x
        yv = gt - g
        sy = np.dot(s, yv)
        if sy > 1e-10 * np.linalg.norm(s) * np.linalg.norm(yv):
            S.append(s)
            Y.append(yv)
            RHO.append(one / sy)
            if len(S) > history:
                S.pop(0)
                Y.pop(0)
                RHO.pop(0)
        x, f, g = xt, ft, gt
        if verbose:
            print(f"  lbfgsb_hosted: evals={evals} f={float(f):.6f}",
                  flush=True)
        if np.max(np.abs(np.clip(x - g, lb_n, ub_n) - x)) < tol:
            done = True  # converged (projected-gradient tolerance)

    # host (numpy) result fields: after a device OOM mid-train (e.g. the
    # posterior-cache program at HBM-scale N), even tiny device fetches
    # fail — the fitted hyps must survive without touching the device
    return LBFGSBResult(
        np.asarray(x, dtype), np.asarray(f, dtype), np.asarray(g, dtype),
        np.asarray(evals, np.int32), np.asarray(np.isfinite(f)))


lbfgsb = partial(jax.jit, static_argnames=(
    "fun", "max_evals", "tol", "history", "max_backtracks", "armijo_c1",
))(lbfgsb_impl)


def explain_result(res: LBFGSBResult, max_evals: int = 160) -> str:
    """Human-readable optimizer status, the analog of the reference's
    explain_nlopt (util.cpp:87-109, printed by FITC.cpp:102/VFE.cpp:102)."""
    import numpy as np

    f = float(res.f)
    evals = int(res.evals)
    if not np.isfinite(f):
        return f"FAILURE: objective non-finite after {evals} evaluations"
    if bool(res.converged) and evals < max_evals:
        return (f"SUCCESS: converged (projected-gradient tolerance) after "
                f"{evals} evaluations, f = {f:.9g}")
    if evals >= max_evals:
        return (f"MAXEVAL_REACHED: stopped at the {max_evals}-evaluation "
                f"budget, f = {f:.9g}")
    return (f"STOPPED: no acceptable step (xtol/roundoff) after "
            f"{evals} evaluations, f = {f:.9g}")
