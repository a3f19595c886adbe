"""Bounded L-BFGS tests (replacement for NLOPT LD_SLSQP, GP.cpp:231-259)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from gp_tpu.config import INF
from gp_tpu.optim.lbfgsb import lbfgsb
from gp_tpu.optim.multistart import random_search, sample_box


def _vg(f):
    vg = jax.value_and_grad(f)
    return lambda x: vg(x)


def quad(x):
    return jnp.sum((x - jnp.arange(x.shape[0], dtype=x.dtype)) ** 2)


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def test_quadratic_unconstrained_box():
    n = 5
    x0 = jnp.zeros(n)
    lb = jnp.full(n, -10.0)
    ub = jnp.full(n, 10.0)
    res = lbfgsb(_vg(quad), x0, lb, ub, max_evals=100)
    np.testing.assert_allclose(np.asarray(res.x), np.arange(n), atol=1e-6)
    assert bool(res.converged)


def test_quadratic_active_bounds():
    n = 5
    x0 = jnp.zeros(n)
    lb = jnp.full(n, -1.0)
    ub = jnp.full(n, 2.5)  # optimum of coords 3,4 clipped at 2.5
    res = lbfgsb(_vg(quad), x0, lb, ub, max_evals=200)
    expected = np.minimum(np.arange(n), 2.5)
    np.testing.assert_allclose(np.asarray(res.x), expected, atol=1e-6)


def test_rosenbrock_matches_scipy():
    n = 6
    x0 = jnp.full(n, -0.5)
    lb = jnp.full(n, -2.0)
    ub = jnp.full(n, 2.0)
    res = lbfgsb(_vg(rosenbrock), x0, lb, ub, max_evals=600)
    sp = minimize(lambda x: float(rosenbrock(jnp.asarray(x))), np.full(n, -0.5),
                  jac=lambda x: np.asarray(jax.grad(rosenbrock)(jnp.asarray(x))),
                  method="L-BFGS-B", bounds=[(-2, 2)] * n)
    assert float(res.f) <= sp.fun + 1e-5


def test_respects_eval_budget():
    calls = []

    def fun(x):
        f, g = _vg(rosenbrock)(x)
        return f, g

    res = lbfgsb(fun, jnp.full(4, -1.9), jnp.full(4, -2.0), jnp.full(4, 2.0),
                 max_evals=20)
    assert int(res.evals) <= 20 + 25  # budget + at most one trailing line search


def test_inf_region_backtracks():
    """Objective returning +inf outside a disc: the line search must reject
    infinite trial points (GP.cpp INF-objective semantics)."""

    def fun(x):
        f = jnp.sum((x - 1.0) ** 2)
        bad = jnp.sum(x**2) > 4.0
        f = jnp.where(bad, INF, f)
        g = jax.grad(lambda z: jnp.sum((z - 1.0) ** 2))(x)
        g = jnp.where(bad, jnp.zeros_like(g), g)
        return f, g

    x0 = jnp.array([-1.3, -1.3])
    res = lbfgsb(fun, x0, jnp.full(2, -5.0), jnp.full(2, 5.0), max_evals=200)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-5)


def test_vmappable():
    """Multi-start readiness: the solver must vmap over starting points."""
    fun = _vg(rosenbrock)
    starts = jnp.stack([jnp.full(4, -1.0), jnp.full(4, 0.0), jnp.full(4, 1.5)])
    lb, ub = jnp.full(4, -2.0), jnp.full(4, 2.0)
    from gp_tpu.optim.lbfgsb import lbfgsb_impl
    run = jax.jit(jax.vmap(lambda x0: lbfgsb_impl(fun, x0, lb, ub, max_evals=400)))
    res = run(starts)
    assert np.asarray(res.f).min() < 1e-8


def test_sample_box_and_random_search():
    lb = jnp.array([-2.0, -2.0])
    ub = jnp.array([3.0, 4.0])
    s = np.asarray(sample_box(jax.random.PRNGKey(0), lb, ub, 500))
    assert (s >= np.asarray(lb)).all() and (s <= np.asarray(ub)).all()

    def f(x):
        return jnp.sum((x - 1.0) ** 2)

    best_x, best_f = random_search(f, jax.random.PRNGKey(1), lb, ub,
                                   jnp.zeros(2), num=2000, chunk=50)
    assert float(best_f) < 0.05

    # all-INF objective falls back to the default point (GP.cpp:484)
    g = lambda x: jnp.asarray(INF)
    bx, bf = random_search(g, jax.random.PRNGKey(2), lb, ub,
                           jnp.array([0.5, 0.5]), num=64, chunk=8)
    np.testing.assert_allclose(np.asarray(bx), [0.5, 0.5])


def test_infinite_bounds_sampling():
    lb = jnp.array([-jnp.inf, 0.0])
    ub = jnp.array([1.0, jnp.inf])
    s = np.asarray(sample_box(jax.random.PRNGKey(3), lb, ub, 100))
    assert np.isfinite(s).all()
    assert (s[:, 0] <= 1.0).all() and (s[:, 1] >= 0.0).all()


def test_chunked_matches_monolithic():
    """lbfgsb_chunked (host-driven bounded re-entries of the while_loop)
    must be numerically identical to the one-program lbfgsb at every
    chunk size, including budget-capped and instantly-converged runs."""
    from gp_tpu.optim.lbfgsb import lbfgsb_chunked, lbfgsb_impl

    def rosen_vg(x):
        f = jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
        return f, jax.grad(lambda v: jnp.sum(
            100.0 * (v[1:] - v[:-1] ** 2) ** 2 + (1 - v[:-1]) ** 2))(x)

    x0 = jnp.asarray(np.asarray([-1.2, 1.0, 0.7, -0.5]))
    lb = jnp.full(4, -2.0)
    ub = jnp.full(4, 2.0)
    for max_evals in (7, 60):
        ref = jax.jit(lambda v: lbfgsb_impl(rosen_vg, v, lb, ub,
                                            max_evals=max_evals))(x0)
        for chunk in (1, 3, 16, 200):
            got = lbfgsb_chunked(rosen_vg, x0, lb, ub,
                                 max_evals=max_evals, chunk=chunk)
            np.testing.assert_array_equal(np.asarray(got.x),
                                          np.asarray(ref.x))
            np.testing.assert_array_equal(np.asarray(got.f),
                                          np.asarray(ref.f))
            assert int(got.evals) == int(ref.evals)


def test_hosted_matches_monolithic():
    """lbfgsb_hosted (host-side math, one device program per evaluation —
    the HBM-scale driver that can never hit the remote execution watchdog)
    must reach the same optimum as the jitted while_loop solver.  Host
    numpy and XLA round f32 dot products differently, so the pin is
    tolerance-based, not bitwise."""
    from gp_tpu.optim.lbfgsb import lbfgsb_hosted, lbfgsb_impl

    def rosen_vg(x):
        f = jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
        return f, jax.grad(lambda v: jnp.sum(
            100.0 * (v[1:] - v[:-1] ** 2) ** 2 + (1 - v[:-1]) ** 2))(x)

    x0 = jnp.asarray(np.asarray([-1.2, 1.0, 0.7, -0.5]))
    lb = jnp.full(4, -2.0)
    ub = jnp.full(4, 2.0)
    ref = jax.jit(lambda v: lbfgsb_impl(rosen_vg, v, lb, ub,
                                        max_evals=400))(x0)
    got = lbfgsb_hosted(rosen_vg, x0, lb, ub, max_evals=400)
    assert float(got.f) <= float(ref.f) + 1e-8
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-5)

    # budget semantics: at most max_evals + one trailing line search
    small = lbfgsb_hosted(rosen_vg, x0, lb, ub, max_evals=12)
    assert int(small.evals) <= 12 + 25

    # INF start terminates immediately (GP.cpp INF-objective semantics)
    inf_fun = lambda x: (jnp.asarray(INF, x.dtype), jnp.zeros_like(x))
    bad = lbfgsb_hosted(inf_fun, x0, lb, ub, max_evals=50)
    assert int(bad.evals) == 1 and not bool(bad.converged)
